"""Decompose the _host_iter_impl compile-time blowup (VERDICT r3 weak 1:
first-step compile grew 109 s -> 444.5 s between rounds 2 and 3 on the
same 484k-unknown bench).

AOT-lowers and compiles the host-loop Newton iteration program for the
bench configuration under one-knob-at-a-time variants of the round-3
rescue stack (hi-residual, gmres fallback, true-res rescue, stol/stall
acceptance have no trace effect) and times `.lower()` and `.compile()`
separately. Runs on CPU by default (relative weights; the TPU numbers
scale but rank the same) so a production TPU run can stay live.

Usage: python tools/compile_probe.py [--tpu] [--dz 1e-5] [--variants ...]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--dz", type=float, default=1e-5)
    ap.add_argument("--variants", default="full,no-hires,no-gmresfb,"
                    "no-rescue,plain")
    args = ap.parse_args()

    import jax.numpy as jnp

    import fedm_tpu  # noqa: F401
    from fedm_tpu.model.system import StepParams
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.solvers.newton import NewtonConfig

    # the bench.py _stiff_bench configuration (484k unknowns at dz=1e-5)
    base = dict(rtol=1e-3, max_iter=20, linear_tol=3e-2,
                linear_maxiter=400, accept_reduction=3e-2, host_loop=True)
    variants = {
        "full": dict(hi_residual=True, gmres_fallback=True,
                     true_res_rescue=1.0),
        "no-hires": dict(hi_residual=False, gmres_fallback=True,
                         true_res_rescue=1.0),
        "no-gmresfb": dict(hi_residual=True, gmres_fallback=False,
                           true_res_rescue=1.0),
        "no-rescue": dict(hi_residual=True, gmres_fallback=True,
                          true_res_rescue=0.0),
        "plain": dict(hi_residual=False, gmres_fallback=False,
                      true_res_rescue=0.0),
    }
    sel = [v for v in args.variants.split(",") if v in variants]

    for name in sel:
        nc = NewtonConfig(**base, **variants[name])
        cfg = StreamerConfig(dtype=jnp.float32, newton=nc, nx=96,
                             z_corridor=(0.0, 1.08e-2, args.dz),
                             poisson_precond="mg-zline",
                             density_floor=1e13,
                             r_corridor=(2e-3, 2e-5), stab_mode="off")
        t0 = time.perf_counter()
        model = StreamerModel(cfg)
        model.system.use_gather_scatter()
        sys_ = model.system
        setup = time.perf_counter() - t0
        n = model.space.n_dofs
        u = jnp.zeros((n, 3), jnp.float64)
        delta = jnp.zeros((n, 3), sys_.dtype)
        fn = jnp.asarray(1.0, jnp.float64)
        p = StepParams(jnp.asarray(1e-9), jnp.asarray(1e-12),
                       jnp.asarray(1e30))
        t0 = time.perf_counter()
        lowered = jax.jit(sys_._host_iter_impl).lower(delta, fn, u, u, {}, p)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        try:
            flops = compiled.cost_analysis()
            flops = (flops or {}).get("flops", float("nan"))
        except Exception:
            flops = float("nan")
        print(f"{name:<11} setup={setup:6.1f}s lower={t_lower:7.1f}s "
              f"compile={t_compile:7.1f}s flops={flops:.3e} "
              f"({n} dofs)", flush=True)


if __name__ == "__main__":
    main()
