"""Sharded-production identity at PRODUCTION scale (VERDICT r3 item 3).

Loads a committed checkpoint of the real Bagheri production configuration
(default: `runs/bagheri14_ref/checkpoint_004500.npz`, t = 13.75 ns on the
30,305-dof / 90,915-unknown uniform-1e-5-wall window mesh) and marches N
accepted steps of the FULL production stack (host-loop hi-residual
Newton, structured slice/pad assembly, mg-zline V-cycle, density floor,
predictor, fail-dt cap) twice:

  1. single-device, and
  2. GSPMD z-slab-sharded over 8 virtual CPU devices
     (`CoupledSystem.use_gspmd` — the reference's `mpirun -np 8` launch
     mode, /root/reference/README.md:66),

then asserts trajectory identity (same accepted-step count, same t, same
dt sequence to fp wobble, fields allclose) and writes the evidence JSON
to `bench_assets/gspmd_production_identity_r04.json`.

This complements `tests/parallel/test_gspmd_production.py` (same checks
on a miniature mesh, CI-sized): virtual devices cannot prove speed, but
they prove the production stack's sharded semantics at production scale.

Usage: python tools/gspmd_identity.py [--steps 5] [--ckpt ...] [--out ...]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# virtual 8-CPU mesh, pre-backend-init (tests/conftest.py recipe)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=Path,
                    default=Path("runs/bagheri14_ref/checkpoint_004500.npz"))
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", type=Path,
                    default=Path("bench_assets/"
                                 "gspmd_production_identity_r04.json"))
    args = ap.parse_args()

    import jax.numpy as jnp
    from jax.sharding import Mesh

    import fedm_tpu  # noqa: F401
    from fedm_tpu.io.checkpoint import load_checkpoint
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.solvers.newton import NewtonConfig
    from fedm_tpu.timestepping import AdaptiveDriver

    state0, meta = load_checkpoint(args.ckpt, with_meta=True)
    corridor = tuple(float(v) for v in meta["z_corridor"])
    tails = (tuple(int(v) for v in meta["z_tail_cells"])
             if "z_tail_cells" in meta else (48, 48))
    print(f"checkpoint {args.ckpt}: t={state0.t:.6e} dt={state0.dt:.3e} "
          f"steps={state0.n_accepted} corridor={corridor} tails={tails}",
          flush=True)

    def build():
        # the bagheri14 production protocol (tools/bagheri_run.py --preset
        # bagheri14, minus the single-chip-only DirectNewton escalation)
        nc = NewtonConfig(rtol=1e-3, max_iter=20, linear_tol=1e-2,
                          linear_maxiter=400, linear_solver="bicgstab",
                          accept_reduction=3e-2, host_loop=True,
                          hi_residual=True, true_res_rescue=1.0)
        cfg = StreamerConfig(dtype=jnp.float32, newton=nc, nx=96,
                             z_corridor=corridor, stab_mode="off",
                             poisson_precond="mg-zline", T_final=1.4e-8,
                             z_tail_cells=tails, r_corridor=(2e-3, 2e-5),
                             density_floor=1e13)
        m = StreamerModel(cfg)
        m.system.use_gather_scatter()
        m.system.enable_geom_mode()
        return m

    def march(sharded):
        m = build()
        assert m.space.n_dofs * m.n_eq == state0.u.size, "geometry mismatch"
        if sharded:
            devs = jax.devices()
            assert len(devs) >= args.devices
            m.system.use_gspmd(Mesh(np.array(devs[:args.devices]),
                                    ("space",)))
        st = load_checkpoint(args.ckpt)
        if sharded:
            for f in ("u", "u_old", "u_old1"):
                setattr(st, f, m.system.place_state(getattr(st, f)))
        driver = AdaptiveDriver(
            m.system, monitor_idx=1, ttol=m.cfg.ttol,
            dt_min=m.cfg.dt_min, dt_max=m.cfg.dt_max,
            post_accept=m.floor_projection(),
            fail_dt_cap=0.7, predictor=1.0)
        rows = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            st = driver.advance(st, {})
            rows.append(dict(t=st.t, dt=st.dt,
                             n_accepted=st.n_accepted,
                             n_rejected=st.n_rejected,
                             wall_s=time.perf_counter() - t0))
            print(f"  {'8dev' if sharded else '1dev'} "
                  f"step {st.n_accepted}: t={st.t:.6e} dt={st.dt:.3e} "
                  f"[{rows[-1]['wall_s']:.1f}s]", flush=True)
        return m, st, rows

    print("=== single-device march ===", flush=True)
    m1, st1, rows1 = march(sharded=False)
    print("=== 8-device GSPMD march ===", flush=True)
    m8, st8, rows8 = march(sharded=True)

    u1, u8 = np.asarray(st1.u), np.asarray(st8.u)
    rel = (np.abs(u8 - u1) / (np.abs(u1) + 1e-12)).max()
    dt_dev = max(abs(a["dt"] - b["dt"]) / b["dt"]
                 for a, b in zip(rows8, rows1))
    ok = (st8.n_accepted == st1.n_accepted
          and np.isclose(st8.t, st1.t, rtol=1e-9)
          and bool(np.allclose(u8, u1, rtol=5e-4, atol=1e-6)))
    result = {
        "checkpoint": str(args.ckpt),
        "t_start": float(state0.t),
        "n_dofs": int(m1.space.n_dofs),
        "n_unknowns": int(m1.space.n_dofs * m1.n_eq),
        "devices": args.devices,
        "steps": args.steps,
        "accepted_equal": st8.n_accepted == st1.n_accepted,
        "t_final_1dev": float(st1.t),
        "t_final_8dev": float(st8.t),
        "max_rel_field_dev": float(rel),
        "max_rel_dt_dev": float(dt_dev),
        "trajectory_1dev": rows1,
        "trajectory_8dev": rows8,
        "identity_ok": bool(ok),
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(result, indent=1))
    print(f"identity_ok={ok} max_rel_field_dev={rel:.3e} "
          f"max_rel_dt_dev={dt_dev:.3e} -> {args.out}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
