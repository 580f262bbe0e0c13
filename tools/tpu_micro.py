"""TPU microbenchmark: residual / step timing across dtype and scatter
layout. Run on the real chip:  python tools/tpu_micro.py [--f32]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

parser = argparse.ArgumentParser()
parser.add_argument("--f32", action="store_true")
parser.add_argument("--nx", type=int, default=96)
parser.add_argument("--ny", type=int, default=192)
parser.add_argument("--gather", action="store_true")
parser.add_argument("--steps", type=int, default=3)
parser.add_argument("--sweep", action="store_true")
args = parser.parse_args()

import jax
import jax.numpy as jnp

from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
from fedm_tpu.model.system import StepParams


def timeit(fn, *a, n=5):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


cfg = StreamerConfig(nx=args.nx, ny=args.ny,
                     dtype=jnp.float32 if args.f32 else None)
m = StreamerModel(cfg)
if args.gather:
    m.system.use_gather_scatter()
st = m.initial_state()
dt = jnp.asarray(5e-12)
params = StepParams(dt, dt, jnp.asarray(1e30))
print(f"dtype={st.u.dtype} dev={jax.devices()[0]} "
      f"nodes={m.space.n_dofs} gather={args.gather}", file=sys.stderr)

F = jax.jit(lambda u: m.system.make_residual_fn(st.u, st.u, {}, params)(u))
t0 = time.perf_counter()
r = F(st.u)
jax.block_until_ready(r)
print(f"residual compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
print(f"residual eval: {timeit(F, st.u)*1e3:.2f} ms", file=sys.stderr)

zero = jnp.zeros_like(st.u).astype(m.batch.dtype)
B = jax.jit(lambda d: m.system._jacobian_blocks(
    d, st.u.astype(m.batch.dtype), zero, {}, params))
t0 = time.perf_counter()
b = B(zero)
jax.block_until_ready(b)
print(f"blocks compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
print(f"blocks eval: {timeit(B, zero)*1e3:.2f} ms", file=sys.stderr)

t0 = time.perf_counter()
u1, info = m.system.step(st.u, st.u, st.u_old1, {}, params)
jax.block_until_ready(u1)
print(f"step compile+run: {time.perf_counter()-t0:.1f}s "
      f"(iters={int(info.iters)}, conv={bool(info.converged)})",
      file=sys.stderr)
t0 = time.perf_counter()
for _ in range(args.steps):
    u1, info = m.system.step(st.u, st.u, st.u_old1, {}, params)
jax.block_until_ready(u1)
per = (time.perf_counter() - t0) / args.steps
print(f"step eval: {per*1e3:.1f} ms  conv={bool(info.converged)} "
      f"res={float(info.res_norm):.2e}", file=sys.stderr)

# extended sweep mode: --sweep compares option combinations
if args.sweep:
    import itertools
    for pred, freeze in [(False, False), (False, True)]:
        mm = StreamerModel(cfg)
        if args.gather:
            mm.system.use_gather_scatter()
        from dataclasses import replace
        mm.system.newton = replace(mm.system.newton, freeze_precond=freeze)
        drv = mm.make_driver()
        stt = mm.initial_state()
        stt = drv.advance(stt, {})  # warm
        jax.block_until_ready(stt.u)
        t0 = time.perf_counter()
        for _ in range(4):
            stt = drv.advance(stt, {})
        jax.block_until_ready(stt.u)
        per = (time.perf_counter() - t0) / 4
        print(f"pred={pred} freeze={freeze}: {per*1e3:.0f} ms/step "
              f"acc={stt.n_accepted} rej={stt.n_rejected} "
              f"err={stt.max_error[0]:.4e}", file=sys.stderr)
