"""Cross-stack field parity vs the reference's pinned glow goldens.

Runs the EXACT reference test configuration
(`/root/reference/tests/integrated_tests/glow_discharge/fedm_gd.py`):
4_particles chemistry, 100x100 crossed mesh, ttol = 2e-3, dt_init = 1e-13,
T_final = 1e-11 — and compares the final fields against the reference's
2022-07-07 CI goldens (`20220707_results/{Ar_1p0,Ar_star,Ar_plus,
electrons}.h5`, FEniCS checkpoint layout, values = ln n) at the reference
test's tolerances: L1 < 1e-5, L2 < 1e-5, Linf < 1e-3 relative
(`test_glow_discharge.py:55-62`). Node matching is by coordinates (the
meshes are the same crossed rectangle; orderings differ between stacks).

Also compares the adaptive-dt error trajectory against the pinned
`relative error.log` (`test_glow_discharge.py:50-52` uses np.allclose;
exact trajectory identity across linear-algebra stacks is not expected —
the deltas are printed).

Usage:  python tools/glow_golden_parity.py [--out /tmp/glow_parity]
        [--cpu] [--ttol 2e-3]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = Path("/root/reference/tests/integrated_tests/glow_discharge")
GOLD = REF / "20220707_results"
KEYS = ["Ar_1p0", "Ar_star", "Ar_plus", "electrons"]


def read_golden(name):
    """Read a FEniCS write_checkpoint snapshot: `vector` is in DOF order
    while `mesh/geometry` is in VERTEX order — build the vertex->dof
    permutation from `topology` + `cell_dofs` (P1: cell_dofs[3c+i] is the
    dof of vertex topology[c, i]); returns (geometry, values-at-vertices)."""
    import h5py

    with h5py.File(GOLD / f"{name}.h5", "r") as f:
        out = []
        for snap in range(2):
            g = f.get(f"{name}/{name}_{snap}")
            if g is None:
                break
            geo = np.asarray(g["mesh/geometry"])
            vec = np.asarray(g["vector"])[:, 0]
            topo = np.asarray(g["mesh/topology"])        # [n_c, 3] vertices
            cdofs = np.asarray(g["cell_dofs"])[:, 0]     # [3*n_c] dofs
            dof_of_vertex = np.empty(len(geo), np.int64)
            dof_of_vertex[topo.reshape(-1)] = cdofs
            out.append((geo, vec[dof_of_vertex]))
    return out


def match_nodes(coords_ref, coords_ours):
    """Index map m with ours[m] aligned to ref rows (same mesh, different
    stack ordering); exact coordinate matching with a tolerance."""
    from scipy.spatial import cKDTree

    tree = cKDTree(coords_ours)
    d, idx = tree.query(coords_ref)
    assert d.max() < 1e-12, f"node mismatch: max dist {d.max():.2e}"
    assert len(np.unique(idx)) == len(idx)
    return idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("/tmp/glow_parity"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ttol", type=float, default=2e-3)
    args = ap.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import fedm_tpu  # noqa: F401
    from fedm_tpu.models.glow import GlowDischargeModel, GlowConfig
    from fedm_tpu.timestepping import AdaptiveDriver

    T = 1e-11
    cfg = GlowConfig(model="4_particles", file_input=REF / "file_input",
                     nx=100, ny=100, ttol=args.ttol, dt_init=1e-13,
                     T_final=T)
    model = GlowDischargeModel(cfg)
    print(f"mesh: {model.space.n_dofs} dofs, chemistry=4_particles, "
          f"devices={jax.devices()}", flush=True)

    driver = AdaptiveDriver(
        model.system, monitor_idx=0, ttol=args.ttol,
        dt_min=cfg.dt_min, dt_max=cfg.dt_max,
        error_log=args.out / "relative error.log", verbose=True)

    state = model.initial_state()
    t0 = time.perf_counter()
    # NO dt clamp at the horizon: the reference's loop runs `while t <
    # T_final` with controller-proposed dts and OVERSHOOTS T; the pinned
    # t=1e-11 fields are the time-INTERPOLATED output between the
    # bracketing accepted states (`fedm/file_io.py:594-628`, our
    # io.output.file_output) — reproduce exactly that.
    t_prev, u_prev = state.t, np.asarray(state.u)
    while state.t < T:
        t_prev, u_prev = state.t, np.asarray(state.u)
        aux = model._update_aux_jit(state.u)
        state = driver.advance(state, aux)
    print(f"reached t={state.t:.6e} in {state.n_accepted} steps "
          f"({state.n_rejected} rejected), "
          f"{time.perf_counter() - t0:.1f}s wall", flush=True)

    u_new = np.asarray(state.u)
    u = u_prev + (T - t_prev) * (u_new - u_prev) / (state.t - t_prev)
    coords = model.space.dof_coords
    lnN0 = np.log(cfg.N0)
    ours = {"Ar_1p0": np.full(model.space.n_dofs, lnN0),
            "Ar_star": u[:, 1], "Ar_plus": u[:, 2], "electrons": u[:, 3]}

    # trajectory comparison
    ref_log = np.loadtxt(GOLD / "relative error.log")
    got_log = np.loadtxt(args.out / "relative error.log")
    n = min(len(ref_log), len(got_log))
    print("\nadaptive-dt trajectory (ours vs pinned):")
    for i in range(n):
        r, g = ref_log[i], got_log[i]
        print(f"  step {i}: err {g[0]:.6e} vs {r[0]:.6e} "
              f"(delta {abs(g[0]-r[0])/max(abs(r[0]),1e-300):.2e} rel), "
              f"dt {g[2]:.6e} vs {r[2]:.6e}")

    print("\nfield parity vs 20220707 goldens (relative, on ln n):")
    overall_ok = True
    for k in KEYS:
        snaps = read_golden(k)
        geo, vec = snaps[-1]  # last pinned snapshot (t = 1e-11 or t = 0)
        m = match_nodes(geo, coords)
        err = (ours[k][m] - vec) / vec
        l1 = np.mean(np.abs(err))
        l2 = np.sqrt(np.mean(err ** 2))
        li = np.max(np.abs(err))
        ok = l1 < 1e-5 and l2 < 1e-5 and li < 1e-3
        overall_ok &= ok
        print(f"  {k:10s} (snap {len(snaps)-1}): L1={l1:.3e} L2={l2:.3e} "
              f"Linf={li:.3e}  {'PASS' if ok else 'FAIL'} "
              f"(tol: L1/L2<1e-5, Linf<1e-3)")
        # interior metrics: discrepancies concentrate in the first node
        # rows at the electrodes (see docs/GLOW_STUDY.md, golden-parity
        # section) — quantify the agreement away from them
        zb = geo[:, 1]
        interior = (zb > 1.5e-4) & (zb < 0.01 - 1.5e-4)
        ei = err[interior]
        print(f"  {'':10s}  interior (z in [1.5e-4, 1e-2 - 1.5e-4]): "
              f"L1={np.mean(np.abs(ei)):.3e} "
              f"L2={np.sqrt(np.mean(ei**2)):.3e} "
              f"Linf={np.max(np.abs(ei)):.3e}")
    print(f"\noverall: {'PASS' if overall_ok else 'FAIL'}")
    np.savez(args.out / "final_state.npz", u=u, coords=coords)
    return 0 if overall_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
