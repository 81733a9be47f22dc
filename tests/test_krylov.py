"""Krylov solver tests against dense numpy oracles."""

import numpy as np
import pytest
from scipy.linalg import expm

from tensor4all_tpu.core.krylov import (
    ArrayVS,
    gmres,
    hermitian_krylov_expm_multiply,
    hermitian_lanczos_lowest_eigenpair,
)


def test_gmres_dense(rng):
    n = 30
    a = np.eye(n) + 0.3 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    import jax.numpy as jnp

    aj, bj = jnp.asarray(a), jnp.asarray(b)
    res = gmres(lambda x: aj @ x, bj, vs=ArrayVS(), rtol=1e-12, maxiter=100)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(a, b),
                               atol=1e-9)
    assert res.residual_norms[-1] < res.residual_norms[0]


def test_gmres_restart(rng):
    n = 40
    # well-conditioned (restarted GMRES legitimately stagnates on
    # indefinite matrices): eigenvalues within ~0.3 of 1
    a = np.eye(n) + 0.3 * rng.standard_normal((n, n)) / np.sqrt(n)
    b = rng.standard_normal(n)
    import jax.numpy as jnp

    aj = jnp.asarray(a)
    res = gmres(lambda x: aj @ x, jnp.asarray(b), vs=ArrayVS(), rtol=1e-10,
                maxiter=200, restart=10)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(a, b),
                               atol=1e-7)


def test_gmres_complex(rng):
    n = 20
    a = np.eye(n) + 0.3 * (rng.standard_normal((n, n))
                           + 1j * rng.standard_normal((n, n)))
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    import jax.numpy as jnp

    aj = jnp.asarray(a)
    res = gmres(lambda x: aj @ x, jnp.asarray(b), vs=ArrayVS(), rtol=1e-12)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(a, b),
                               atol=1e-9)


def test_lanczos_lowest(rng):
    n = 50
    a = rng.standard_normal((n, n))
    a = (a + a.T) / 2
    import jax.numpy as jnp

    aj = jnp.asarray(a)
    v0 = jnp.asarray(rng.standard_normal(n))
    ev, vec = hermitian_lanczos_lowest_eigenpair(
        lambda x: aj @ x, v0, vs=ArrayVS(), maxiter=50
    )
    evals = np.linalg.eigvalsh(a)
    assert abs(ev - evals[0]) < 1e-10
    # eigenvector check: A v = ev v
    r = np.asarray(aj @ vec) - ev * np.asarray(vec)
    assert np.linalg.norm(r) < 1e-8


def test_krylov_expm(rng):
    n = 40
    a = rng.standard_normal((n, n))
    a = (a + a.T) / 2
    import jax.numpy as jnp

    aj = jnp.asarray(a)
    v = rng.standard_normal(n)
    vj = jnp.asarray(v)
    for t in (0.3, -0.5, -0.1j):
        out = hermitian_krylov_expm_multiply(
            lambda x: aj @ x, vj, t, vs=ArrayVS(), maxiter=40
        )
        expect = expm(t * a) @ v
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-9)


def test_gmres_on_tensor_space(rng):
    # GMRES over core.Tensor via the default VectorSpace protocol
    from tensor4all_tpu import Index, Tensor, contract

    i, j = Index(6), Index(6)
    amat = np.eye(6) + 0.2 * rng.standard_normal((6, 6))
    A = Tensor((i.prime(), i), amat)
    b = Tensor((i,), rng.standard_normal(6))

    def apply_a(x: Tensor) -> Tensor:
        return contract([A, x]).noprime()

    res = gmres(apply_a, b, rtol=1e-12)
    assert res.converged
    np.testing.assert_allclose(
        np.asarray(res.x.data), np.linalg.solve(amat, np.asarray(b.data)),
        atol=1e-9,
    )


def test_gmres_affine_matches_dense():
    """(a0 I + a1 A) x = b with the KrylovKit affine convention
    (ref krylov.rs:934): basis from unshifted A."""
    import jax.numpy as jnp

    from tensor4all_tpu.core.krylov import ArrayVS, gmres_affine

    rng = np.random.default_rng(0)
    n = 24
    A = jnp.asarray(rng.standard_normal((n, n)))
    b = jnp.asarray(rng.standard_normal(n))
    a0, a1 = 7.5, 0.3
    res = gmres_affine(lambda v: A @ v, b, a0=a0, a1=a1, vs=ArrayVS(),
                       rtol=1e-12, maxiter=80)
    x_dense = np.linalg.solve(a0 * np.eye(n) + a1 * np.asarray(A),
                              np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_dense, atol=1e-8)
    assert res.converged


def test_restart_gmres_with_truncation():
    """Restarted GMRES with between-cycle truncation (ref krylov.rs:2213)
    converges on a well-conditioned system with a rank-bounding hook."""
    import jax.numpy as jnp

    from tensor4all_tpu.core.krylov import (
        ArrayVS,
        RestartGmresOptions,
        restart_gmres_with_truncation,
    )

    rng = np.random.default_rng(1)
    n = 32
    A = jnp.asarray(rng.standard_normal((n, n)) + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    calls = []

    def trunc(x):
        calls.append(1)
        return jnp.round(x, 13)  # stand-in lossy compression

    res = restart_gmres_with_truncation(
        lambda v: A @ v, b, options=RestartGmresOptions(rtol=1e-10,
                                                        max_iter=10,
                                                        max_restarts=8),
        truncate=trunc, vs=ArrayVS())
    assert res.converged and calls
    x_dense = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.solution), x_dense,
                               atol=1e-7)
