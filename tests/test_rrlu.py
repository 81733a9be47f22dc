"""rrLU / CI factorization tests (ref tcicore matrixlu.rs tests + the
Hilbert-matrix benchmark fixture, BASELINE.md)."""

import numpy as np
import pytest

from tensor4all_tpu.ops.rrlu import (
    factorize_matrix_lu,
    matrix_ci_factors,
    rrlu,
)
from tensor4all_tpu.config import SvdTruncationPolicy, ThresholdScale


def hilbert(n):
    i = np.arange(n)
    return 1.0 / (1.0 + i[:, None] + i[None, :])


def test_rrlu_exact_full_rank(rng):
    a = rng.standard_normal((6, 6))
    res = rrlu(a, rtol=1e-14)
    assert res.rank == 6
    np.testing.assert_allclose(np.asarray(res.lu), a, atol=1e-10)


def test_rrlu_exact_rect(rng):
    a = rng.standard_normal((8, 5))
    res = rrlu(a, rtol=1e-14)
    assert res.rank == 5
    np.testing.assert_allclose(np.asarray(res.lu), a, atol=1e-10)


def test_rrlu_low_rank(rng):
    u = rng.standard_normal((10, 3))
    v = rng.standard_normal((3, 12))
    a = u @ v
    res = rrlu(a, rtol=1e-10)
    assert res.rank == 3
    np.testing.assert_allclose(np.asarray(res.lu), a, atol=1e-8)
    # pivot magnitudes recorded
    assert len(res.pivot_magnitudes) == 3
    assert res.last_pivot_error <= 1e-10 * np.abs(a).max() * 10


def test_rrlu_hilbert_rank_and_error():
    # BASELINE.md: Hilbert 128x128 -> rank 14, last pivot err ~3.7e-11
    # at the reference's tolerance; check same ballpark (rank 13-15).
    a = hilbert(128)
    res = rrlu(a, rtol=1e-10)
    assert 12 <= res.rank <= 16
    rel = np.abs(np.asarray(res.lu) - a).max() / np.abs(a).max()
    assert rel < 1e-9


def test_rrlu_structure(rng):
    """L at pivot rows is unit-lower-tri; U at pivot cols upper-tri."""
    a = rng.standard_normal((7, 7))
    res = rrlu(a, rtol=1e-14)
    LI = np.asarray(res.L)[res.row_pivots, :]
    UJ = np.asarray(res.U)[:, res.col_pivots]
    np.testing.assert_allclose(np.diag(LI), 1.0, atol=1e-12)
    assert np.abs(np.triu(LI, 1)).max() < 1e-12
    assert np.abs(np.tril(UJ, -1)).max() < 1e-12


def test_rrlu_zero_matrix():
    res = rrlu(np.zeros((4, 5)), rtol=1e-12)
    assert res.rank == 0


def test_rrlu_max_rank_cap(rng):
    a = rng.standard_normal((9, 9))
    res = rrlu(a, rtol=0.0, max_rank=4)
    assert res.rank == 4


def test_ci_factors_interpolation(rng):
    u = rng.standard_normal((9, 4))
    v = rng.standard_normal((4, 11))
    a = u @ v
    left, right, I, J, err = matrix_ci_factors(a, rtol=1e-11)
    assert left.shape[1] == 4
    np.testing.assert_allclose(np.asarray(left) @ np.asarray(right), a, atol=1e-8)
    # interpolation property: left rows at pivots = identity,
    # right = actual rows of A
    np.testing.assert_allclose(np.asarray(left)[I, :], np.eye(4), atol=1e-10)
    np.testing.assert_allclose(np.asarray(right), a[I, :], atol=1e-10)


def test_factorize_matrix_lu_policy(rng):
    u = rng.standard_normal((8, 2))
    v = rng.standard_normal((2, 6))
    a = u @ v
    pol = SvdTruncationPolicy(tol=1e-10, maxdim=5)
    left, right = factorize_matrix_lu(a, pol)
    assert left.shape[1] == 2
    np.testing.assert_allclose(np.asarray(left @ right), a, atol=1e-8)


def test_tt_compress_lu_and_ci(key):
    import jax

    from tensor4all_tpu.tt import TensorTrain

    a = TensorTrain.random(key, [2, 3, 2, 3], rank=1)
    b = TensorTrain.random(jax.random.PRNGKey(4), [2, 3, 2, 3], rank=1)
    s = a + b + a  # true rank <= 2, stored 3
    for method in ("lu", "ci"):
        c = s.compress(tol=1e-10, method=method)
        assert c.max_rank <= 2
        np.testing.assert_allclose(
            np.asarray(c.full_tensor()), np.asarray(s.full_tensor()), atol=1e-8
        )


def test_tensor_factorize_lu(rng):
    from tensor4all_tpu import Index, Tensor, contract, factorize
    from tensor4all_tpu.core import FactorizeAlg, Canonical

    i, j, k = Index(4), Index(3), Index(5)
    u = rng.standard_normal((4, 3, 2))
    v = rng.standard_normal((2, 5))
    t = Tensor((i, j, k), np.einsum("ijr,rk->ijk", u, v))
    L, R, _ = factorize(t, [i, j], FactorizeAlg.LU, Canonical.RIGHT,
                        policy=SvdTruncationPolicy(tol=1e-10))
    assert L.indices[-1].dim == 2
    recon = contract([L, R])
    np.testing.assert_allclose(
        np.asarray(recon.dense((i, j, k))), np.asarray(t.data), atol=1e-8
    )


def test_rrlu_blocked_kernel_matches_reference(rng):
    """Blocked-rook device kernel (VERDICT r1 #7): rank decisions and
    reconstruction match the sequential reference across rank regimes."""
    import jax.numpy as jnp

    from tensor4all_tpu.ops.rrlu import _rrlu_kernel_blocked, rrlu

    cases = {}
    i = np.arange(256)
    cases["hilbert"] = 1.0 / (1.0 + i[:, None] + i[None, :])
    cases["lowrank"] = (rng.standard_normal((200, 30))
                        @ rng.standard_normal((30, 180)))
    cases["full"] = rng.standard_normal((128, 128))
    for label, A in cases.items():
        ref = rrlu(np.asarray(A), rtol=1e-10)
        mr = min(A.shape)
        Lb, Ub, meta = _rrlu_kernel_blocked(jnp.asarray(A), 1e-10, 0.0,
                                            mr, 32)
        meta = np.asarray(meta)
        k = int(meta[3 * mr])
        L = np.asarray(Lb)[:, :k]
        U = np.asarray(Ub)[:k, :]
        err = np.max(np.abs(L @ U - A)) / np.abs(A).max()
        assert abs(k - ref.rank) <= 3, (label, k, ref.rank)
        assert err < 5e-10, (label, err)
