"""Native host kernels (tensor4all_tpu/native): parity + accuracy.

The C++ kernels are twins of the numpy reference loops; rrLU must match
bit-for-bit (same elimination order and tie-breaking), the Jacobi SVD to
high relative accuracy. If the shared library cannot be built the tests
skip (the package falls back to numpy)."""

import numpy as np
import pytest

from tensor4all_tpu import native
from tensor4all_tpu.ops import rrlu as rrlu_mod


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native kernels unavailable")
    return lib


def _numpy_twin(A, rtol, atol, max_rank):
    """Run _rrlu_np with the native dispatch disabled."""
    saved = (native._LIB, native._TRIED)
    native._LIB, native._TRIED = None, True
    try:
        return rrlu_mod._rrlu_np(A, rtol, atol, max_rank)
    finally:
        native._LIB, native._TRIED = saved


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_rrlu_native_bitwise_parity(lib, dtype):
    rng = np.random.default_rng(7)
    for _ in range(6):
        n, m = rng.integers(4, 70, 2)
        r = int(rng.integers(1, min(n, m)))
        A = rng.standard_normal((n, r)) @ rng.standard_normal((r, m))
        if dtype == np.complex128:
            A = A + 1j * (rng.standard_normal((n, r))
                          @ rng.standard_normal((r, m)))
        A = A.astype(dtype)
        nat = rrlu_mod._rrlu_native(A, 1e-10, 0.0, min(n, m))
        ref = _numpy_twin(A, 1e-10, 0.0, min(n, m))
        assert nat is not None
        assert nat.rank == ref.rank
        assert np.array_equal(nat.row_pivots, ref.row_pivots)
        assert np.array_equal(nat.col_pivots, ref.col_pivots)
        if dtype == np.float64:
            # real arithmetic is bit-identical (-ffp-contract=off)
            assert np.array_equal(np.asarray(nat.L), np.asarray(ref.L))
            assert np.array_equal(np.asarray(nat.U), np.asarray(ref.U))
            assert nat.last_pivot_error == ref.last_pivot_error
        else:
            # complex division rounds differently (C++ Smith vs numpy);
            # pivot order above is the semantic contract
            scale = np.abs(A).max()
            np.testing.assert_allclose(np.asarray(nat.L),
                                       np.asarray(ref.L), atol=1e-12)
            np.testing.assert_allclose(np.asarray(nat.U),
                                       np.asarray(ref.U),
                                       atol=1e-12 * scale)


def test_rrlu_native_hilbert(lib):
    """The journal config: symmetric ties stress the argmax order."""
    i = np.arange(128)
    H = 1.0 / (1.0 + i[:, None] + i[None, :])
    nat = rrlu_mod._rrlu_native(H, 1e-10, 0.0, 128)
    ref = _numpy_twin(H, 1e-10, 0.0, 128)
    assert nat.rank == ref.rank == 14
    assert np.array_equal(nat.row_pivots, ref.row_pivots)
    assert np.array_equal(np.asarray(nat.U), np.asarray(ref.U))
    err = np.abs(np.asarray(nat.L) @ np.asarray(nat.U) - H).max()
    assert err < 5e-11  # BASELINE.md rrLU row: err 3.7e-11


@pytest.mark.parametrize("shape", [(1, 1), (5, 9), (9, 5), (16, 33),
                                   (40, 40)])
@pytest.mark.parametrize("cplx", [False, True])
def test_jacobi_svd(lib, shape, cplx):
    rng = np.random.default_rng(3)
    r, c = shape
    k = min(r, c)
    u0, _ = np.linalg.qr(rng.standard_normal((r, k)))
    v0, _ = np.linalg.qr(rng.standard_normal((c, k)))
    sv = np.logspace(0, -12, k)
    A = (u0 * sv) @ v0.T
    if cplx:
        A = (A + 1j * ((u0 * sv[::-1]) @ v0.T)).astype(np.complex128)
    out = native.jacobi_svd(np.ascontiguousarray(A))
    assert out is not None
    u, s, vh = out
    assert np.all(np.diff(s) <= 1e-300 + 0 * s[:-1])  # descending
    np.testing.assert_allclose((u * s) @ vh, A, atol=5e-14 * s[0])
    s_ref = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(s, s_ref, atol=5e-14 * s_ref[0])
    eye = np.eye(u.shape[1])
    assert np.abs(u.conj().T @ u - eye).max() < 5e-14
    assert np.abs(vh @ vh.conj().T - np.eye(vh.shape[0])).max() < 5e-14
