"""TCI1 / ACA / integration / conversion tests."""

import numpy as np

from tensor4all_tpu.ops.aca import matrix_aca
from tensor4all_tpu.tci import (
    CachedFunction,
    TCI1Options,
    crossinterpolate1,
    estimate_true_error,
    integrate_tci,
    opt_first_pivot,
    tci2_from_tensortrain,
)


def test_matrix_aca_low_rank(rng):
    u = rng.standard_normal((12, 3))
    v = rng.standard_normal((3, 9))
    a = u @ v
    res = matrix_aca(a, rtol=1e-11)
    assert res.rank == 3
    np.testing.assert_allclose(np.asarray(res.approx), a, atol=1e-8)


def test_matrix_aca_zero():
    res = matrix_aca(np.zeros((3, 4)))
    assert res.rank == 0


def test_tci1_sum_function():
    dims = [3, 3, 3, 3]

    def batch_f(idx):
        return idx.sum(axis=1).astype(float) + 1.0

    tci, ranks, errs = crossinterpolate1(
        batch_f=batch_f, local_dims=dims,
        options=TCI1Options(tol=1e-10, max_iter=20),
    )
    tt = tci.to_tensortrain()
    assert max(tt.ranks) <= 3
    assert estimate_true_error(tt, tci.func) < 1e-8


def test_integrate_gaussian_2d():
    # int exp(-x^2-y^2) over [0,1]^2 = (sqrt(pi)/2 * erf(1))^2
    from scipy.special import erf

    def f(pts):
        return np.exp(-np.sum(pts**2, axis=1))

    res = integrate_tci(f, ndim=2, n_nodes=21)
    expect = (np.sqrt(np.pi) / 2 * erf(1.0)) ** 2
    assert abs(res.value - expect) < 1e-10


def test_integrate_5d_separable():
    # int prod (1 + x_i) over [0,1]^5 = 1.5^5
    def f(pts):
        return np.prod(1.0 + pts, axis=1)

    res = integrate_tci(f, ndim=5, n_nodes=9)
    assert abs(res.value - 1.5**5) < 1e-9
    assert res.n_evals < 20000


def test_tci2_from_tensortrain(key):
    from tensor4all_tpu.tt import TensorTrain

    tt = TensorTrain.random(key, [3, 3, 3, 3], rank=3)
    tci = tci2_from_tensortrain(tt, tol=1e-12)
    tt2 = tci.to_tensortrain()
    np.testing.assert_allclose(
        np.asarray(tt2.full_tensor()), np.asarray(tt.full_tensor()), atol=1e-8
    )


def test_opt_first_pivot():
    dims = [5, 5, 5]
    target = (2, 4, 1)

    def batch_f(idx):
        return 1.0 / (1.0 + np.sum((idx - np.asarray(target)) ** 2, axis=1))

    cf = CachedFunction(batch_f=batch_f, local_dims=dims)
    piv = opt_first_pivot(cf)
    assert piv == target
