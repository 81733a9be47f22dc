"""Core tensor semantics tests — dense-oracle style (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor4all_tpu import (
    Index,
    SvdTruncationPolicy,
    Tensor,
    ThresholdScale,
    SingularValueMeasure,
    contract,
    factorize,
    qr,
    svd,
)
from tensor4all_tpu.core import (
    Canonical,
    FactorizeAlg,
    direct_sum,
    eigh,
    lq,
    outer_product,
    svd_two,
    truncation_rank,
)


def test_index_identity():
    i = Index(3, tags="s,Site")
    j = Index(3, tags="s,Site")
    assert i != j  # fresh ids
    assert i == i.dag()  # conj excluded from equality
    assert i.prime() != i
    assert i.prime().noprime() == i
    assert i.hastags("Site")
    assert i.sim() != i and i.sim().dim == 3


def test_tensor_construct_and_permute(rng):
    i, j, k = Index(2), Index(3), Index(4)
    a = rng.standard_normal((2, 3, 4))
    t = Tensor((i, j, k), a)
    tp = t.permute((k, i, j))
    np.testing.assert_allclose(np.asarray(tp.data), a.transpose(2, 0, 1))
    np.testing.assert_allclose(np.asarray(tp.permute((i, j, k)).data), a)


def test_contract_matches_einsum(rng):
    i, j, k, l = Index(2), Index(3), Index(4), Index(5)
    a = rng.standard_normal((2, 3))
    b = rng.standard_normal((3, 4))
    c = rng.standard_normal((4, 5))
    ta, tb, tc = Tensor((i, j), a), Tensor((j, k), b), Tensor((k, l), c)
    out = contract([ta, tb, tc])
    expect = a @ b @ c
    np.testing.assert_allclose(np.asarray(out.dense((i, l))), expect, atol=1e-12)


def test_contract_hyperedge_retain(rng):
    # shared index retained in output (ref retain_indices)
    i, j = Index(3), Index(4)
    a = rng.standard_normal((3, 4))
    b = rng.standard_normal((3,))
    out = contract([Tensor((i, j), a), Tensor((i,), b)], retain=[i])
    np.testing.assert_allclose(np.asarray(out.dense((i, j))), a * b[:, None])


def test_contract_disconnected_raises(rng):
    a = Tensor((Index(2),), rng.standard_normal(2))
    b = Tensor((Index(3),), rng.standard_normal(3))
    with pytest.raises(ValueError):
        contract([a, b])
    out = outer_product(a, b)
    assert out.shape == (2, 3)


def test_inner_norm_complex(rng):
    i, j = Index(3), Index(4)
    a = rng.standard_normal((3, 4)) + 1j * rng.standard_normal((3, 4))
    b = rng.standard_normal((4, 3)) + 1j * rng.standard_normal((4, 3))
    ta = Tensor((i, j), a)
    tb = Tensor((j, i), b)  # different axis order on purpose
    got = complex(ta.inner(tb))
    expect = np.vdot(a, b.T)
    assert abs(got - expect) < 1e-12
    assert abs(float(ta.norm()) - np.linalg.norm(a)) < 1e-12


def test_svd_reconstruction(rng):
    i, j, k = Index(3), Index(4), Index(5)
    t = Tensor((i, j, k), rng.standard_normal((3, 4, 5)))
    U, S, Vh, spec = svd(t, [i, k])
    recon = contract([U, S, Vh])
    np.testing.assert_allclose(
        np.asarray(recon.dense((i, j, k))), np.asarray(t.data), atol=1e-12
    )
    # U isometric
    Ud = U.conj()
    g = contract([Ud.replaceind(U.indices[-1], U.indices[-1].prime()), U])
    np.testing.assert_allclose(
        np.asarray(g.data), np.eye(spec.rank), atol=1e-12
    )


def test_svd_truncation_squared_tail():
    s = np.array([1.0, 0.5, 1e-7, 1e-9])
    pol = SvdTruncationPolicy(
        tol=1e-12,
        scale=ThresholdScale.RELATIVE,
        measure=SingularValueMeasure.SQUARED_TAIL,
    )
    # discarding {1e-7, 1e-9} has squared tail ~1e-14 <= 1.25e-12 -> rank 2
    rank, err = truncation_rank(s, pol)
    assert rank == 2
    assert err < 1.25e-12
    # tightening the cutoff keeps 1e-7: tail(3)=1e-18 <= 1.25e-15 < tail(2)
    rank2, _ = truncation_rank(s, pol.with_tol(1e-15))
    assert rank2 == 3
    rank3, _ = truncation_rank(s, pol.with_maxdim(1))
    assert rank3 == 1


def test_svd_truncation_value_measure():
    s = np.array([2.0, 1.0, 1e-6])
    pol = SvdTruncationPolicy(
        tol=1e-3, scale=ThresholdScale.RELATIVE, measure=SingularValueMeasure.VALUE
    )
    rank, _ = truncation_rank(s, pol)
    assert rank == 2
    pol_abs = SvdTruncationPolicy(
        tol=1.5, scale=ThresholdScale.ABSOLUTE, measure=SingularValueMeasure.VALUE
    )
    rank, _ = truncation_rank(s, pol_abs)
    assert rank == 1


def test_qr_lq(rng):
    i, j, k = Index(3), Index(4), Index(5)
    t = Tensor((i, j, k), rng.standard_normal((3, 4, 5)))
    Q, R = qr(t, [i, j])
    recon = contract([Q, R])
    np.testing.assert_allclose(
        np.asarray(recon.dense((i, j, k))), np.asarray(t.data), atol=1e-12
    )
    L, Q2 = lq(t, [i])
    recon2 = contract([L, Q2])
    np.testing.assert_allclose(
        np.asarray(recon2.dense((i, j, k))), np.asarray(t.data), atol=1e-12
    )


def test_factorize_svd_canonical_both(rng):
    i, j = Index(6), Index(7)
    t = Tensor((i, j), rng.standard_normal((6, 7)))
    L, R, spec = factorize(t, [i], FactorizeAlg.SVD, Canonical.BOTH)
    recon = contract([L, R])
    np.testing.assert_allclose(
        np.asarray(recon.dense((i, j))), np.asarray(t.data), atol=1e-12
    )


def test_direct_sum(rng):
    # TT-addition style: pair the bond axes, share the physical axis
    s = Index(2)
    la, lb = Index(3), Index(4)
    a = Tensor((la, s), rng.standard_normal((3, 2)))
    b = Tensor((lb, s), rng.standard_normal((4, 2)))
    out, (nl,) = direct_sum(a, b, [(la, lb)])
    assert nl.dim == 7
    d = np.asarray(out.dense((nl, s)))
    np.testing.assert_allclose(d[:3], np.asarray(a.data))
    np.testing.assert_allclose(d[3:], np.asarray(b.data))


def test_fuse_split_roundtrip(rng):
    i, j, k = Index(2), Index(3), Index(4)
    t = Tensor((i, j, k), rng.standard_normal((2, 3, 4)))
    fused_t, (f,) = t.fuse_indices([[i, k]])
    assert f.dim == 8
    back = fused_t.split_index(f, [i, k])
    np.testing.assert_allclose(
        np.asarray(back.dense((i, j, k))), np.asarray(t.data)
    )


def test_eigh(rng):
    i = Index(5)
    a = rng.standard_normal((5, 5))
    a = a + a.T
    t = Tensor((i, i.prime()), a)
    w, U = eigh(t, [i])
    expect_w = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.asarray(w), expect_w, atol=1e-12)


def test_tensor_is_pytree_jit_grad(rng):
    i, j = Index(3), Index(3)
    t = Tensor((i, j), rng.standard_normal((3, 3)))

    @jax.jit
    def f(x: Tensor):
        return (x.norm() ** 2).real

    g = jax.grad(f)(t)
    # d/dx ||x||^2 = 2x — JAX AD replaces tenferro-ad (ref ad_integration.rs)
    np.testing.assert_allclose(np.asarray(g.data), 2 * np.asarray(t.data), atol=1e-12)


def test_delta_onehot_diag():
    i, j = Index(3), Index(3)
    d = Tensor.delta(i, j)
    np.testing.assert_allclose(np.asarray(d.data), np.eye(3))
    oh = Tensor.onehot(i, 1)
    np.testing.assert_allclose(np.asarray(oh.data), [0, 1, 0])
    dg = Tensor.diag([1.0, 2.0, 3.0], i, j)
    np.testing.assert_allclose(np.asarray(dg.data), np.diag([1.0, 2.0, 3.0]))


def test_select_sum_over(rng):
    i, j = Index(3), Index(4)
    a = rng.standard_normal((3, 4))
    t = Tensor((i, j), a)
    np.testing.assert_allclose(np.asarray(t.select(i, 2).data), a[2])
    np.testing.assert_allclose(np.asarray(t.sum_over([j]).data), a.sum(1))


def test_axpby_arith(rng):
    i = Index(4)
    a, b = rng.standard_normal(4), rng.standard_normal(4)
    ta, tb = Tensor((i,), a), Tensor((i,), b)
    np.testing.assert_allclose(np.asarray((ta + 2 * tb).data), a + 2 * b)
    np.testing.assert_allclose(np.asarray(ta.axpby(3.0, tb, -1.0).data), 3 * b - a)
