"""TensorTrain / MPO tests — dense oracles (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor4all_tpu.tt import (
    MPO,
    SiteTensorTrain,
    TensorTrain,
    TTCache,
    VidalTensorTrain,
    left_orthogonalize,
    right_orthogonalize,
    tt_svd_dense,
)


@pytest.fixture
def random_tt(key):
    return TensorTrain.random(key, [2, 3, 4, 3, 2], rank=5)


def dense(tt):
    return np.asarray(tt.full_tensor())


def test_constant_evaluate_sum():
    # BASELINE.json config 1: TensorTrain::constant([2,3,4]) evaluate/sum
    tt = TensorTrain.constant([2, 3, 4], value=1.5)
    assert abs(float(tt.evaluate([1, 2, 3])) - 1.5) < 1e-14
    assert abs(float(tt.sum()) - 1.5 * 24) < 1e-12
    assert tt.ranks == [1, 1]


def test_evaluate_batch_matches_dense(random_tt, rng):
    d = dense(random_tt)
    idx = np.stack(
        [rng.integers(0, dim, size=50) for dim in random_tt.local_dims], axis=1
    )
    vals = np.asarray(random_tt.evaluate_batch(idx))
    expect = d[tuple(idx.T)]
    np.testing.assert_allclose(vals, expect, atol=1e-12)


def test_sum_inner_norm(random_tt, key):
    d = dense(random_tt)
    assert abs(float(random_tt.sum()) - d.sum()) < 1e-10
    other = TensorTrain.random(jax.random.PRNGKey(1), random_tt.local_dims, rank=3)
    od = dense(other)
    assert abs(float(random_tt.inner(other)) - np.vdot(d, od)) < 1e-10
    assert abs(float(random_tt.norm()) - np.linalg.norm(d)) < 1e-10
    ln = float(random_tt.log_norm())
    assert abs(ln - np.log(np.linalg.norm(d))) < 1e-10


def test_add_scale_sub(random_tt, key):
    other = TensorTrain.random(jax.random.PRNGKey(2), random_tt.local_dims, rank=2)
    np.testing.assert_allclose(
        dense(random_tt + other), dense(random_tt) + dense(other), atol=1e-12
    )
    np.testing.assert_allclose(dense(random_tt.scale(-2.5)), -2.5 * dense(random_tt))
    np.testing.assert_allclose(
        dense(random_tt - other), dense(random_tt) - dense(other), atol=1e-12
    )


def test_hadamard(random_tt, key):
    other = TensorTrain.random(jax.random.PRNGKey(3), random_tt.local_dims, rank=2)
    np.testing.assert_allclose(
        dense(random_tt.hadamard(other)), dense(random_tt) * dense(other), atol=1e-12
    )


def test_tt_svd_dense_roundtrip(rng):
    a = rng.standard_normal((2, 3, 4, 3))
    tt = tt_svd_dense(a)
    np.testing.assert_allclose(dense(tt), a, atol=1e-12)


def test_orthogonalize_preserves(random_tt):
    d = dense(random_tt)
    lo = left_orthogonalize(random_tt)
    np.testing.assert_allclose(dense(lo), d, atol=1e-10)
    # left cores isometric
    for c in lo.cores[:-1]:
        m = np.asarray(c).reshape(-1, c.shape[-1])
        np.testing.assert_allclose(m.T @ m, np.eye(m.shape[1]), atol=1e-12)
    ro = right_orthogonalize(random_tt)
    np.testing.assert_allclose(dense(ro), d, atol=1e-10)


def test_compress_reduces_padded_rank(key):
    # sum of two rank-1 TTs has rank 2 but stored rank 2+2 after addition
    a = TensorTrain.random(key, [2, 3, 2, 3], rank=1)
    b = TensorTrain.random(jax.random.PRNGKey(9), [2, 3, 2, 3], rank=1)
    s = a + b + a  # stored rank 3, true rank <= 2
    c = s.compress(tol=1e-12)
    assert c.max_rank <= 2
    np.testing.assert_allclose(dense(c), dense(s), atol=1e-10)


def test_compress_maxdim(key):
    tt = TensorTrain.random(key, [4, 4, 4, 4], rank=6)
    c = tt.compress(tol=0.0, maxdim=3)
    assert c.max_rank <= 3
    # best rank-3 truncation error is bounded by the discarded SVs
    rel = np.linalg.norm(dense(c) - dense(tt)) / np.linalg.norm(dense(tt))
    assert rel < 1.0


def test_site_canonical(random_tt):
    d = dense(random_tt)
    s = SiteTensorTrain.from_tt(random_tt, center=2)
    np.testing.assert_allclose(dense(s.to_tt()), d, atol=1e-10)
    for k, c in enumerate(s.cores):
        m = np.asarray(c)
        if k < s.center:
            q = m.reshape(-1, m.shape[-1])
            np.testing.assert_allclose(q.T @ q, np.eye(q.shape[1]), atol=1e-12)
        elif k > s.center:
            q = m.reshape(m.shape[0], -1)
            np.testing.assert_allclose(q @ q.T, np.eye(q.shape[0]), atol=1e-12)
    s.move_center(0)
    np.testing.assert_allclose(dense(s.to_tt()), d, atol=1e-10)


def test_vidal_roundtrip(random_tt):
    d = dense(random_tt)
    v = VidalTensorTrain.from_tt(random_tt)
    np.testing.assert_allclose(dense(v.to_tt()), d, atol=1e-10)


def test_ttcache(random_tt):
    cache = TTCache(random_tt)
    d = dense(random_tt)
    idx = [(0, 1, 2, 1, 0), (0, 1, 2, 1, 1), (0, 1, 3, 0, 0)]
    for i in idx:
        assert abs(cache.evaluate(i) - d[i]) < 1e-12
    # second eval of same prefix should hit
    h0 = cache.hits
    cache.evaluate((0, 1, 2, 1, 1))
    assert cache.hits > h0


def test_mpo_identity_apply(random_tt):
    mpo = MPO.identity(random_tt.local_dims)
    out = mpo.apply_naive(random_tt)
    np.testing.assert_allclose(dense(out), dense(random_tt), atol=1e-12)


def test_mpo_apply_naive_vs_dense(key):
    dims = [2, 3, 2]
    tt = TensorTrain.random(key, dims, rank=3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    # random MPO with link rank 2
    cores = []
    links = [1, 2, 2, 1]
    kk = jax.random.split(k1, len(dims))
    for i, d in enumerate(dims):
        cores.append(jax.random.normal(kk[i], (links[i], d, d, links[i + 1])))
    mpo = MPO(cores)
    op = np.asarray(mpo.to_dense_matrix())
    vec = dense(tt).reshape(-1)
    expect = (op @ vec).reshape(dims)
    np.testing.assert_allclose(dense(mpo.apply_naive(tt)), expect, atol=1e-10)
    z = mpo.apply_zipup(tt, tol=1e-13)
    np.testing.assert_allclose(dense(z), expect, atol=1e-8)


def test_mpo_compose(key):
    dims = [2, 2, 2]
    links = [1, 3, 2, 1]
    kk = jax.random.split(key, 6)
    a = MPO([jax.random.normal(kk[i], (links[i], d, d, links[i + 1]))
             for i, d in enumerate(dims)])
    b = MPO([jax.random.normal(kk[3 + i], (links[i], d, d, links[i + 1]))
             for i, d in enumerate(dims)])
    prod = np.asarray(a.to_dense_matrix()) @ np.asarray(b.to_dense_matrix())
    np.testing.assert_allclose(
        np.asarray(a.compose_naive(b).to_dense_matrix()), prod, atol=1e-10
    )
    z = a.compose_zipup(b, tol=1e-13)
    np.testing.assert_allclose(np.asarray(z.to_dense_matrix()), prod, atol=1e-8)


def test_mpo_add(key):
    dims = [2, 2]
    links = [1, 2, 1]
    kk = jax.random.split(key, 4)
    a = MPO([jax.random.normal(kk[i], (links[i], d, d, links[i + 1]))
             for i, d in enumerate(dims)])
    b = MPO([jax.random.normal(kk[2 + i], (links[i], d, d, links[i + 1]))
             for i, d in enumerate(dims)])
    np.testing.assert_allclose(
        np.asarray((a + b).to_dense_matrix()),
        np.asarray(a.to_dense_matrix()) + np.asarray(b.to_dense_matrix()),
        atol=1e-12,
    )


def test_inverse_tensortrain_roundtrip_and_local_update(key):
    """InverseTensorTrain (ref vidal.rs:515): roundtrip + purely local
    two-site update."""
    from tensor4all_tpu.tt.canonical import InverseTensorTrain

    tt = TensorTrain.random(key, [2, 3, 2, 3], rank=4)
    inv = InverseTensorTrain.from_tt(tt)
    np.testing.assert_allclose(
        np.asarray(inv.to_tt().full_tensor()),
        np.asarray(tt.full_tensor()), atol=1e-12)
    th = inv.two_site_block(1)
    inv.set_two_site(1, th)
    np.testing.assert_allclose(
        np.asarray(inv.to_tt().full_tensor()),
        np.asarray(tt.full_tensor()), atol=1e-12)


def test_mpo_canonical_forms(key):
    """Site/Vidal/Inverse MPO forms (ref simplett mpo/) roundtrip."""
    import jax

    from tensor4all_tpu.tt import MPO
    from tensor4all_tpu.tt.canonical import InverseMPO, SiteMPO, VidalMPO

    ks = jax.random.split(key, 4)
    links = [1, 3, 3, 3, 1]
    mpo = MPO([jax.random.normal(ks[k], (links[k], 2, 2, links[k + 1]))
               for k in range(4)])
    ref = np.asarray(mpo.to_dense_matrix())
    for form in (lambda m: SiteMPO(m, 1), VidalMPO, InverseMPO):
        got = np.asarray(form(mpo).to_mpo().to_dense_matrix())
        np.testing.assert_allclose(got, ref, atol=1e-9)


def test_ttcache_two_sided(key):
    """Two-sided TTCache (ref cache.rs): prefix AND suffix envs reused."""
    from tensor4all_tpu.tt.cache import TTCache

    tt = TensorTrain.random(key, [2, 3, 2, 3, 2], rank=4)
    c = TTCache(tt)
    idx = np.stack(np.meshgrid(*[np.arange(d) for d in [2, 3, 2, 3, 2]],
                               indexing="ij"), -1).reshape(-1, 5)
    np.testing.assert_allclose(c.evaluate_batch(idx),
                               np.asarray(tt.evaluate_batch(idx)),
                               atol=1e-12)
    # interning: far fewer env contractions than rows evaluated
    assert c.misses < idx.shape[0]
    assert len(c._right) > 1  # right side populated too
    # empty batch is a no-op, not a crash (advisor r1)
    assert c.evaluate_batch(np.zeros((0, 5), dtype=np.int64)).shape == (0,)


def test_partitioned_adaptive_ops(key):
    """add_with_patching / contract_adaptive / truncate_adaptive over
    mismatched partitions (ref patching.rs:152-346)."""
    from tensor4all_tpu.tt.partitioned import (
        PartitionedTT,
        Projector,
        SubDomainTT,
        add_with_patching,
        contract_adaptive,
        split_subdomain,
        truncate_adaptive,
    )
    import jax

    dims = [3, 3, 3, 3, 3]
    tt_a = TensorTrain.random(jax.random.PRNGKey(10), dims, rank=4)
    tt_b = TensorTrain.random(jax.random.PRNGKey(11), dims, rank=4)
    a = PartitionedTT([SubDomainTT(Projector.make({}), tt_a, dims)])
    b = PartitionedTT(split_subdomain(
        SubDomainTT(Projector.make({}), tt_b, dims), 0))
    idx = np.random.default_rng(0).integers(0, 3, (200, 5))
    fa = np.asarray(tt_a.evaluate_batch(idx))
    fb = np.asarray(tt_b.evaluate_batch(idx))
    s = add_with_patching(a, b, tol=1e-12, maxdim=64)
    np.testing.assert_allclose(s.evaluate_batch(idx), fa + fb, atol=1e-10)
    h = contract_adaptive(a, b, tol=1e-12, maxdim=64)
    np.testing.assert_allclose(h.evaluate_batch(idx), fa * fb, atol=1e-10)
    # tiny cap forces refinement, result still exact up to the cap error
    s2 = add_with_patching(a, b, tol=1e-14, maxdim=3, max_depth=2)
    assert len(s2) > len(s)
    assert s2.max_rank() <= 3
    np.testing.assert_allclose(s2.evaluate_batch(idx), fa + fb, atol=1e-8)
    t = truncate_adaptive(s2, tol=1e-12, maxdim=4, max_depth=2)
    np.testing.assert_allclose(t.evaluate_batch(idx), fa + fb, atol=1e-8)


def test_tci1_aca_lazy():
    """TCI1's rook/ACA growth evaluates far fewer points than the grid
    (ref tensorci1.rs / matrixaca.rs cost profile)."""
    from tensor4all_tpu.tci.tensorci1 import TCI1Options, crossinterpolate1
    from tensor4all_tpu.tci.tensorci2 import estimate_true_error

    def f(idx):
        x = (np.asarray(idx, np.float64) - 2.0) / 3.0
        return 1.0 / (1.0 + np.sum(x * x, axis=-1))

    tci, ranks, errs = crossinterpolate1(
        batch_f=f, local_dims=[6] * 6,
        options=TCI1Options(tol=1e-9, max_iter=40))
    err = estimate_true_error(tci.to_tensortrain(), tci.func,
                              n_samples=3000)
    assert err < 1e-7 * tci.f_max
    assert tci.func.num_evals < 6 ** 6 // 2


def test_tt_random_long_chain_no_overflow(key):
    """L=200 binary chain: the rank clamp used to compute d^k in int64,
    silently overflowing past ~60 sites into negative core shapes (ref
    bug_norm_oom_large_tt class). log_norm stays finite/exact where the
    plain norm underflows f64."""
    tt = TensorTrain.random(key, [2] * 200, rank=30)
    assert all(r >= 1 for r in tt.ranks)
    n = float(tt.norm())
    assert np.isfinite(n)
    ln = float(tt.log_norm())
    assert np.isfinite(ln)
    # scaling by c shifts log_norm by exactly log(c)
    assert abs(float(tt.scale(1e8).log_norm()) - ln - np.log(1e8)) < 1e-8
