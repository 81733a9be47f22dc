"""TCI2 tests — closed-form function oracles (SURVEY.md §4: polynomials,
Gaussians; BASELINE.json config 2)."""

import numpy as np
import pytest

from tensor4all_tpu.tci import (
    CachedFunction,
    IndexSet,
    TCI2Options,
    crossinterpolate2,
    estimate_true_error,
    make_jax_batch_f,
)


def test_indexset():
    s = IndexSet([(0, 1), (2, 3)])
    assert len(s) == 2
    assert s.position((2, 3)) == 1
    assert s.add((0, 1)) == 0  # no dup
    assert s.add((4, 5)) == 2
    assert (4, 5) in s


def test_cached_function_stats():
    calls = []

    def f(idx):
        calls.append(idx)
        return float(sum(idx))

    cf = CachedFunction(f=f, local_dims=[3, 3])
    assert cf((1, 2)) == 3.0
    assert cf((1, 2)) == 3.0
    assert cf.num_evals == 1 and cf.num_cache_hits == 1
    out = cf.eval_batch([[1, 2], [0, 0], [1, 2]])
    np.testing.assert_allclose(out, [3.0, 0.0, 3.0])
    assert cf.num_evals == 2  # only (0,0) was new
    assert cf.cache_hit_ratio > 0


def test_cached_function_batch_f():
    def batch_f(idx):
        return idx.sum(axis=1).astype(float)

    cf = CachedFunction(batch_f=batch_f, local_dims=[2, 2, 2])
    out = cf.eval_batch([[1, 1, 1], [0, 1, 0]])
    np.testing.assert_allclose(out, [3.0, 1.0])


def test_tci2_rank1_product():
    # separable function -> rank 1
    dims = [4, 5, 6]

    def batch_f(idx):
        return np.prod(1.0 + idx, axis=1).astype(float)

    tci, ranks, errs = crossinterpolate2(
        batch_f=batch_f, local_dims=dims,
        options=TCI2Options(tol=1e-10, max_iter=6),
    )
    tt = tci.to_tensortrain()
    assert max(tt.ranks) == 1
    err = estimate_true_error(tt, tci.func, n_samples=200)
    assert err < 1e-8


def test_tci2_sum_function():
    # f = sum of coordinates -> rank 2
    dims = [3, 3, 3, 3, 3]

    def batch_f(idx):
        return idx.sum(axis=1).astype(float) + 1.0

    tci, ranks, errs = crossinterpolate2(
        batch_f=batch_f, local_dims=dims,
        options=TCI2Options(tol=1e-10, max_iter=8),
    )
    tt = tci.to_tensortrain()
    assert max(tt.ranks) <= 2
    assert estimate_true_error(tt, tci.func) < 1e-8


def test_tci2_gaussian_10d():
    # BASELINE.json config 2: 10-D multivariate Gaussian to tol 1e-8
    L, d = 10, 4
    xs = np.linspace(-1, 1, d)

    def batch_f(idx):
        x = xs[idx]
        return np.exp(-np.sum(x * x, axis=1))

    tci, ranks, errs = crossinterpolate2(
        batch_f=batch_f, local_dims=[d] * L,
        options=TCI2Options(tol=1e-10, max_iter=12),
    )
    tt = tci.to_tensortrain()
    err = estimate_true_error(tt, tci.func, n_samples=2000)
    assert err < 1e-8
    # separable gaussian: near rank-1; allow small slack
    assert max(tt.ranks) <= 3


def test_tci2_oscillatory_2d_exact():
    # small 2-D grid: compare against the full dense tensor
    d0, d1 = 8, 9

    def batch_f(idx):
        x = idx[:, 0] / d0
        y = idx[:, 1] / d1
        return np.cos(5 * x * y) + x

    tci, _, _ = crossinterpolate2(
        batch_f=batch_f, local_dims=[d0, d1],
        options=TCI2Options(tol=1e-12, max_iter=10),
    )
    tt = tci.to_tensortrain()
    dense = np.asarray(tt.full_tensor())
    ii, jj = np.meshgrid(np.arange(d0), np.arange(d1), indexing="ij")
    idx = np.stack([ii.ravel(), jj.ravel()], axis=1)
    expect = batch_f(idx).reshape(d0, d1)
    np.testing.assert_allclose(dense, expect, atol=1e-8)


def test_tci2_global_pivots_find_missed_region():
    # narrow (but smooth) Gaussian bump far from the initial pivot
    # (0,...,0): greedy ascent from random starts must localize it
    # (ref globalsearch.rs random starts + local descent on |f - tt|)
    L, d = 6, 4
    center = np.asarray([3, 3, 3, 3, 3, 3])

    def batch_f(idx):
        base = 1e-3 * np.prod(np.cos(idx * 0.1), axis=1)
        r2 = np.sum((idx - center) ** 2, axis=1)
        return base + 10.0 * np.exp(-r2 / 2.0)

    opts = TCI2Options(tol=1e-8, max_iter=12, n_global_pivots=4,
                       global_search_starts=64, seed=3)
    tci, _, _ = crossinterpolate2(batch_f=batch_f, local_dims=[d] * L,
                                  options=opts)
    tt = tci.to_tensortrain()
    from tensor4all_tpu.tci import estimate_true_error as ete
    err = ete(tt, tci.func, n_samples=4000)
    assert err < 1e-6 * tci.f_max
    bump_val = float(tt.evaluate(center))
    f_true = batch_f(center[None, :])[0]
    assert abs(bump_val - f_true) < 1e-6 * abs(f_true)


def test_tci2_maxbonddim():
    dims = [6] * 4
    rng = np.random.default_rng(0)
    tensor = rng.standard_normal(dims)  # full-rank noise

    def batch_f(idx):
        return tensor[tuple(idx.T)]

    opts = TCI2Options(tol=1e-14, max_iter=4, maxbonddim=3)
    tci, _, _ = crossinterpolate2(batch_f=batch_f, local_dims=dims,
                                  options=opts)
    tt = tci.to_tensortrain()
    assert max(tt.ranks) <= 3


def test_tci2_jax_fast_path(key):
    import jax.numpy as jnp

    xs = np.linspace(0, 1, 8)

    def jf(idx):
        x = jnp.take(jnp.asarray(xs), idx)
        return jnp.exp(-jnp.sum(x**2))

    batch_f = make_jax_batch_f(jf, n_args=5)
    tci, _, _ = crossinterpolate2(
        batch_f=batch_f, local_dims=[8] * 5,
        options=TCI2Options(tol=1e-10, max_iter=8),
    )
    tt = tci.to_tensortrain()
    assert estimate_true_error(tt, tci.func) < 1e-8


def gauss10_batch(idx):
    """BASELINE.json config 2: 10-D multivariate Gaussian."""
    x = (np.asarray(idx, dtype=np.float64) - 3.5) / 3.0
    return np.exp(-np.sum(x * x, axis=-1))


def test_tci2_10d_gaussian_monotone_ranks():
    """VERDICT r1 #3 done-criterion: 10-D Gaussian converges with a
    monotone rank history (nested accumulation, tensorci2.rs:1571)."""
    dims = [8] * 10
    tci, ranks, errs = crossinterpolate2(
        batch_f=gauss10_batch, local_dims=dims,
        options=TCI2Options(tol=1e-8, max_iter=16, seed=0),
    )
    assert all(r2 >= r1 for r1, r2 in zip(ranks, ranks[1:])), ranks
    tt = tci.to_tensortrain()
    err = estimate_true_error(tt, tci.func, n_samples=4000)
    assert err < 1e-7 * tci.f_max


def test_tci2_to_tensortrain_zero_new_evals():
    """Site tensors are state: to_tensortrain costs no new f-evals
    (ref tensorci2.rs:541)."""
    tci, _, _ = crossinterpolate2(
        batch_f=gauss10_batch, local_dims=[4] * 6,
        options=TCI2Options(tol=1e-10, max_iter=10),
    )
    n0 = tci.func.num_evals
    tt1 = tci.to_tensortrain()
    tt2 = tci.to_tensortrain()
    assert tci.func.num_evals == n0
    np.testing.assert_allclose(np.asarray(tt1.full_tensor()),
                               np.asarray(tt2.full_tensor()))


def test_tci2_rook_matches_full():
    """Rook pivot search agrees with full to tolerance and uses fewer
    f-evals (ref PivotSearchStrategy::Rook, tensorci2.rs:191,1631)."""
    dims = [8] * 6

    def batch_f(idx):
        x = (np.asarray(idx, dtype=np.float64) - 2.0) / 3.0
        return 1.0 / (1.0 + np.sum(x * x, axis=-1))

    tci_full, _, _ = crossinterpolate2(
        batch_f=batch_f, local_dims=dims,
        options=TCI2Options(tol=1e-8, max_iter=12, pivot_search="full"))
    tci_rook, _, _ = crossinterpolate2(
        batch_f=batch_f, local_dims=dims,
        options=TCI2Options(tol=1e-8, max_iter=12, pivot_search="rook"))
    err_full = estimate_true_error(tci_full.to_tensortrain(), tci_full.func)
    err_rook = estimate_true_error(tci_rook.to_tensortrain(), tci_rook.func)
    assert err_full < 1e-7 * tci_full.f_max
    assert err_rook < 1e-7 * tci_rook.f_max
    # the rook path must not materialize the full Pi matrices
    assert tci_rook.func.num_evals < tci_full.func.num_evals


def test_tci2_from_tensortrain_direct_extraction():
    """TT -> TCI2 pivot extraction uses the cores, not re-interpolation:
    zero function evaluations (ref conversion.rs sweep_pair)."""
    from tensor4all_tpu.tci.conversion import tci2_from_tensortrain
    from tensor4all_tpu.tt.tensortrain import TensorTrain
    import jax

    tt = TensorTrain.random(jax.random.PRNGKey(0), [3, 4, 3, 2], rank=5)
    tci = tci2_from_tensortrain(tt, tol=1e-13)
    assert tci.func.num_evals == 0
    tt2 = tci.to_tensortrain()
    assert tci.func.num_evals == 0  # site tensors came from the cores
    np.testing.assert_allclose(np.asarray(tt2.full_tensor()),
                               np.asarray(tt.full_tensor()), atol=1e-10)
    assert [len(s) for s in tci.Iset[1:]] == [len(s) for s in tci.Iset[1:]]


def test_tci2_make_canonical():
    tci, _, _ = crossinterpolate2(
        batch_f=gauss10_batch, local_dims=[4] * 5,
        options=TCI2Options(tol=1e-10, max_iter=8))
    tt_before = np.asarray(tci.to_tensortrain().full_tensor())
    tci.make_canonical(rel_tol=1e-13, abs_tol=1e-12 * tci.f_max)
    tt_after = np.asarray(tci.to_tensortrain().full_tensor())
    np.testing.assert_allclose(tt_after, tt_before, atol=1e-8)


def test_tci2_sweep_strategies():
    dims = [4] * 5
    for strat in ("forward", "backward", "backandforth"):
        tci, _, _ = crossinterpolate2(
            batch_f=gauss10_batch, local_dims=dims,
            options=TCI2Options(tol=1e-9, max_iter=12,
                                sweep_strategy=strat))
        err = estimate_true_error(tci.to_tensortrain(), tci.func)
        assert err < 1e-8 * tci.f_max, strat


def test_floating_zone():
    """Coordinate-ascent worst-error search (ref globalsearch.rs:142)."""
    from tensor4all_tpu.tci import floating_zone
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    # tt = 0; f(i, j) = i*j -> worst point (3, 3), error 9
    tt = TensorTrain.zeros([4, 4])
    bf = lambda idx: (idx[:, 0] * idx[:, 1]).astype(float)
    pivot, err = floating_zone(tt, bf, [4, 4], init_p=[2, 2])
    assert pivot == (3, 3)
    assert abs(err - 9.0) < 1e-10


def test_tci2_fused_device_bond_update():
    """device_bond_update=True fuses Pi fill + rrLU into one program
    per bond (VERDICT r3 #3); pivot sets stay on host and the result
    must match the host bond update's accuracy at the same rank."""
    import jax.numpy as jnp

    xs = jnp.linspace(-1.0, 1.0, 8)
    w = jnp.asarray(0.3 + 0.1 * np.arange(6))

    def jf(idx):
        x = xs[idx]
        quad = jnp.sum(w * x * x) + 0.2 * jnp.sum(x[:-1] * x[1:])
        return jnp.exp(-quad)

    host, _, _ = crossinterpolate2(
        jax_f=jf, local_dims=[8] * 6,
        options=TCI2Options(tol=1e-9, max_iter=10))
    fused, _, _ = crossinterpolate2(
        jax_f=jf, local_dims=[8] * 6,
        options=TCI2Options(tol=1e-9, max_iter=10,
                            device_bond_update=True))
    err_h = estimate_true_error(host.to_tensortrain(), host.func,
                                n_samples=2000)
    err_f = estimate_true_error(fused.to_tensortrain(), fused.func,
                                n_samples=2000)
    assert err_f < 1e-7 * fused.f_max, err_f
    assert fused.rank == host.rank
    assert abs(err_f - err_h) < 1e-7 * fused.f_max
