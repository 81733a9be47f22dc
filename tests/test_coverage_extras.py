"""Targeted tests for branches the main suites leave cold: MPO algebra
variants, variational fit paths, rrLU LUCI edge cases, the native
loader, and local-update plumbing (coverage-gate driven)."""

import jax
import numpy as np
import pytest

from tensor4all_tpu.tt import MPO, TensorTrain


def _rand_mpo(key, L=4, d=2, chi=3, dtype=None):
    import jax.numpy as jnp

    links = [1] + [chi] * (L - 1) + [1]
    ks = jax.random.split(key, L)
    dt = dtype or jnp.float64
    return MPO([jax.random.normal(ks[k], (links[k], d, d, links[k + 1]),
                                  dt) / chi for k in range(L)])


def test_mpo_algebra(key):
    a = _rand_mpo(key)
    b = _rand_mpo(jax.random.PRNGKey(1))
    A = np.asarray(a.to_dense_matrix())
    B = np.asarray(b.to_dense_matrix())
    np.testing.assert_allclose(np.asarray((a + b).to_dense_matrix()),
                               A + B, atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.scale(2.5).to_dense_matrix()),
                               2.5 * A, atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.transpose().to_dense_matrix()),
                               A.T, atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.conj().to_dense_matrix()),
                               np.conj(A), atol=1e-12)
    eye = MPO.identity([2] * 4)
    np.testing.assert_allclose(np.asarray(eye.to_dense_matrix()),
                               np.eye(16), atol=1e-15)
    # errors
    with pytest.raises(ValueError):
        MPO([np.zeros((2, 2, 2, 1))])  # bad boundary
    with pytest.raises(ValueError):
        MPO([np.zeros((1, 2, 2))])  # bad rank


def test_mpo_apply_and_compose_fit(key):
    a = _rand_mpo(key)
    b = _rand_mpo(jax.random.PRNGKey(2))
    x = TensorTrain.random(jax.random.PRNGKey(3), [2] * 4, rank=3)
    A = np.asarray(a.to_dense_matrix())
    xv = np.asarray(x.full_tensor()).reshape(-1)
    # apply_fit converges to the exact product at full rank
    y = a.apply_fit(x, tol=1e-13, maxdim=32, nsweeps=3)
    np.testing.assert_allclose(
        np.asarray(y.full_tensor()).reshape(-1), A @ xv, atol=1e-9)
    # warm start from an explicit initial guess
    y0 = a.apply_zipup(x, tol=1e-3, maxdim=2)
    y2 = a.apply_fit(x, tol=1e-13, maxdim=32, nsweeps=4, initial=y0)
    np.testing.assert_allclose(
        np.asarray(y2.full_tensor()).reshape(-1), A @ xv, atol=1e-8)
    # compose_fit vs naive compose
    B = np.asarray(b.to_dense_matrix())
    got = a.compose_fit(b, tol=1e-13, maxdim=32, nsweeps=3)
    np.testing.assert_allclose(np.asarray(got.to_dense_matrix()),
                               A @ B, atol=1e-8)
    # dims mismatch errors
    c = _rand_mpo(jax.random.PRNGKey(4), d=3)
    with pytest.raises(ValueError):
        a.compose_fit(c)
    with pytest.raises(ValueError):
        a.apply_fit(TensorTrain.random(jax.random.PRNGKey(5), [3] * 4,
                                       rank=2))


def test_fit_networks_options(key):
    """treetn.fit variational contraction across both env flavors."""
    import networkx as nx

    from tensor4all_tpu.config import SvdTruncationPolicy
    from tensor4all_tpu.treetn.contraction import contract_networks
    from tensor4all_tpu.treetn.network import random_treetn

    g = nx.path_graph(4)
    tn, _ = random_treetn(key, g, {n: [2] for n in g.nodes}, bond_dim=3)
    other = tn.sim_linkinds()
    exact = complex(np.asarray(
        contract_networks(tn, other, method="naive")
        .contract_to_tensor().dense(())))
    fitted = contract_networks(tn, other, method="fit",
                               policy=SvdTruncationPolicy(tol=1e-13),
                               max_rank=16)
    got = complex(np.asarray(fitted.contract_to_tensor().dense(())))
    np.testing.assert_allclose(got.real, exact.real, rtol=1e-8)


def test_rrlu_luci_edges():
    from tensor4all_tpu.ops.rrlu import (
        luci_factors_from_matrix,
        luci_rook_from_blocks,
        matrix_ci_factors,
        rrlu,
    )

    rng = np.random.default_rng(0)
    A = rng.standard_normal((8, 6))
    # right-orthogonal (left_orthogonal=False) factor convention
    f = luci_factors_from_matrix(A, rel_tol=0.0, left_orthogonal=False)
    np.testing.assert_allclose(np.asarray(f.left) @ np.asarray(f.right),
                               A, atol=1e-10)
    # right factor interpolates: identity at pivot COLUMNS
    R = np.asarray(f.right)[:, f.col_indices]
    np.testing.assert_allclose(R, np.eye(f.rank), atol=1e-10)
    # compute_factors=False returns only pivots
    f2 = luci_factors_from_matrix(A, compute_factors=False)
    assert f2.left is None and f2.right is None and f2.rank == 6
    # zero matrix: rank 0 with empty factors
    z = luci_factors_from_matrix(np.zeros((4, 5)))
    assert z.rank == 0 and z.left.shape == (4, 0)
    # matrix_ci_factors on rank-deficient input
    low = np.outer(rng.standard_normal(7), rng.standard_normal(5))
    left, right, rows, cols, err = matrix_ci_factors(low, rtol=1e-10)
    assert len(rows) == 1 and err < 1e-10
    np.testing.assert_allclose(np.asarray(left) @ np.asarray(right), low,
                               atol=1e-10)
    # rook warm start: previously accepted pivots are kept
    def fill(rs, cs):
        return A[np.ix_(rs, cs)]

    base = luci_rook_from_blocks(8, 6, fill, rel_tol=1e-13, max_rank=2)
    warm = luci_rook_from_blocks(8, 6, fill, rel_tol=1e-13,
                                 initial_rows=list(base.row_indices),
                                 initial_cols=list(base.col_indices))
    assert warm.rank == 6
    assert set(base.row_indices) <= set(warm.row_indices)
    with pytest.raises(ValueError):
        luci_rook_from_blocks(8, 6, fill, initial_rows=[0],
                              initial_cols=[])
    # empty rrlu edge
    e = rrlu(np.zeros((0, 4)))
    assert e.rank == 0


def test_native_loader_paths(monkeypatch):
    import tensor4all_tpu.native as nat

    # T4A_DISABLE_NATIVE honored (fresh load state)
    monkeypatch.setattr(nat, "_LIB", None)
    monkeypatch.setattr(nat, "_TRIED", False)
    monkeypatch.setenv("T4A_DISABLE_NATIVE", "1")
    assert nat.load() is None
    monkeypatch.setenv("T4A_DISABLE_NATIVE", "0")
    monkeypatch.setattr(nat, "_TRIED", False)
    lib = nat.load()
    if lib is None:
        pytest.skip("native kernels unavailable")
    # unsupported dtype falls back to None
    assert nat.jacobi_svd(np.zeros((2, 2), np.float32)) is None
    # empty matrix shortcut
    u, s, vh = nat.jacobi_svd(np.zeros((0, 3)))
    assert u.shape == (0, 0) and vh.shape == (0, 3)
    # rank-deficient: orthonormal completion of vh
    rng = np.random.default_rng(1)
    A = np.outer(rng.standard_normal(5), rng.standard_normal(8))
    u, s, vh = nat.jacobi_svd(A)
    assert np.abs(vh @ vh.conj().T - np.eye(5)).max() < 1e-12
    np.testing.assert_allclose((u * s) @ vh, A, atol=1e-12 * s[0])


def test_localupdate_plumbing(key):
    import networkx as nx

    from tensor4all_tpu.treetn.localupdate import (
        LocalUpdateSweepPlan,
        extract_subtree,
        replace_subtree,
    )
    from tensor4all_tpu.treetn.network import random_treetn

    g = nx.star_graph(3)  # center 0, leaves 1..3
    tn, _ = random_treetn(key, g, {n: [2] for n in g.nodes}, bond_dim=2)
    plan1 = LocalUpdateSweepPlan.from_treetn(tn, 0, nsite=1)
    assert all(len(s.nodes) == 1 for s in plan1.steps)
    plan2 = LocalUpdateSweepPlan.from_treetn(tn, 0, nsite=2)
    assert all(len(s.nodes) == 2 for s in plan2.steps)
    # every edge appears in the two-site tour
    covered = {frozenset(s.nodes) for s in plan2.steps}
    assert covered == {frozenset(e) for e in g.edges}
    # extract + replace round-trips values
    sub = extract_subtree(tn, [0, 1])
    before = np.asarray(tn.contract_to_tensor().dense(
        tuple(tn.site_indices(0) + tn.site_indices(1)
              + tn.site_indices(2) + tn.site_indices(3))))
    replace_subtree(tn, [0, 1], sub)
    after = np.asarray(tn.contract_to_tensor().dense(
        tuple(tn.site_indices(0) + tn.site_indices(1)
              + tn.site_indices(2) + tn.site_indices(3))))
    np.testing.assert_allclose(after, before, atol=1e-12)
    # disconnected region rejected
    with pytest.raises(ValueError):
        extract_subtree(tn, [1, 2])


def test_rrlu_device_kernel_path(monkeypatch):
    """Exercise the jitted while_loop kernel + bucket padding (the host
    fast path normally short-circuits it on CPU)."""
    import jax.numpy as jnp

    import tensor4all_tpu.ops.rrlu as R

    monkeypatch.setattr(R, "_host_small", lambda a, cap=0: False)
    rng = np.random.default_rng(2)
    A = rng.standard_normal((20, 9)) @ rng.standard_normal((9, 13))
    res = R.rrlu(jnp.asarray(A), rtol=1e-10)
    assert res.rank == 9
    np.testing.assert_allclose(np.asarray(res.L) @ np.asarray(res.U), A,
                               atol=1e-9)
    # rank cap (traced cap never forces recompilation)
    res2 = R.rrlu(jnp.asarray(A), rtol=1e-10, max_rank=4)
    assert res2.rank == 4
    # CI factors through the jax path
    left, right = res.ci_factors()
    np.testing.assert_allclose(np.asarray(left) @ np.asarray(right), A,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(left)[res.row_pivots],
                               np.eye(9), atol=1e-10)
    # factorize_lu tensor-level dispatch
    from tensor4all_tpu.config import SvdTruncationPolicy
    from tensor4all_tpu.core.decomp import FactorizeAlg
    from tensor4all_tpu.core.index import Index
    from tensor4all_tpu.core.tensor import Tensor

    i, j = Index(6), Index(8)
    t = Tensor((i, j), jnp.asarray(rng.standard_normal((6, 8))))
    L, Rt, _ = R.factorize_lu(t, (i,), FactorizeAlg.LU, None,
                              SvdTruncationPolicy(tol=1e-12))
    from tensor4all_tpu.core.contract import contract

    recon = contract([L, Rt])
    np.testing.assert_allclose(np.asarray(recon.permute((i, j)).data),
                               np.asarray(t.data), atol=1e-10)
    # zero-matrix factorize keeps a valid rank-1 zero split
    lf, rf = R.factorize_matrix_lu(jnp.zeros((3, 4)),
                                   SvdTruncationPolicy(tol=1e-12))
    assert lf.shape == (3, 1) and rf.shape == (1, 4)


def test_mpo_zipup_fast_scan_path(key):
    """compose_zipup_fast's one-program jitted scan (bypassed on CPU at
    small dims by the host LAPACK gate)."""
    import jax.numpy as jnp

    d, L, chi = 5, 4, 3  # d*d > 16 defeats _small_cpu_mpo
    links = [1] + [chi] * (L - 1) + [1]
    ks = jax.random.split(key, 2 * L)
    a = MPO([jax.random.normal(ks[k], (links[k], d, d, links[k + 1]),
                               jnp.float64) / chi for k in range(L)])
    b = MPO([jax.random.normal(ks[L + k], (links[k], d, d, links[k + 1]),
                               jnp.float64) / chi for k in range(L)])
    exact = np.asarray(a.compose_naive(b).to_dense_matrix())
    fast = a.compose_zipup_fast(b, tol=1e-13, maxdim=chi * chi)
    np.testing.assert_allclose(np.asarray(fast.to_dense_matrix()), exact,
                               atol=1e-10 * np.abs(exact).max())
    # non-uniform site dims fall back to the general zipup
    c_cores = list(a.cores)
    c_cores[1] = jnp.asarray(np.random.default_rng(0).standard_normal(
        (chi, d, d, chi)))
    mixed_dims = MPO([jax.random.normal(ks[k], (links[k], 2 + (k % 2),
                                                2 + (k % 2),
                                                links[k + 1]))
                      for k in range(L)])
    same_shape = MPO([jax.random.normal(ks[k], (links[k], 2 + (k % 2),
                                                2 + (k % 2),
                                                links[k + 1]))
                      for k in range(L)])
    out = mixed_dims.compose_zipup_fast(same_shape, tol=1e-13, maxdim=64)
    ref = np.asarray(mixed_dims.compose_naive(same_shape).to_dense_matrix())
    np.testing.assert_allclose(np.asarray(out.to_dense_matrix()), ref,
                               atol=1e-10 * np.abs(ref).max())
