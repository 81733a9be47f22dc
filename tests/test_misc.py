"""BlockTensor, profiling, checkpoint, memory utils tests."""

import numpy as np
import pytest

from tensor4all_tpu import Index, Tensor
from tensor4all_tpu.core.block_tensor import BlockTensor
from tensor4all_tpu.core.krylov import gmres
from tensor4all_tpu.io.checkpoint import (
    load_tci2,
    load_tensortrain,
    save_tci2,
    save_tensortrain,
)
from tensor4all_tpu.utils.memory import (
    device_memory_stats,
    live_array_bytes,
    memory_pressure_relief,
)
from tensor4all_tpu.utils.profiling import (
    print_and_reset_profile,
    profile_report,
    timed,
)


def test_block_tensor_gmres(rng):
    # block system: two decoupled dense systems through one GMRES
    i = Index(5)
    a1 = np.eye(5) + 0.1 * rng.standard_normal((5, 5))
    a2 = np.eye(5) + 0.1 * rng.standard_normal((5, 5))
    b = BlockTensor({
        "u": Tensor((i,), rng.standard_normal(5)),
        "v": Tensor((i,), rng.standard_normal(5)),
    })
    import jax.numpy as jnp

    m1, m2 = jnp.asarray(a1), jnp.asarray(a2)

    def apply_a(x: BlockTensor) -> BlockTensor:
        return BlockTensor({
            "u": Tensor((i,), m1 @ x["u"].data),
            "v": Tensor((i,), m2 @ x["v"].data),
        })

    res = gmres(apply_a, b, rtol=1e-12)
    assert res.converged
    np.testing.assert_allclose(
        np.asarray(res.x["u"].data),
        np.linalg.solve(a1, np.asarray(b["u"].data)), atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(res.x["v"].data),
        np.linalg.solve(a2, np.asarray(b["v"].data)), atol=1e-9,
    )


def test_block_tensor_structure_mismatch(rng):
    i = Index(3)
    a = BlockTensor({"u": Tensor((i,), rng.standard_normal(3))})
    b = BlockTensor({"w": Tensor((i,), rng.standard_normal(3))})
    with pytest.raises(ValueError):
        a + b


def test_profiling_counters():
    with timed("unit-test-op"):
        pass
    rep = profile_report()
    assert "unit-test-op" in rep
    print_and_reset_profile()
    assert "unit-test-op" not in profile_report()


def test_checkpoint_tt_roundtrip(tmp_path, key):
    from tensor4all_tpu.tt import TensorTrain

    tt = TensorTrain.random(key, [2, 3, 2], rank=3)
    p = str(tmp_path / "tt.npz")
    save_tensortrain(p, tt)
    tt2 = load_tensortrain(p)
    np.testing.assert_allclose(
        np.asarray(tt2.full_tensor()), np.asarray(tt.full_tensor())
    )


def test_checkpoint_tci2_roundtrip(tmp_path):
    from tensor4all_tpu.tci import TCI2Options, crossinterpolate2

    def batch_f(idx):
        return np.exp(-np.sum(idx * 0.3, axis=1))

    tci, _, _ = crossinterpolate2(
        batch_f=batch_f, local_dims=[3, 3, 3],
        options=TCI2Options(tol=1e-10, max_iter=6),
    )
    save_tci2(str(tmp_path / "ck"), tci)
    tci2 = load_tci2(str(tmp_path / "ck"), batch_f=batch_f)
    assert tci2.ranks == tci.ranks
    tt_a = tci.to_tensortrain()
    tt_b = tci2.to_tensortrain()
    np.testing.assert_allclose(
        np.asarray(tt_b.full_tensor()), np.asarray(tt_a.full_tensor()),
        atol=1e-10,
    )


def test_memory_utils():
    assert live_array_bytes() >= 0
    device_memory_stats()  # must not raise
    memory_pressure_relief()


def test_site_index_network():
    """SiteIndexNetwork bookkeeping (ref site_index_network.rs)."""
    import jax
    import networkx as nx

    from tensor4all_tpu.treetn.network import random_treetn
    from tensor4all_tpu.treetn.site_index_network import SiteIndexNetwork
    from tensor4all_tpu.models.spin import heisenberg

    g = nx.path_graph(4)
    tn, sites = random_treetn(jax.random.PRNGKey(0), g,
                              {n: [2] for n in g.nodes}, bond_dim=2)
    net = SiteIndexNetwork.from_treetn(tn)
    assert net.node_count() == 4 and net.edge_count() == 3
    net.validate_tree()
    s0 = sites[0][0]
    assert net.find_node_by_index(s0) == 0
    assert net.contains_index(s0)
    net2 = SiteIndexNetwork.from_treetn(tn)
    assert net == net2
    net2.rename_node(3, "last")
    assert not net.same_topology(net2)
    op = heisenberg(g, {n: sites[n][0] for n in g.nodes})
    assert net.operator_compatible(op)
    from tensor4all_tpu.core.index import Index

    net.replace_site_index(0, s0, Index(2, tags="new"))
    assert not net.operator_compatible(op)


def test_tensor_like_protocols():
    """TensorLike protocol family (ref tensor_like.rs): core types
    conform structurally."""
    import jax

    from tensor4all_tpu.core.index import Index
    from tensor4all_tpu.core.tensor import Tensor
    from tensor4all_tpu.core.tensor_like import (
        TensorIndexLike,
        TensorVectorSpaceLike,
        conforms,
    )
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    t = Tensor.random(jax.random.PRNGKey(0), [Index(2), Index(3)])
    ok, missing = conforms(t, TensorIndexLike)
    assert ok, missing
    ok, missing = conforms(t, TensorVectorSpaceLike)
    assert ok, missing
    tt = TensorTrain.random(jax.random.PRNGKey(0), [2, 2], rank=2)
    ok, missing = conforms(tt, TensorVectorSpaceLike)
    assert ok, missing
    assert isinstance(t, TensorIndexLike)


def test_cached_function_thread_safety():
    """Concurrent eval_batch on one CachedFunction (ref send_sync.rs /
    cached_function RwLock): no lost updates, consistent values."""
    import concurrent.futures as cf

    from tensor4all_tpu.tci.cached_function import CachedFunction

    def batch_f(idx):
        return np.sum(idx * 0.5, axis=1)

    cf_obj = CachedFunction(batch_f=batch_f, local_dims=[7] * 4)
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 7, (64, 4)) for _ in range(16)]

    def work(b):
        return cf_obj.eval_batch(b)

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        outs = list(ex.map(work, batches))
    for b, o in zip(batches, outs):
        np.testing.assert_allclose(o, batch_f(b))
    assert cf_obj.cache_size <= 7 ** 4


def test_colmajor_array():
    """ColMajorArray interchange (ref col_major_array.rs)."""
    from tensor4all_tpu.core.colmajor import ColMajorArray

    a = np.arange(24.0).reshape(2, 3, 4)
    c = ColMajorArray.from_array(a)
    assert c.dims == (2, 3, 4) and c.rank == 3
    assert c.strides == (1, 2, 6)
    np.testing.assert_array_equal(c.to_array(), a)
    assert c[(1, 2, 3)] == a[1, 2, 3]
    assert c.flat[0] == a[0, 0, 0] and c.flat[1] == a[1, 0, 0]


def test_mpo_fit_contraction(key):
    """MPO apply_fit / compose_fit with cached environments
    (ref mpo/contract_fit.rs + environment.rs)."""
    import jax

    from tensor4all_tpu.tt import MPO
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    L, d, chi = 6, 2, 4
    ks = jax.random.split(key, 2 * L)
    links = [1] + [chi] * (L - 1) + [1]
    W = MPO([jax.random.normal(ks[k], (links[k], d, d, links[k + 1]))
             / chi for k in range(L)])
    B = MPO([jax.random.normal(ks[L + k], (links[k], d, d, links[k + 1]))
             / chi for k in range(L)])
    x = TensorTrain.random(jax.random.PRNGKey(5), [d] * L, rank=chi)
    ref = np.asarray(W.apply_naive(x).full_tensor())
    fit = np.asarray(W.apply_fit(x, tol=1e-13).full_tensor())
    assert np.abs(fit - ref).max() < 1e-9 * np.abs(ref).max()
    refc = np.asarray(W.compose_naive(B).to_dense_matrix())
    fitc = np.asarray(W.compose_fit(B, tol=1e-13).to_dense_matrix())
    assert np.abs(fitc - refc).max() < 1e-9 * np.abs(refc).max()
    capped = W.apply_fit(x, tol=0.0, maxdim=4)
    assert max(capped.ranks) <= 4


def test_capi_helpers_restructure_and_structured():
    """Binding-level helpers behind t4a_treetn_restructure_to and
    t4a_tensor_new_structured_* (ref capi treetn.rs:1265,
    tensor.rs:848)."""
    import jax
    import networkx as nx
    import numpy as np

    from tensor4all_tpu.capi import helpers as H
    from tensor4all_tpu.core.index import Index
    from tensor4all_tpu.treetn.network import random_treetn

    # structured: two axes sharing class 1 -> generalized diagonal
    i0, i1, i2 = Index(3), Index(3), Index(2)
    payload = np.arange(6.0)
    t = H.tensor_structured([i0, i1, i2], [1, 1, 0], payload, [3, 2])
    dense = np.asarray(t.dense([i0, i1, i2]))
    want = np.zeros((3, 3, 2))
    for a in range(3):
        for c in range(2):
            want[a, a, c] = payload.reshape(3, 2, order="F")[a, c]
    np.testing.assert_allclose(dense, want)
    assert H.tensor_axis_classes(t) == [0, 0, 0]

    # diag
    td = H.tensor_diag_general([i0, i1], [5.0, 6.0, 7.0])
    np.testing.assert_allclose(np.asarray(td.dense([i0, i1])),
                               np.diag([5.0, 6.0, 7.0]))

    # restructure_to through the binding helper: 4-chain -> 2 nodes
    g = nx.path_graph(4)
    tn, si = random_treetn(jax.random.PRNGKey(0), g,
                           {n: [2] for n in g.nodes}, bond_dim=3)
    h = H.CTreeTN()
    h._net = tn
    names = ["L", "R"]
    sites_flat = [si[0][0], si[1][0], si[2][0], si[3][0]]
    out = H.treetn_restructure_to(h, names, sites_flat, [2, 2],
                                  ["L"], ["R"], 1e-12, 64)
    net = out.net()
    assert set(net.node_names) == {"L", "R"}
    order = [si[n][0] for n in range(4)]
    a = np.asarray(tn.contract_to_tensor().dense(order))
    b = np.asarray(net.contract_to_tensor().dense(order))
    np.testing.assert_allclose(b, a, atol=1e-9 * np.abs(a).max())
