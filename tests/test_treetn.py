"""TreeTN container tests (ref treetn crate tests; dense oracles)."""

import jax
import networkx as nx
import numpy as np
import pytest

from tensor4all_tpu import Index, SvdTruncationPolicy, Tensor, contract
from tensor4all_tpu.treetn.network import TreeTN, random_treetn


def chain_graph(n):
    g = nx.Graph()
    for i in range(n - 1):
        g.add_edge(i, i + 1)
    return g


def star_graph(n):
    g = nx.Graph()
    for i in range(1, n):
        g.add_edge(0, i)
    return g


@pytest.fixture(params=["chain", "star", "tree"])
def topology(request):
    if request.param == "chain":
        return chain_graph(5)
    if request.param == "star":
        return star_graph(5)
    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (1, 3), (3, 4), (3, 5)])
    return g


def make_random(key, topology, chi=3, d=2):
    dims = {n: [d] for n in topology.nodes}
    return random_treetn(key, topology, dims, bond_dim=chi)


def dense_of(tn, site_inds):
    t = tn.contract_to_tensor()
    order = [site_inds[n][0] for n in sorted(tn.node_names)]
    return np.asarray(t.dense(order))


def test_from_tensors_autoconnect(key):
    i01, i12 = Index(3, tags="Link"), Index(4, tags="Link")
    s0, s1, s2 = Index(2), Index(2), Index(2)
    ks = jax.random.split(key, 3)
    t0 = Tensor.random(ks[0], (s0, i01))
    t1 = Tensor.random(ks[1], (i01, s1, i12))
    t2 = Tensor.random(ks[2], (i12, s2))
    tn = TreeTN.from_tensors({"a": t0, "b": t1, "c": t2})
    tn.validate_tree()
    assert set(tn.neighbors("b")) == {"a", "c"}
    assert tn.bond("a", "b") == i01
    assert tn.site_indices("b") == (s1,)
    expect = contract([t0, t1, t2])
    np.testing.assert_allclose(
        np.asarray(tn.contract_to_tensor().dense((s0, s1, s2))),
        np.asarray(expect.dense((s0, s1, s2))),
        atol=1e-12,
    )


def test_canonicalize_preserves_and_isometry(key, topology):
    tn, site_inds = make_random(key, topology)
    before = dense_of(tn, site_inds)
    center = list(topology.nodes)[0]
    tn.canonicalize([center])
    after = dense_of(tn, site_inds)
    np.testing.assert_allclose(after, before, atol=1e-10)
    assert tn.canonical_region() == {center}
    tn.verify_canonical()


def test_truncate_exact_rank(key, topology):
    # duplicate-added network has inflated bonds; truncate must deflate
    tn, site_inds = make_random(key, topology, chi=2)
    tsum = tn.add(tn)  # rank doubles, content = 2*tn
    before = 2 * dense_of(tn, site_inds)
    np.testing.assert_allclose(dense_of(tsum, site_inds), before, atol=1e-10)
    tsum.truncate(SvdTruncationPolicy(tol=1e-12))
    after = dense_of(tsum, site_inds)
    np.testing.assert_allclose(after, before, atol=1e-8)
    assert tsum.max_bond_dim() <= tn.max_bond_dim() * 2
    # rank should deflate back to the original chi (content is proportional)
    assert tsum.max_bond_dim() <= max(2, tn.max_bond_dim())


def test_inner_norm(key, topology):
    tn, site_inds = make_random(key, topology)
    tn2, _ = make_random(jax.random.PRNGKey(7), topology)
    # tn2 has *different* site indices; rebuild with same ones for overlap
    d1 = dense_of(tn, site_inds)
    got = float(tn.inner(tn))
    np.testing.assert_allclose(got, np.vdot(d1, d1), atol=1e-10)
    np.testing.assert_allclose(float(tn.norm()), np.linalg.norm(d1), atol=1e-10)


def test_add(key, topology):
    tn, site_inds = make_random(key, topology)
    s = tn.add(tn.scale(-1.0))
    d = dense_of(s, site_inds)
    np.testing.assert_allclose(d, np.zeros_like(d), atol=1e-10)


def test_evaluate(key, topology):
    tn, site_inds = make_random(key, topology)
    d = dense_of(tn, site_inds)
    names = sorted(tn.node_names)
    rng = np.random.default_rng(0)
    for _ in range(5):
        assign = {site_inds[n][0]: int(rng.integers(0, 2)) for n in names}
        got = float(tn.evaluate(assign))
        pos = tuple(assign[site_inds[n][0]] for n in names)
        assert abs(got - d[pos]) < 1e-12


def test_validate_cycle():
    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (2, 0)])
    tn, _ = make_random(jax.random.PRNGKey(0), g)
    with pytest.raises(ValueError):
        tn.validate_tree()
