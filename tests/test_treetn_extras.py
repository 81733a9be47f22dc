"""Fit apply, restructure (fuse/split/swap), batched evaluator tests."""

import jax
import networkx as nx
import numpy as np
import pytest

from tensor4all_tpu.config import SvdTruncationPolicy
from tensor4all_tpu.models.spin import dense_heisenberg, heisenberg
from tensor4all_tpu.treetn.evaluator import TreeTNEvaluator
from tensor4all_tpu.treetn.fit import fit_apply
from tensor4all_tpu.treetn.network import random_treetn
from tensor4all_tpu.treetn.restructure import (
    fuse_to,
    split_node,
    steiner_nodes,
    swap_site_indices,
)


def chain(n):
    g = nx.Graph()
    for i in range(n - 1):
        g.add_edge(i, i + 1)
    return g


def tree6():
    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (1, 3), (3, 4), (3, 5)])
    return g


def setup(key, g, chi=3):
    dims = {n: [2] for n in g.nodes}
    tn, site_inds = random_treetn(key, g, dims, bond_dim=chi)
    sites = {n: site_inds[n][0] for n in g.nodes}
    return tn, sites


def dense_of(tn, sites, order):
    return np.asarray(tn.contract_to_tensor().dense([sites[n] for n in order]))


def test_fit_apply_matches_naive(key):
    g = chain(5)
    tn, sites = setup(key, g, chi=3)
    op = heisenberg(g, sites)
    order = list(g.nodes)
    exact = op.apply(tn, method="naive")
    fitted = fit_apply(op, tn, SvdTruncationPolicy(tol=1e-12), nsweeps=2)
    np.testing.assert_allclose(
        dense_of(fitted, sites, order), dense_of(exact, sites, order),
        atol=1e-8,
    )


def test_fit_apply_tree_topology(key):
    g = tree6()
    tn, sites = setup(key, g, chi=2)
    op = heisenberg(g, sites, J=0.7, h=0.1)
    order = list(g.nodes)
    exact = op.apply(tn, method="naive")
    fitted = fit_apply(op, tn, SvdTruncationPolicy(tol=1e-12), nsweeps=3)
    np.testing.assert_allclose(
        dense_of(fitted, sites, order), dense_of(exact, sites, order),
        atol=1e-8,
    )


def test_steiner_nodes(key):
    g = tree6()
    tn, _ = setup(key, g)
    assert steiner_nodes(tn, [0, 4]) == {0, 1, 3, 4}
    assert steiner_nodes(tn, [2]) == {2}


def test_fuse_to(key):
    g = tree6()
    tn, sites = setup(key, g)
    order = list(g.nodes)
    before = dense_of(tn, sites, order)
    fused = fuse_to(tn, [1, 3], new_name="m")
    fused.validate_tree()
    assert "m" in fused.node_names and 1 not in fused.node_names
    t = fused.contract_to_tensor()
    after = np.asarray(t.dense([sites[n] for n in order]))
    np.testing.assert_allclose(after, before, atol=1e-10)


def test_split_node(key):
    g = chain(3)
    tn, sites = setup(key, g, chi=2)
    order = list(g.nodes)
    before = dense_of(tn, sites, order)
    # fuse the middle with the right node, then split back
    fused = fuse_to(tn, [1, 2], new_name="m")
    left_inds = (sites[1], fused.bond("m", 0))
    back = split_node(fused, "m", left_inds, left_name="x", right_name="y")
    back.validate_tree()
    after = np.asarray(back.contract_to_tensor().dense(
        [sites[n] for n in order]
    ))
    np.testing.assert_allclose(after, before, atol=1e-10)


def test_swap_site_indices(key):
    g = chain(4)
    tn, sites = setup(key, g, chi=3)
    order = list(g.nodes)
    before = dense_of(tn, sites, order)
    swapped = swap_site_indices(tn, 1, 2)
    # sites of nodes 1 and 2 exchanged; the network value is unchanged
    assert sites[2] in swapped.site_indices(1)
    assert sites[1] in swapped.site_indices(2)
    after = np.asarray(swapped.contract_to_tensor().dense(
        [sites[n] for n in order]
    ))
    np.testing.assert_allclose(after, before, atol=1e-10)


def test_batched_evaluator(key):
    g = tree6()
    tn, sites = setup(key, g, chi=3)
    order = list(g.nodes)
    ev = TreeTNEvaluator(tn, [sites[n] for n in order])
    d = dense_of(tn, sites, order)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 2, size=(40, len(order)))
    got = ev.evaluate_batch(idx)
    expect = d[tuple(idx.T)]
    np.testing.assert_allclose(got, expect, atol=1e-12)
    # single point path
    a = {sites[n]: int(idx[0][k]) for k, n in enumerate(order)}
    assert abs(float(ev.evaluate(a)) - expect[0]) < 1e-12


def test_restructure_to_chain_to_balanced_tree(key):
    """VERDICT r1 #6 done-criterion: chain -> balanced tree to 1e-10
    (ref restructure/mod.rs:1306 restructure_to)."""
    import networkx as nx
    import numpy as np
    from tensor4all_tpu.treetn.network import random_treetn
    from tensor4all_tpu.treetn.restructure import restructure_to

    L = 6
    g = nx.path_graph(L)
    dims = {n: [2] for n in g.nodes}
    tn, sites = random_treetn(key, g, dims, bond_dim=4)
    s = {n: sites[n][0] for n in g.nodes}
    # balanced target: root R holds sites {2,3}; two arms hold {0,1} and
    # {4,5} as two-node chains
    tg = nx.Graph()
    tg.add_edge("R", "A1")
    tg.add_edge("A1", "A0")
    tg.add_edge("R", "B1")
    tg.add_edge("B1", "B0")
    target_sites = {
        "R": {s[2], s[3]},
        "A1": {s[1]},
        "A0": {s[0]},
        "B1": {s[4]},
        "B0": {s[5]},
    }
    out = restructure_to(tn, tg, target_sites)
    order = [s[n] for n in g.nodes]
    a = np.asarray(tn.contract_to_tensor().dense(order))
    b = np.asarray(out.contract_to_tensor().dense(order))
    np.testing.assert_allclose(b, a, atol=1e-10 * np.abs(a).max())
    assert set(out.node_names) == set(tg.nodes)


def test_restructure_to_tree_to_chain(key):
    import networkx as nx
    import numpy as np
    from tensor4all_tpu.treetn.network import random_treetn
    from tensor4all_tpu.treetn.restructure import restructure_to

    g = nx.Graph()
    g.add_edge("c", "x")
    g.add_edge("c", "y")
    g.add_edge("c", "z")
    dims = {n: [2] for n in g.nodes}
    tn, sites = random_treetn(key, g, dims, bond_dim=3)
    s = {n: sites[n][0] for n in g.nodes}
    tg = nx.path_graph(4)
    target_sites = {0: {s["x"]}, 1: {s["c"]}, 2: {s["y"]}, 3: {s["z"]}}
    out = restructure_to(tn, tg, target_sites)
    order = [s["x"], s["c"], s["y"], s["z"]]
    a = np.asarray(tn.contract_to_tensor().dense(order))
    b = np.asarray(out.contract_to_tensor().dense(order))
    np.testing.assert_allclose(b, a, atol=1e-10 * np.abs(a).max())
    assert {tuple(sorted(e)) for e in out.graph.edges} == {
        (0, 1), (1, 2), (2, 3)}


def test_restructure_to_fuse_only(key):
    import networkx as nx
    import numpy as np
    from tensor4all_tpu.treetn.network import random_treetn
    from tensor4all_tpu.treetn.restructure import restructure_to

    g = nx.path_graph(4)
    dims = {n: [2] for n in g.nodes}
    tn, sites = random_treetn(key, g, dims, bond_dim=3)
    s = {n: sites[n][0] for n in g.nodes}
    tg = nx.path_graph(2)
    target_sites = {0: {s[0], s[1]}, 1: {s[2], s[3]}}
    out = restructure_to(tn, tg, target_sites)
    order = [s[n] for n in g.nodes]
    a = np.asarray(tn.contract_to_tensor().dense(order))
    b = np.asarray(out.contract_to_tensor().dense(order))
    np.testing.assert_allclose(b, a, atol=1e-10 * np.abs(a).max())


def test_set_tensor_invalidates_isometry_claims(key):
    """Replacing a tensor voids the edges where IT was the isometric
    side (code-review regression: the capi smart-canonicalization no-op
    fired on stale gauge state after set_tensor)."""
    import networkx as nx

    from tensor4all_tpu.treetn.network import random_treetn

    g = nx.path_graph(3)
    tn, _ = random_treetn(key, g, {n: [2] for n in g.nodes}, bond_dim=2)
    tn.canonicalize([1])
    assert set(tn.canonical_region()) == {1}
    tn.set_tensor(0, tn.tensor(0) * 2.0)
    region = tn.canonical_region()
    assert not region or 0 not in region and set(region) != {1} \
        or region is None
    # re-canonicalizing restores a verifiable gauge
    tn.canonicalize([1])
    tn.verify_canonical()
