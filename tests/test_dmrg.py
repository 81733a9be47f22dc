"""DMRG tests vs dense exact diagonalization (ref treetn/tests/dmrg.rs,
benchmarks/results/2026-06-27-treetn-dmrg-itensornetworks.md: chain N=8
chi=32 energy err ~5e-15)."""

import jax
import networkx as nx
import numpy as np
import pytest

from tensor4all_tpu.models.spin import (
    dense_heisenberg,
    dense_tfi,
    heisenberg,
    transverse_field_ising,
)
from tensor4all_tpu.treetn.dmrg import DmrgOptions, dmrg
from tensor4all_tpu.treetn.network import TreeTN, random_treetn
from tensor4all_tpu.treetn.projected import ProjectedOperator


def chain(n):
    g = nx.Graph()
    for i in range(n - 1):
        g.add_edge(i, i + 1)
    return g


def star3(arm):
    """3-arm star with `arm` nodes per arm + center ('star' benchmark)."""
    g = nx.Graph()
    c = "c"
    for a in range(3):
        prev = c
        for k in range(arm):
            node = (a, k)
            g.add_edge(prev, node)
            prev = node
    return g


def make_state(key, g, chi=8):
    dims = {n: [2] for n in g.nodes}
    tn, site_inds = random_treetn(key, g, dims, bond_dim=chi)
    sites = {n: site_inds[n][0] for n in g.nodes}
    return tn, sites


def test_operator_dense_matches_oracle(key):
    g = chain(4)
    tn, sites = make_state(key, g, chi=2)
    op = heisenberg(g, sites, J=1.0, h=0.3)
    order = list(g.nodes)
    dense = np.asarray(op.to_dense_matrix(order=order))
    oracle = dense_heisenberg(g, order, J=1.0, h=0.3)
    np.testing.assert_allclose(dense, oracle, atol=1e-12)


def test_operator_dense_tree_topology(key):
    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (1, 3), (3, 4)])
    tn, sites = make_state(key, g, chi=2)
    op = transverse_field_ising(g, sites, J=1.0, h=0.7)
    order = list(g.nodes)
    np.testing.assert_allclose(
        np.asarray(op.to_dense_matrix(order=order)),
        dense_tfi(g, order, J=1.0, h=0.7),
        atol=1e-12,
    )


def test_operator_apply_matches_dense(key):
    g = chain(4)
    tn, sites = make_state(key, g, chi=3)
    op = heisenberg(g, sites)
    out = op.apply(tn, method="naive")
    order = list(g.nodes)
    H = dense_heisenberg(g, order)
    vec = np.asarray(
        tn.contract_to_tensor().dense([sites[n] for n in order])
    ).reshape(-1)
    expect = (H @ vec).reshape([2] * 4)
    got = np.asarray(
        out.contract_to_tensor().dense([sites[n] for n in order])
    )
    np.testing.assert_allclose(got, expect, atol=1e-10)
    # zipup agrees
    out2 = op.apply(tn, method="zipup")
    got2 = np.asarray(
        out2.contract_to_tensor().dense([sites[n] for n in order])
    )
    np.testing.assert_allclose(got2, expect, atol=1e-8)


def test_projected_operator_full_region(key):
    """Projected onto the whole tree = plain operator application."""
    g = chain(3)
    tn, sites = make_state(key, g, chi=2)
    op = heisenberg(g, sites)
    proj = ProjectedOperator(op, tn)
    from tensor4all_tpu.core.contract import contract

    theta = contract([tn.tensor(n) for n in g.nodes])
    y = proj.apply_local(theta, list(g.nodes))
    order = list(g.nodes)
    H = dense_heisenberg(g, order)
    vec = np.asarray(theta.dense([sites[n] for n in order])).reshape(-1)
    np.testing.assert_allclose(
        np.asarray(y.dense([sites[n] for n in order])).reshape(-1),
        H @ vec,
        atol=1e-10,
    )


@pytest.mark.parametrize("topo_name", ["chain", "star"])
def test_dmrg_ground_state(key, topo_name):
    if topo_name == "chain":
        g = chain(8)
    else:
        g = star3(2)  # 7 nodes
    tn, sites = make_state(key, g, chi=8)
    op = heisenberg(g, sites)
    res = dmrg(op, tn, options=DmrgOptions(nsweeps=6, maxdim=32,
                                           cutoff=1e-12))
    order = list(g.nodes)
    H = dense_heisenberg(g, order)
    e0 = np.linalg.eigvalsh(H)[0]
    assert abs(res.energy - e0) < 1e-10, (res.energy, e0)
    # state energy via projected expectation equals reported energy
    assert res.energies[-1] == res.energy


def test_dmrg_tfi_chain(key):
    g = chain(6)
    tn, sites = make_state(key, g, chi=6)
    op = transverse_field_ising(g, sites, J=1.0, h=1.0)
    res = dmrg(op, tn, options=DmrgOptions(nsweeps=5, maxdim=16))
    H = dense_tfi(g, list(g.nodes), J=1.0, h=1.0)
    e0 = np.linalg.eigvalsh(H)[0]
    assert abs(res.energy - e0) < 1e-9
