"""TDVP tests vs dense expm oracle (ref treetn/tests/tdvp.rs; baseline
accuracy contract: L2 err ~1.4e-5 at dt=0.02 x 4, order 2, chain N=8)."""

import jax
import networkx as nx
import numpy as np
import pytest
from scipy.linalg import expm

from tensor4all_tpu.models.spin import dense_heisenberg, heisenberg
from tensor4all_tpu.treetn.network import random_treetn
from tensor4all_tpu.treetn.tdvp import TdvpOptions, tdvp


def chain(n):
    g = nx.Graph()
    for i in range(n - 1):
        g.add_edge(i, i + 1)
    return g


def star3(arm):
    g = nx.Graph()
    for a in range(3):
        prev = "c"
        for k in range(arm):
            g.add_edge(prev, (a, k))
            prev = (a, k)
    return g


def setup(key, g, chi):
    dims = {n: [2] for n in g.nodes}
    tn, site_inds = random_treetn(key, g, dims, bond_dim=chi)
    sites = {n: site_inds[n][0] for n in g.nodes}
    return tn, sites


def state_vec(tn, sites, order):
    return np.asarray(
        tn.contract_to_tensor().dense([sites[n] for n in order])
    ).reshape(-1)


@pytest.mark.parametrize("topo", ["chain", "star"])
def test_tdvp_real_time_order2(key, topo):
    # BASELINE.md config: dt=0.02 x 4 steps, order 2, chi=32
    g = chain(8) if topo == "chain" else star3(2)
    tn, sites = setup(key, g, chi=8)
    order = list(g.nodes)
    op = heisenberg(g, sites)
    H = dense_heisenberg(g, order)
    T = 0.08
    psi0 = state_vec(tn, sites, order)
    psi0 = psi0 / np.linalg.norm(psi0)
    tn.set_tensor(order[0], tn.tensor(order[0]) / float(tn.norm()))
    out = tdvp(op, tn, t=-1j * T,
               options=TdvpOptions(nsteps=4, order=2, maxdim=32,
                                   cutoff=1e-12))
    got = state_vec(out, sites, order)
    expect = expm(-1j * T * H) @ psi0
    err = np.linalg.norm(got - expect)
    # reference hits ~1.4e-5 on this config; allow same order
    assert err < 5e-5, err
    # norm preserved by unitary evolution
    assert abs(np.linalg.norm(got) - 1.0) < 1e-8


def test_tdvp_imaginary_time_lowers_energy(key):
    g = chain(6)
    tn, sites = setup(key, g, chi=8)
    order = list(g.nodes)
    op = heisenberg(g, sites)
    H = dense_heisenberg(g, order)

    def energy(t):
        v = state_vec(t, sites, order)
        return float(np.real(v @ H @ v) / (v @ v))

    e_init = energy(tn)
    out = tdvp(op, tn, t=-1.0,
               options=TdvpOptions(nsteps=5, order=2, maxdim=16,
                                   normalize=True))
    e_final = energy(out)
    assert e_final < e_init
    e0 = np.linalg.eigvalsh(H)[0]
    assert e_final - e0 < 0.7  # well on the way to the ground state


def test_tdvp_order1(key):
    g = chain(5)
    tn, sites = setup(key, g, chi=6)
    order = list(g.nodes)
    op = heisenberg(g, sites)
    H = dense_heisenberg(g, order)
    T = 0.05
    psi0 = state_vec(tn, sites, order)
    nrm = np.linalg.norm(psi0)
    psi0 = psi0 / nrm
    tn.set_tensor(order[0], tn.tensor(order[0]) / nrm)
    out = tdvp(op, tn, t=-1j * T,
               options=TdvpOptions(nsteps=4, order=1, maxdim=16))
    got = state_vec(out, sites, order)
    expect = expm(-1j * T * H) @ psi0
    assert np.linalg.norm(got - expect) < 5e-4


def test_tdvp_nsite1_matches_nsite2_fixed_rank(key):
    """nsite=1 TDVP matches nsite=2 on a problem whose rank never needs
    to grow (VERDICT r1 #6 done-criterion; ref tdvp/plan.rs:33-48)."""
    g = chain(6)
    tn, sites = setup(key, g, chi=16)  # chi=16 >= 2^3: exact manifold
    order_nodes = list(g.nodes)
    op = heisenberg(g, sites)
    H = dense_heisenberg(g, order_nodes)
    T = 0.06
    psi0 = state_vec(tn, sites, order_nodes)
    psi0 = psi0 / np.linalg.norm(psi0)
    tn.set_tensor(order_nodes[0], tn.tensor(order_nodes[0]) / float(tn.norm()))
    expect = expm(-1j * T * H) @ psi0
    out1 = tdvp(op, tn, t=-1j * T,
                options=TdvpOptions(nsteps=3, order=2, nsite=1))
    out2 = tdvp(op, tn, t=-1j * T,
                options=TdvpOptions(nsteps=3, order=2, nsite=2,
                                    maxdim=16, cutoff=1e-14))
    got1 = state_vec(out1, sites, order_nodes)
    got2 = state_vec(out2, sites, order_nodes)
    assert np.linalg.norm(got1 - expect) < 5e-5
    assert np.linalg.norm(got1 - got2) < 5e-5
    # nsite=1 preserves bond dims exactly (vs the canonicalized input:
    # the initial QR gauge legitimately trims rank-deficient padding)
    ref = tn.copy()
    # trim rank-deficient padding in both directions (pure gauge)
    ref.canonicalize([order_nodes[0]])
    ref.canonicalize([order_nodes[-1]])
    ref.canonicalize([order_nodes[0]])
    for a, b in out1.graph.edges:
        assert out1.bond(a, b).dim == ref.bond(a, b).dim


def test_tdvp_nsite1_star(key):
    g = star3(2)
    tn, sites = setup(key, g, chi=8)
    order_nodes = list(g.nodes)
    op = heisenberg(g, sites)
    H = dense_heisenberg(g, order_nodes)
    T = 0.05
    psi0 = state_vec(tn, sites, order_nodes)
    psi0 = psi0 / np.linalg.norm(psi0)
    tn.set_tensor(order_nodes[0], tn.tensor(order_nodes[0]) / float(tn.norm()))
    expect = expm(-1j * T * H) @ psi0
    out = tdvp(op, tn, t=-1j * T,
               options=TdvpOptions(nsteps=3, order=2, nsite=1))
    got = state_vec(out, sites, order_nodes)
    assert np.linalg.norm(got - expect) < 2e-3
    assert abs(np.linalg.norm(got) - 1.0) < 1e-8
