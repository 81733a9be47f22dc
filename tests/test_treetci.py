"""TreeTCI tests (ref treetci tests/simple_parity.rs style oracles)."""

import networkx as nx
import numpy as np
import pytest

from tensor4all_tpu.tci.treetci import TreeTciOptions, tree_crossinterpolate2


def full_check(tci, batch_f, dims, n=400, seed=0):
    rng = np.random.default_rng(seed)
    idx = np.stack([rng.integers(0, d, size=n) for d in dims], axis=1)
    got = tci.evaluate_batch(idx)
    expect = batch_f(idx)
    return np.abs(got - expect).max() / np.abs(expect).max()


def test_treetci_chain_matches_linear():
    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (2, 3)])
    dims = [3, 3, 3, 3]

    def batch_f(idx):
        return np.exp(-0.3 * (idx ** 2).sum(axis=1)) + 0.1 * idx[:, 0]

    tci = tree_crossinterpolate2(batch_f, g, dims,
                                 node_order=[0, 1, 2, 3],
                                 options=TreeTciOptions(tol=1e-10))
    assert full_check(tci, batch_f, dims) < 1e-8


def test_treetci_star():
    g = nx.Graph()
    g.add_edges_from([(0, 1), (0, 2), (0, 3)])
    dims = [4, 4, 4, 4]
    w = np.array([0.7, -0.4, 0.9, 0.3])

    def batch_f(idx):
        return np.cos((idx * w[None, :]).sum(axis=1)) + 2.0

    tci = tree_crossinterpolate2(batch_f, g, dims,
                                 node_order=[0, 1, 2, 3],
                                 options=TreeTciOptions(tol=1e-10,
                                                        max_iter=12))
    assert full_check(tci, batch_f, dims) < 1e-7


def test_treetci_deeper_tree():
    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (1, 3), (3, 4), (3, 5)])
    dims = [2, 2, 2, 2, 2, 2]
    rng = np.random.default_rng(3)
    # random low-rank-ish tensor: sum of 3 product terms
    factors = [rng.standard_normal((3, 2)) + 1.5 for _ in range(6)]

    def batch_f(idx):
        acc = np.zeros(idx.shape[0])
        for r in range(3):
            term = np.ones(idx.shape[0])
            for k in range(6):
                term = term * factors[k][r, idx[:, k]]
            acc += term
        return acc

    tci = tree_crossinterpolate2(batch_f, g, dims,
                                 node_order=list(range(6)),
                                 options=TreeTciOptions(tol=1e-11,
                                                        max_iter=10))
    assert full_check(tci, batch_f, dims) < 1e-8
    assert max(r for r in tci.ranks().values()) <= 3


def test_treetci_rejects_cycle():
    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (2, 0)])

    def batch_f(idx):
        return idx.sum(axis=1).astype(float)

    with pytest.raises(ValueError):
        tree_crossinterpolate2(batch_f, g, [2, 2, 2],
                               node_order=[0, 1, 2])
