"""Seeded randomized consistency sweeps against dense oracles.

The deterministic suites pin one configuration per feature; these fuzz
loops run many random shapes/topologies through the load-bearing
invariants (the reference's closed-form-oracle style, SURVEY §4.4,
with seeded RNG so failures reproduce)."""

import itertools

import jax
import networkx as nx
import numpy as np
import pytest

from tensor4all_tpu import Index, Tensor, contract
from tensor4all_tpu.config import SvdTruncationPolicy
from tensor4all_tpu.core.decomp import FactorizeAlg, factorize
from tensor4all_tpu.treetn.network import random_treetn
from tensor4all_tpu.tt.tensortrain import TensorTrain


def _random_tree(rng, n):
    """Random labelled tree on n nodes via a Prüfer-like growth."""
    g = nx.Graph()
    g.add_node(0)
    for v in range(1, n):
        g.add_edge(v, int(rng.integers(0, v)))
    return g


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_factorize_all_algs(seed):
    rng = np.random.default_rng(seed)
    dims = [int(rng.integers(2, 6)) for _ in range(4)]
    inds = tuple(Index(d) for d in dims)
    t = Tensor(inds, np.asarray(rng.standard_normal(dims)))
    n_left = int(rng.integers(1, 4))
    left = inds[:n_left]
    for alg in (FactorizeAlg.SVD, FactorizeAlg.QR, FactorizeAlg.LU,
                FactorizeAlg.CI):
        L, R, _ = factorize(t, left, alg=alg,
                            policy=SvdTruncationPolicy(tol=1e-13))
        recon = contract([L, R]).permute(inds)
        np.testing.assert_allclose(np.asarray(recon.data),
                                   np.asarray(t.data), atol=1e-9,
                                   err_msg=f"alg={alg} seed={seed}")


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_treetn_gauge_invariants(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(4, 9))
    g = _random_tree(rng, n)
    chi = int(rng.integers(2, 5))
    tn, si = random_treetn(jax.random.PRNGKey(seed), g,
                           {v: [2] for v in g.nodes}, bond_dim=chi)
    order = tuple(si[v][0] for v in sorted(g.nodes))
    dense0 = np.asarray(tn.contract_to_tensor().dense(order))
    center = sorted(g.nodes)[int(rng.integers(0, n))]
    form = [FactorizeAlg.QR, FactorizeAlg.LU,
            FactorizeAlg.CI][int(rng.integers(0, 3))]
    tn.canonicalize([center], form=form)
    np.testing.assert_allclose(
        np.asarray(tn.contract_to_tensor().dense(order)), dense0,
        atol=1e-9, err_msg=f"canonicalize {form} seed={seed}")
    assert set(tn.canonical_region()) == {center}
    tn.truncate(SvdTruncationPolicy(tol=1e-13))
    np.testing.assert_allclose(
        np.asarray(tn.contract_to_tensor().dense(order)), dense0,
        atol=1e-8, err_msg=f"truncate seed={seed}")
    # norm via gauge equals dense norm
    assert abs(float(tn.norm()) - np.linalg.norm(dense0)) < 1e-8


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_tt_compression_methods(seed):
    rng = np.random.default_rng(200 + seed)
    L = int(rng.integers(3, 7))
    dims = [int(rng.integers(2, 4)) for _ in range(L)]
    rank = int(rng.integers(2, 5))
    tt = TensorTrain.random(jax.random.PRNGKey(seed), dims, rank=rank)
    d = np.asarray(tt.full_tensor())
    for method in ("svd", "lu", "ci"):
        c = tt.compress(tol=1e-12, method=method)
        np.testing.assert_allclose(np.asarray(c.full_tensor()), d,
                                   atol=1e-8 * max(1.0, np.abs(d).max()),
                                   err_msg=f"{method} seed={seed}")
    # hadamard + add against dense
    other = TensorTrain.random(jax.random.PRNGKey(1000 + seed), dims,
                               rank=2)
    od = np.asarray(other.full_tensor())
    np.testing.assert_allclose(np.asarray((tt + other).full_tensor()),
                               d + od, atol=1e-10)
    np.testing.assert_allclose(np.asarray(tt.hadamard(other).full_tensor()),
                               d * od, atol=1e-10)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_contract_nary(seed):
    """n-ary contraction == pairwise numpy einsum on random connected
    networks."""
    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(3, 6))
    g = _random_tree(rng, n)
    # one shared index per edge + one free index per node
    bonds = {tuple(sorted(e)): Index(int(rng.integers(2, 5)))
             for e in g.edges}
    free = {v: Index(int(rng.integers(2, 4))) for v in g.nodes}
    tensors = []
    for v in g.nodes:
        inds = [free[v]] + [bonds[tuple(sorted((v, u)))]
                            for u in g.neighbors(v)]
        tensors.append(Tensor(tuple(inds), np.asarray(
            rng.standard_normal([i.dim for i in inds]))))
    out = contract(tensors)
    order = tuple(free[v] for v in sorted(g.nodes))
    got = np.asarray(out.dense(order))
    # numpy oracle via repeated tensordot in graph order
    import string

    labels = {}
    counter = itertools.count()
    def lab(ix):
        if ix not in labels:
            labels[ix] = string.ascii_letters[next(counter)]
        return labels[ix]

    expr = ",".join("".join(lab(i) for i in t.indices) for t in tensors)
    expr += "->" + "".join(lab(i) for i in order)
    want = np.einsum(expr, *[np.asarray(t.data) for t in tensors],
                     optimize=True)
    np.testing.assert_allclose(got, want, atol=1e-10,
                               err_msg=f"seed={seed}")
