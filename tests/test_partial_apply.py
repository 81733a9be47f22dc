"""Steiner-tree partial operator application (ref operator/apply.rs
partial apply; docs/book guide quantics.md 'Steiner Tree Partial
Apply'): an operator bound to a node subset that is NOT a connected
subtree gets its bonds routed through pass-through identity nodes.
"""

import jax
import networkx as nx
import numpy as np

from tensor4all_tpu.core.contract import contract
from tensor4all_tpu.core.index import Index
from tensor4all_tpu.core.tensor import Tensor
from tensor4all_tpu.mps.mps import MPS
from tensor4all_tpu.quantics import quantics_fourier_operator
from tensor4all_tpu.tt import TensorTrain
from tensor4all_tpu.treetn.network import random_treetn
from tensor4all_tpu.treetn.operator import (
    TreeOperator, mpo_to_treeoperator, route_gap_fill,
)


def test_partial_qft_on_interleaved_chain():
    """1-D QFT on the x-sites of an interleaved 2-variable QTT."""
    R, N = 4, 16
    xs = np.arange(N) / N
    vals = np.exp(-8 * (xs[:, None] - 0.5) ** 2) * np.cos(
        2 * np.pi * xs[None, :])
    # interleave bits: site order x0 t0 x1 t1 ...
    a = vals.reshape([2] * (2 * R)).transpose(
        [k // 2 if k % 2 == 0 else R + k // 2 for k in range(2 * R)])
    tt = TensorTrain.from_dense(a.astype(complex), tol=1e-13)
    mps = MPS.from_tt(tt)

    F = quantics_fourier_operator(R, sign=-1, tol=1e-13)
    x_nodes = [2 * k for k in range(R)]
    op = mpo_to_treeoperator(F, [mps.sites[i] for i in x_nodes],
                             nodes=x_nodes)
    out = op.apply(mps.tn, method="naive")

    want = np.fft.fft(vals, axis=0) / np.sqrt(N)

    def bitrev(k):
        return int(format(k, f"0{R}b")[::-1], 2)

    for k, tj in [(0, 0), (3, 5), (7, 12), (15, 15)]:
        kk = bitrev(k)
        assign = {}
        for j in range(R):
            assign[mps.sites[2 * j]] = (kk >> (R - 1 - j)) & 1
            assign[mps.sites[2 * j + 1]] = (tj >> (R - 1 - j)) & 1
        got = complex(out.evaluate(assign))
        assert abs(got - want[k, tj]) < 1e-10


def test_route_gap_fill_star_bond_fusion():
    """Two routed bonds share a state edge -> they fuse into one bond.

    State: star with center m and leaves a, b, c. Operator: a chain MPO
    on [a, c, b]; the paths a-m-c and c-m-b both cross edge (m, c).
    Verified against the dense matrix of the same chain operator.
    """
    g = nx.Graph()
    g.add_edges_from([("m", "a"), ("m", "b"), ("m", "c")])
    tn, sites = random_treetn(jax.random.PRNGKey(3), g,
                              {n: [2] for n in g.nodes}, bond_dim=2)

    rng = np.random.RandomState(0)
    cores = [rng.randn(1, 2, 2, 3), rng.randn(3, 2, 2, 3),
             rng.randn(3, 2, 2, 1)]
    from tensor4all_tpu.tt.mpo import MPO
    mpo = MPO(cores)
    op_nodes = ["a", "c", "b"]
    op = mpo_to_treeoperator(mpo, [sites[n][0] for n in op_nodes],
                             nodes=op_nodes)
    full = route_gap_fill(op, tn)
    out = full.apply(tn, method="naive")

    # dense oracle: operator matrix on (a, c, b) x identity on m
    Mop = np.asarray(mpo.to_dense_matrix())        # (8, 8) over (a,c,b)
    order = [sites[n][0] for n in ("a", "c", "b", "m")]
    dense = np.asarray(tn.contract_to_tensor().dense(order)).reshape(8, 2)
    want = (Mop @ dense).reshape(2, 2, 2, 2)
    got_t = out.contract_to_tensor()
    got = np.asarray(got_t.dense(order))
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_mpo_to_treeoperator_nodes_validation():
    from tensor4all_tpu.tt.mpo import MPO
    rng = np.random.RandomState(1)
    mpo = MPO([rng.randn(1, 2, 2, 2), rng.randn(2, 2, 2, 1)])
    s = [Index(2), Index(2)]
    try:
        mpo_to_treeoperator(mpo, s, nodes=[0])
        assert False, "expected ValueError"
    except ValueError:
        pass
