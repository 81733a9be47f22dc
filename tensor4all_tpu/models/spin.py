"""Spin Hamiltonians as tree MPOs, with dense oracles.

Plays the role of the reference benchmarks' Hamiltonian setup
(tensor4all-rs benchmarks/rust dmrg/tdvp bodies vs ITensorNetworks):
a generic compiler from nearest-neighbor couplings + on-site fields on an
arbitrary tree topology to a :class:`TreeOperator`, using the standard
finite-state-machine MPO construction generalized to trees (auxiliary
edge states: vacuum / operator-passing / done).
"""

from __future__ import annotations

from typing import Dict, Hashable, List, Optional, Sequence, Tuple

import networkx as nx
import numpy as np

from ..core.index import Index
from ..core.tensor import Tensor
from .. treetn.network import TreeTN, NodeName
from ..treetn.operator import TreeOperator

# spin-1/2 operators
SZ = np.array([[0.5, 0.0], [0.0, -0.5]])
SP = np.array([[0.0, 1.0], [0.0, 0.0]])
SM = SP.T.copy()
SX = np.array([[0.0, 0.5], [0.5, 0.0]])
ID2 = np.eye(2)
PAULI_X = 2 * SX
PAULI_Z = 2 * SZ


def tree_nn_operator(
    topology: nx.Graph,
    site_indices: Dict[NodeName, Index],
    pass_ops: Sequence[np.ndarray],
    complete_ops: Sequence[np.ndarray],
    onsite: Optional[Dict[NodeName, np.ndarray]] = None,
    dtype=np.float64,
) -> TreeOperator:
    """Compile ``sum_edges sum_k pass_k (x) complete_k + sum_v onsite_v``
    into a TreeOperator.

    For each edge, the child-side factor is ``pass_ops[k]`` and the
    parent-side factor ``complete_ops[k]`` (coefficients folded into
    complete_ops). Auxiliary edge basis: 0 = vacuum, 1..K = passing op k,
    K+1 = done.
    """
    nodes = list(topology.nodes)
    root = nodes[0]
    parent = dict(nx.bfs_predecessors(topology, root))
    K = len(pass_ops)
    chi = K + 2
    DONE = K + 1
    d = 2
    onsite = onsite or {}

    bond_idx: Dict[Tuple[NodeName, NodeName], Index] = {}
    for a, b in topology.edges:
        bond_idx[(a, b)] = bond_idx[(b, a)] = Index(chi, tags="OpLink")

    net = TreeTN()
    s_in, s_out = {}, {}
    for v in nodes:
        s = site_indices[v]
        sp = s.prime()
        kids = [c for c, p in parent.items() if p == v]
        has_parent = v in parent
        shape = [chi] * len(kids) + [d, d] + ([chi] if has_parent else [])
        W = np.zeros(shape, dtype=dtype)
        site_term = onsite.get(v)

        def set_entry(child_states, op, pstate):
            idx = tuple(child_states) + (slice(None), slice(None))
            if has_parent:
                idx = idx + (pstate,)
            W[idx] += op

        nkids = len(kids)
        vac = tuple([0] * nkids)
        p_states = [DONE] if not has_parent else None

        def parent_states_for(emit):
            # emit: 'vac' | int k (passing) | 'done'
            if not has_parent:
                # root has an implicit parent fixed to DONE; only 'done'
                # emissions survive
                return [None] if emit == "done" else []
            if emit == "vac":
                return ["VAC"]
            if emit == "done":
                return ["DONE"]
            return [emit]

        # 1. nothing happening: all children vac, emit vac upward
        if has_parent:
            set_entry(vac, ID2, 0)
        # 2. start a pair crossing the parent edge: emit passing k
        if has_parent:
            for k in range(K):
                set_entry(vac, np.asarray(pass_ops[k], dtype=dtype), 1 + k)
        # 3. on-site term: emit done
        if site_term is not None:
            if has_parent:
                set_entry(vac, np.asarray(site_term, dtype=dtype), DONE)
            else:
                set_entry(vac, np.asarray(site_term, dtype=dtype), None)
        # 4. complete a pair with one child passing k
        for ci in range(nkids):
            for k in range(K):
                cs = [0] * nkids
                cs[ci] = 1 + k
                op = np.asarray(complete_ops[k], dtype=dtype)
                if has_parent:
                    set_entry(tuple(cs), op, DONE)
                else:
                    set_entry(tuple(cs), op, None)
        # 5. relay a completed sum from one child
        for ci in range(nkids):
            cs = [0] * nkids
            cs[ci] = DONE
            if has_parent:
                set_entry(tuple(cs), ID2, DONE)
            else:
                set_entry(tuple(cs), ID2, None)

        inds = tuple(bond_idx[(c, v)] for c in kids) + (sp, s) + (
            (bond_idx[(v, parent[v])],) if has_parent else ()
        )
        net.add_node(v, Tensor(inds, W))
        s_in[v], s_out[v] = s, sp
    for a, b in topology.edges:
        net.connect(a, b, bond_idx[(a, b)])
    return TreeOperator(net, s_in, s_out)


def heisenberg(
    topology: nx.Graph,
    site_indices: Dict[NodeName, Index],
    J: float = 1.0,
    h: float = 0.0,
) -> TreeOperator:
    """Heisenberg: ``J sum_e (SzSz + (S+S- + S-S+)/2) + h sum_v Sz``."""
    onsite = {v: h * SZ for v in topology.nodes} if h else None
    return tree_nn_operator(
        topology,
        site_indices,
        pass_ops=[SZ, SP, SM],
        complete_ops=[J * SZ, (J / 2) * SM, (J / 2) * SP],
        onsite=onsite,
    )


def transverse_field_ising(
    topology: nx.Graph,
    site_indices: Dict[NodeName, Index],
    J: float = 1.0,
    h: float = 1.0,
) -> TreeOperator:
    """TFI: ``-J sum_e Z Z - h sum_v X`` (Pauli convention)."""
    return tree_nn_operator(
        topology,
        site_indices,
        pass_ops=[PAULI_Z],
        complete_ops=[-J * PAULI_Z],
        onsite={v: -h * PAULI_X for v in topology.nodes},
    )


def dense_nn_hamiltonian(
    topology: nx.Graph,
    order: Sequence[NodeName],
    pass_ops: Sequence[np.ndarray],
    complete_ops: Sequence[np.ndarray],
    onsite: Optional[Dict[NodeName, np.ndarray]] = None,
) -> np.ndarray:
    """Dense oracle: the same Hamiltonian as a 2^N x 2^N matrix."""
    order = list(order)
    pos = {v: i for i, v in enumerate(order)}
    N = len(order)
    H = np.zeros((2**N, 2**N))
    onsite = onsite or {}

    def kron_at(ops: Dict[int, np.ndarray]) -> np.ndarray:
        out = np.array([[1.0]])
        for i in range(N):
            out = np.kron(out, ops.get(i, ID2))
        return out

    for a, b in topology.edges:
        for po, co in zip(pass_ops, complete_ops):
            H += kron_at({pos[a]: np.asarray(po), pos[b]: np.asarray(co)})
    for v, op in onsite.items():
        H += kron_at({pos[v]: np.asarray(op)})
    return H


def dense_heisenberg(topology, order, J=1.0, h=0.0):
    onsite = {v: h * SZ for v in topology.nodes} if h else None
    return dense_nn_hamiltonian(
        topology, order, [SZ, SP, SM], [J * SZ, (J / 2) * SM, (J / 2) * SP],
        onsite,
    )


def dense_tfi(topology, order, J=1.0, h=1.0):
    return dense_nn_hamiltonian(
        topology, order, [PAULI_Z], [-J * PAULI_Z],
        {v: -h * PAULI_X for v in topology.nodes},
    )
