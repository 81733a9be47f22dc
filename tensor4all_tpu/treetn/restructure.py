"""Topology restructuring: fuse, split, and site-index swaps.

TPU-native rebuild of tensor4all-treetn/src/restructure/
(mod.rs:1-2048 plan-first restructuring, transform.rs:1-998 `fuse_to`/
`split_to` with Steiner-tree regions, swap.rs:1-589 scheduled site swaps).
Operations mutate a copy and return it; numerics are single contractions
or factorizations per step.
"""

from __future__ import annotations

from typing import Optional, Sequence, Set, Tuple

import networkx as nx

from ..config import SvdTruncationPolicy
from ..core.contract import contract
from ..core.decomp import Canonical, FactorizeAlg, factorize, svd_two
from ..core.index import Index
from .network import TreeTN, NodeName


def steiner_nodes(tn: TreeTN, nodes: Sequence[NodeName]) -> Set[NodeName]:
    """Minimal connected subtree containing `nodes`
    (ref transform.rs:27 `steiner_tree_indices`; exact on trees)."""
    nodes = list(nodes)
    out: Set[NodeName] = set(nodes)
    for a, b in zip(nodes, nodes[1:]):
        out.update(nx.shortest_path(tn.graph, a, b))
    return out


def fuse_to(tn: TreeTN, nodes: Sequence[NodeName],
            new_name: Optional[NodeName] = None) -> TreeTN:
    """Contract the Steiner subtree of `nodes` into one node
    (ref fuse_to, transform.rs)."""
    out = tn.copy()
    region = steiner_nodes(out, nodes)
    if not region:
        raise ValueError("empty fuse region")
    name = new_name if new_name is not None else sorted(region, key=repr)[0]
    t = contract([out.tensor(v) for v in region], check_connected=False) \
        if len(region) > 1 else out.tensor(next(iter(region)))
    # external edges of the region
    ext = []
    for v in region:
        for nb in out.neighbors(v):
            if nb not in region:
                ext.append((nb, out.bond(v, nb)))
    g = out.graph
    for v in region:
        g.remove_node(v)
        del out._tensors[v]
    out.ortho_towards = {}
    out.add_node(name, t)
    for nb, bond in ext:
        g.add_edge(name, nb, bond=bond)
    return out


def split_node(
    tn: TreeTN,
    node: NodeName,
    left_indices: Sequence[Index],
    left_name: NodeName,
    right_name: NodeName,
    policy: Optional[SvdTruncationPolicy] = None,
    alg: FactorizeAlg = FactorizeAlg.SVD,
) -> TreeTN:
    """Factorize `node` into two connected nodes; `left_indices` (site
    and/or bond indices of the node) go to the left factor
    (ref split_to, transform.rs)."""
    out = tn.copy()
    t = out.tensor(node)
    left_indices = tuple(left_indices)
    for i in left_indices:
        if not t.hasindex(i):
            raise KeyError(f"{i!r} not on node {node!r}")
    L, R, _ = factorize(t, left_indices, alg=alg,
                        canonical=Canonical.LEFT, policy=policy)
    new_bond = L.indices[-1]
    nbrs = [(nb, out.bond(node, nb)) for nb in out.neighbors(node)]
    g = out.graph
    g.remove_node(node)
    del out._tensors[node]
    out.ortho_towards = {}
    out.add_node(left_name, L)
    out.add_node(right_name, R)
    g.add_edge(left_name, right_name, bond=new_bond)
    lset = set(left_indices)
    for nb, bond in nbrs:
        target = left_name if bond in lset else right_name
        g.add_edge(target, nb, bond=bond)
    return out


def swap_site_indices(
    tn: TreeTN,
    a: NodeName,
    b: NodeName,
    policy: Optional[SvdTruncationPolicy] = None,
) -> TreeTN:
    """Swap the site indices of two ADJACENT nodes (ref swap.rs): contract
    the pair and re-split with the groups exchanged. Long-range moves
    chain adjacent swaps (ref scheduled swap steps)."""
    out = tn.copy()
    if b not in out.neighbors(a):
        raise ValueError("swap requires adjacent nodes")
    bond = out.bond(a, b)
    sites_a = out.site_indices(a)
    sites_b = out.site_indices(b)
    theta = contract([out.tensor(a), out.tensor(b)])
    # new a-side: a's outer bonds + b's former sites
    a_side = tuple(i for i in out.tensor(a).indices
                   if i != bond and i not in sites_a) + sites_b
    L, R, _ = svd_two(theta, a_side, policy, canonical=Canonical.LEFT)
    out.set_tensor(a, L)
    out.set_tensor(b, R)
    out.set_bond(a, b, L.indices[-1])
    out.ortho_towards = {}
    return out
