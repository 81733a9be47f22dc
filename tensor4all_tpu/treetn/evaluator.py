"""Evaluators: single-point and device-batched TreeTN evaluation.

TPU-native rebuild of tensor4all-treetn/src/evaluator.rs (TreeTNEvaluator)
and cached_evaluator.rs:1-1866 (TreeTNCachedEvaluator — batch evaluation
with environment caching). Where the reference caches per-assignment
environment tensors host-side, the TPU-native design vectorizes the whole
batch on device: each node's tensor is gathered at the batch's site values
and messages flow leaf-to-root as batched contractions (MXU matmuls) — a
single jitted program per (topology, shapes) signature.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np

from ..core.index import Index
from .network import TreeTN, NodeName


class TreeTNEvaluator:
    """Batched evaluator over a fixed TreeTN."""

    def __init__(self, tn: TreeTN, site_order: Sequence[Index]):
        tn.validate_tree()
        self.tn = tn
        self.site_order = list(site_order)
        # map site index -> (node, axis); precompute a postorder schedule
        owner: Dict[Index, NodeName] = {}
        for v in tn.node_names:
            for s in tn.site_indices(v):
                owner[s] = v
        for s in self.site_order:
            if s not in owner:
                raise KeyError(f"site index {s!r} not in network")
        self.owner = owner
        root = tn.node_names[0]
        self.root = root
        self.parent = dict(nx.dfs_predecessors(tn.graph, root))
        self.order = list(nx.dfs_postorder_nodes(tn.graph, root))
        # per node: (array, axes meta) with axes arranged as
        # (sites in site_order slice..., child bonds..., parent bond?)
        self._plan = []
        for v in self.order:
            t = tn.tensor(v)
            sites = [s for s in self.site_order if owner[s] == v]
            kids = [c for c, p in self.parent.items() if p == v]
            kid_bonds = [tn.bond(v, c) for c in kids]
            par_bond = [tn.bond(v, self.parent[v])] if v in self.parent else []
            t = t.permute(tuple(sites) + tuple(kid_bonds) + tuple(par_bond))
            self._plan.append(
                (v, t.data, len(sites),
                 [self.site_order.index(s) for s in sites], kids,
                 v in self.parent)
            )
        self._eval_jit = jax.jit(self._eval_impl)

    def _eval_impl(self, arrays: Tuple[jnp.ndarray, ...], idx: jnp.ndarray):
        B = idx.shape[0]
        msgs: Dict[NodeName, jnp.ndarray] = {}
        for (v, _, n_sites, site_pos, kids, has_parent), arr in zip(
            self._plan, arrays
        ):
            if n_sites:
                # advanced indexing over the leading site axes -> (B, bonds...)
                cur = arr[tuple(idx[:, sp] for sp in site_pos)]
            else:
                cur = jnp.broadcast_to(arr, (B,) + arr.shape)
            # contract child messages (B, chi_c) over the leading bond axes
            for c in kids:
                m = msgs.pop(c)
                cur = jnp.einsum("bc,bc...->b...", m, cur)
            msgs[v] = cur if has_parent else cur.reshape(B)
        return msgs[self.root]

    def evaluate_batch(self, idx) -> np.ndarray:
        idx = jnp.asarray(np.asarray(idx, dtype=np.int32))
        arrays = tuple(p[1] for p in self._plan)
        return np.asarray(self._eval_jit(arrays, idx))

    def evaluate(self, assignment: Dict[Index, int]):
        idx = np.asarray([[assignment[s] for s in self.site_order]])
        return self.evaluate_batch(idx)[0]
