"""Linear operators (tree MPOs) on TreeTN states.

TPU-native rebuild of tensor4all-treetn/src/operator/
(linear_operator.rs:70 `LinearOperator`, apply.rs:300
`apply_linear_operator`, `ApplyOptions` :168-187): an operator is a TreeTN
on the same topology whose node tensors carry an (out, in) site pair —
out = in.prime() by convention — plus operator bonds on the edges.

Apply methods (ref ContractMethod): ``naive`` (exact, bond dims multiply),
``zipup`` (naive per-node contraction followed by an on-the-fly Euler-tour
truncation sweep), ``fit`` (variational — treetn.fit).
"""

from __future__ import annotations

from typing import Dict, Hashable, Optional, Tuple

import networkx as nx

from ..config import SvdTruncationPolicy
from ..core.contract import contract
from ..core.index import Index
from ..core.tensor import Tensor
from .network import TreeTN, NodeName, _edge_key


class TreeOperator:
    """Tree MPO: TreeTN whose nodes map in-site -> out-site indices.

    `site_in[v]` / `site_out[v]` give the unprimed input index and the
    primed output index at node v (ref IndexMapping, linear_operator.rs).
    """

    def __init__(
        self,
        network: TreeTN,
        site_in: Dict[NodeName, Index],
        site_out: Dict[NodeName, Index],
    ):
        self.network = network
        self.site_in = dict(site_in)
        self.site_out = dict(site_out)
        for v in network.node_names:
            t = network.tensor(v)
            if not (t.hasindex(self.site_in[v]) and t.hasindex(self.site_out[v])):
                raise ValueError(f"operator node {v!r} missing site pair")

    def tensor(self, v: NodeName) -> Tensor:
        return self.network.tensor(v)

    @property
    def node_names(self):
        return self.network.node_names

    def transpose(self) -> "TreeOperator":
        """Swap in/out roles (ref linear_operator.rs transpose)."""
        net = self.network.copy()
        s_in, s_out = {}, {}
        for v in net.node_names:
            i, o = self.site_in[v], self.site_out[v]
            # swapping the two identities on the tensor transposes the
            # local matrix while keeping the same external in/out indices
            net.set_tensor(v, net.tensor(v).replaceinds([i, o], [o, i]))
            s_in[v], s_out[v] = i, o
        return TreeOperator(net, s_in, s_out)

    def conj(self) -> "TreeOperator":
        net = self.network.copy()
        for v in net.node_names:
            net.set_tensor(v, net.tensor(v).conj())
        return TreeOperator(net, self.site_in, self.site_out)

    def scale(self, s) -> "TreeOperator":
        net = self.network.copy()
        v0 = net.node_names[0]
        net.set_tensor(v0, net.tensor(v0) * s)
        return TreeOperator(net, self.site_in, self.site_out)

    # ------------------------------------------------------------------
    def to_dense_matrix(self, order=None):
        """Dense matrix oracle: rows = out sites, cols = in sites."""
        t = self.network.contract_to_tensor()
        names = order or sorted(self.node_names, key=repr)
        outs = [self.site_out[v] for v in names]
        ins = [self.site_in[v] for v in names]
        tt, (ro, ci) = t.fuse_indices([outs, ins])
        return tt.dense((ro, ci))

    # ------------------------------------------------------------------
    def apply(
        self,
        state: TreeTN,
        method: str = "zipup",
        policy: Optional[SvdTruncationPolicy] = None,
    ) -> TreeTN:
        """Apply the operator to a state (ref apply_linear_operator :300).

        The state's site index at node v must equal ``site_in[v]``; the
        output state carries ``site_out[v]`` unprimed back to the input
        identity (so repeated application composes).
        """
        if set(state.node_names) != set(self.node_names):
            raise ValueError("apply: topology mismatch")
        out = TreeTN()
        fused_bond: Dict[Tuple, Index] = {}
        for v in state.node_names:
            x = state.tensor(v)
            w = self.tensor(v)
            if not x.hasindex(self.site_in[v]):
                raise ValueError(
                    f"state node {v!r} lacks operator input index "
                    f"{self.site_in[v]!r}"
                )
            y = contract([w, x])
            # fuse (op bond, state bond) per edge into one new bond,
            # consistently across both endpoints
            groups = []
            nbrs = list(state.neighbors(v))
            for nb in nbrs:
                ob = self.network.bond(v, nb)
                sb = state.bond(v, nb)
                groups.append([ob, sb])
            if groups:
                y, fresh = y.fuse_indices(groups)
                for nb, fi in zip(nbrs, fresh):
                    k = _edge_key(v, nb)
                    if k in fused_bond:
                        y = y.replaceind(fi, fused_bond[k])
                    else:
                        fused_bond[k] = fi
            # output site: unprime back to the input identity
            y = y.replaceind(self.site_out[v], self.site_in[v])
            out.add_node(v, y)
        for a, b in state.graph.edges:
            out.graph.add_edge(a, b, bond=fused_bond[_edge_key(a, b)])
        if method == "naive":
            return out
        if method == "zipup":
            out.truncate(policy)
            return out
        if method == "fit":
            from .fit import fit_apply

            return fit_apply(self, state, policy)
        raise ValueError(f"unknown apply method {method!r}")


def mpo_to_treeoperator(mpo, site_indices) -> TreeOperator:
    """Chain MPO (tt.MPO rank-4 cores) -> TreeOperator on nodes 0..L-1.

    `site_indices[k]` is the state's site Index at node k; the operator
    maps it to `site_indices[k].prime()`.
    """
    L = len(mpo)
    net = TreeTN()
    bonds = [Index(int(mpo.cores[k].shape[-1]), tags="OpLink")
             for k in range(L - 1)]
    s_in, s_out = {}, {}
    for k in range(L):
        W = mpo.cores[k]  # (l, out, in, r)
        s = site_indices[k]
        sp = s.prime()
        if L == 1:
            data, inds = W[0, :, :, 0], (sp, s)
        elif k == 0:
            data, inds = W[0], (sp, s, bonds[0])
        elif k == L - 1:
            data, inds = W[..., 0], (bonds[k - 1], sp, s)
        else:
            data, inds = W, (bonds[k - 1], sp, s, bonds[k])
        net.add_node(k, Tensor(inds, data))
        s_in[k], s_out[k] = s, sp
    for k in range(L - 1):
        net.connect(k, k + 1, bonds[k])
    return TreeOperator(net, s_in, s_out)
