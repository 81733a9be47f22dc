"""Python-side helpers for the C ABI shim (capi.cpp).

Keeps the C++ code free of keyword-argument plumbing: these functions take
only positional, C-friendly arguments.
"""

from __future__ import annotations

import numpy as np

from ..config import SvdTruncationPolicy
from ..core.decomp import svd
from ..tci.tensorci2 import TCI2Options, crossinterpolate2


def svd_first_n(tensor, n_left: int, rtol: float, maxdim: int):
    """SVD over the first n_left indices (C API t4a_tensor_svd)."""
    left = tensor.indices[:n_left]
    pol = SvdTruncationPolicy(tol=rtol,
                              maxdim=maxdim if maxdim > 0 else None)
    U, S, Vh, _ = svd(tensor, left, policy=pol)
    return U, S, Vh


def svd_with_policy(tensor, n_left: int, threshold: float, scale: int,
                    measure: int, rule: int, maxdim: int):
    """SVD with the full typed truncation policy
    (C API t4a_tensor_svd_with_policy)."""
    left = tensor.indices[:n_left]
    pol = policy_from_abi(threshold, scale, measure, rule, maxdim)
    U, S, Vh, _ = svd(tensor, left, policy=pol)
    return U, S, Vh


def crossinterpolate2_c(batch_f, local_dims, tol: float, maxdim: int,
                        max_iter: int):
    """TCI2 driven by a C callback (C API t4a_crossinterpolate2)."""

    def wrapped(idx: np.ndarray) -> np.ndarray:
        return np.asarray(batch_f(np.ascontiguousarray(idx,
                                                       dtype=np.int64)))

    opts = TCI2Options(
        tol=tol,
        maxbonddim=maxdim if maxdim > 0 else None,
        max_iter=int(max_iter),
    )
    tci, _, _ = crossinterpolate2(batch_f=wrapped,
                                  local_dims=list(local_dims),
                                  options=opts)
    return tci.to_tensortrain()


# ----------------------------------------------------------------------
# TreeTN surface (C API t4a_treetn_*, ref capi/src/treetn.rs:1-2052)
# ----------------------------------------------------------------------
class CTreeTN:
    """Host-side TreeTN handle: tensors are accumulated by vertex name
    and auto-connected by shared index identity on first use (ref
    TreeTN::from_tensors)."""

    def __init__(self):
        self._tensors = {}
        self._net = None

    def set_tensor(self, name: str, tensor) -> None:
        if self._net is not None:
            if name in self._net.node_names:
                self._net.set_tensor(name, tensor)
                self._tensors[name] = tensor
                return
            # adding a vertex invalidates the built topology
            self._tensors = {v: self._net.tensor(v)
                             for v in self._net.node_names}
            self._net = None
        self._tensors[name] = tensor

    def net(self):
        from ..treetn.network import TreeTN

        if self._net is None:
            if not self._tensors:
                raise ValueError("TreeTN has no tensors")
            self._net = TreeTN.from_tensors(dict(self._tensors))
        return self._net

    def clone(self) -> "CTreeTN":
        out = CTreeTN()
        if self._net is not None:
            out._net = self._net.copy()
            out._tensors = {v: out._net.tensor(v)
                            for v in out._net.node_names}
        else:
            out._tensors = dict(self._tensors)
        return out


def treetn_new() -> CTreeTN:
    return CTreeTN()


def treetn_set_tensor(h: CTreeTN, name: str, tensor) -> None:
    h.set_tensor(name, tensor)


def treetn_tensor(h: CTreeTN, name: str):
    return h.net().tensor(name)


def treetn_num_vertices(h: CTreeTN) -> int:
    return (len(h._tensors) if h._net is None
            else h.net().graph.number_of_nodes())


def treetn_node_names(h: CTreeTN):
    return "\n".join(str(v) for v in (
        h._tensors.keys() if h._net is None else h.net().node_names))


def treetn_neighbors(h: CTreeTN, name: str) -> str:
    return "\n".join(str(v) for v in h.net().neighbors(name))


def treetn_siteinds(h: CTreeTN, name: str):
    return list(h.net().site_indices(name))


def treetn_linkind(h: CTreeTN, a: str, b: str):
    return h.net().bond(a, b)


def treetn_orthogonalize(h: CTreeTN, center: str) -> None:
    h.net().canonicalize([center])


def treetn_truncate(h: CTreeTN, rtol: float, maxdim: int) -> None:
    pol = SvdTruncationPolicy(tol=rtol,
                              maxdim=maxdim if maxdim > 0 else None)
    h.net().truncate(pol)


def policy_from_abi(threshold: float, scale: int, measure: int,
                    rule: int, maxdim: int = 0) -> SvdTruncationPolicy:
    """Decode the C ABI's t4a_svd_truncation_policy (ref capi
    options.rs): scale 0=Relative 1=Absolute; rule 0=PerValue
    1=DiscardedTailSum; measure 0=Value 1=SquaredValue. Our policy
    folds (measure, rule) into one SingularValueMeasure, supporting the
    two combinations the reference's own drivers construct:
    Value+PerValue (per-|s| cutoff) and SquaredValue+DiscardedTailSum
    (ITensors-style squared-tail cutoff). The cross combinations have
    no equivalent here and are rejected (T4A_INVALID semantics) rather
    than silently remapped."""
    from ..config import SingularValueMeasure, ThresholdScale

    sc = ThresholdScale.ABSOLUTE if scale == 1 else ThresholdScale.RELATIVE
    if (measure, rule) == (0, 0):
        ms = SingularValueMeasure.VALUE
    elif (measure, rule) == (1, 1):
        ms = SingularValueMeasure.SQUARED_TAIL
    else:
        raise ValueError(
            f"unsupported (measure={measure}, rule={rule}) combination: "
            "use Value+PerValue or SquaredValue+DiscardedTailSum")
    return SvdTruncationPolicy(tol=threshold, scale=sc, measure=ms,
                               maxdim=maxdim if maxdim > 0 else None)


def treetn_truncate_with_policy(h: CTreeTN, threshold: float, scale: int,
                                measure: int, rule: int,
                                maxdim: int) -> None:
    h.net().truncate(policy_from_abi(threshold, scale, measure, rule,
                                     maxdim))


_CANONICAL_FORMS = {0: "qr", 1: "lu", 2: "ci"}  # ref t4a_canonical_form


def treetn_orthogonalize_form(h: CTreeTN, center: str, form: int,
                              force: int) -> None:
    """Ref t4a_treetn_orthogonalize(vertex, form, force): smart
    canonicalization — a repeated call with the same center/form is a
    no-op; changing form without `force` is an error. The current form
    is tracked by TreeTN.canonical_form (set by every canonicalize,
    whichever path calls it), so the check never goes stale."""
    from ..core.decomp import FactorizeAlg

    if form not in _CANONICAL_FORMS:
        raise ValueError(f"unknown canonical form {form}")
    alg = FactorizeAlg(_CANONICAL_FORMS[form])
    net = h.net()
    prev = net.canonical_form
    # Ref treetn/canonicalize.rs:70-82 (capi treetn.rs:1104-1107): ANY
    # form change without force is an error, regardless of whether the
    # center also moves.
    if prev is not None and prev is not alg and not force:
        raise ValueError(
            "network already canonicalized with a different form; "
            "pass force to re-canonicalize")
    region = net.canonical_region()
    if (region and set(region) == {_node_key(net, center)}
            and prev is alg):
        return  # already canonical at this center with this form
    net.canonicalize([_node_key(net, center)], form=alg)


def _node_key(net, name: str):
    for n in net.graph.nodes:
        if str(n) == name:
            return n
    raise KeyError(f"no node named {name!r}")


def treetn_sim_linkinds(h: CTreeTN) -> CTreeTN:
    out = CTreeTN()
    out._net = h.net().sim_linkinds()
    return out


_CONTRACT_METHODS = {0: "zipup", 1: "fit", 2: "naive"}


def treetn_contract_networks(a: CTreeTN, b: CTreeTN, method: int,
                             threshold: float, scale: int, measure: int,
                             rule: int, maxdim: int) -> "CTreeTN":
    """Ref t4a_treetn_contract(a, b, method, policy, maxdim, ...)."""
    from ..treetn.contraction import contract_networks

    if method not in _CONTRACT_METHODS:
        raise ValueError(f"unknown contract method {method}")
    pol = policy_from_abi(threshold, scale, measure, rule, maxdim)
    res = contract_networks(a.net(), b.net(),
                            method=_CONTRACT_METHODS[method],
                            policy=pol,
                            max_rank=maxdim if maxdim > 0 else None)
    out = CTreeTN()
    out._net = res
    return out


def treetn_canonical_region(h: CTreeTN) -> str:
    region = h.net().canonical_region()
    return "\n".join(str(v) for v in sorted(region, key=repr)) \
        if region else ""


def treetn_contract(h: CTreeTN):
    return h.net().contract_to_tensor()


def treetn_inner(h: CTreeTN, other: CTreeTN):
    return complex(h.net().inner(other.net()))


def treetn_norm(h: CTreeTN) -> float:
    return float(h.net().norm())


def treetn_scale(h: CTreeTN, re: float, im: float) -> None:
    net = h.net()
    v0 = net.node_names[0]
    s = re if im == 0.0 else complex(re, im)
    net.set_tensor(v0, net.tensor(v0) * s)


def treetn_add(a: CTreeTN, b: CTreeTN) -> CTreeTN:
    out = CTreeTN()
    out._net = a.net().add(b.net())
    return out


def treetn_evaluate(h: CTreeTN, indices, values) -> complex:
    assignment = {idx: int(v) for idx, v in zip(indices, values)}
    return complex(h.net().evaluate(assignment))


def treetn_fuse_to(h: CTreeTN, names) -> CTreeTN:
    from ..treetn.restructure import fuse_to

    out = CTreeTN()
    out._net = fuse_to(h.net(), list(names))
    return out


def treetn_split_to(h: CTreeTN, node: str, left_indices, left_name: str,
                    right_name: str, rtol: float, maxdim: int) -> CTreeTN:
    from ..treetn.restructure import split_node

    pol = SvdTruncationPolicy(tol=rtol,
                              maxdim=maxdim if maxdim > 0 else None)
    out = CTreeTN()
    out._net = split_node(h.net(), node, list(left_indices), left_name,
                          right_name, policy=pol)
    return out


def treetn_swap_site_indices(h: CTreeTN, a: str, b: str, rtol: float,
                             maxdim: int) -> CTreeTN:
    from ..treetn.restructure import swap_site_indices

    pol = SvdTruncationPolicy(tol=rtol,
                              maxdim=maxdim if maxdim > 0 else None)
    out = CTreeTN()
    out._net = swap_site_indices(h.net(), a, b, policy=pol)
    return out


def treetn_apply_operator_chain(h: CTreeTN, mpo_tt, order, rtol: float,
                                maxdim: int) -> CTreeTN:
    """Apply a chain MPO (TT handle whose cores are (l, 2*2... fused) or
    a tt with site dims out*in) to the state along `order` (vertex
    names). Cores are unfused as square (d, d) operator pairs."""
    from ..treetn.operator import TreeOperator, mpo_to_treeoperator
    from ..tt.mpo import MPO

    net = h.net()
    names = list(order)
    sites = []
    for v in names:
        si = net.site_indices(v)
        if len(si) != 1:
            raise ValueError(f"vertex {v!r} must carry exactly one site")
        sites.append(si[0])
    cores = []
    for k, c in enumerate(mpo_tt.cores):
        arr = np.asarray(c)
        l, d2, r = arr.shape
        d = sites[k].dim
        if d * d != d2:
            raise ValueError("MPO site dim mismatch")
        cores.append(arr.reshape(l, d, d, r))
    out = CTreeTN()
    pol = SvdTruncationPolicy(tol=rtol,
                              maxdim=maxdim if maxdim > 0 else None)
    out._net = _apply_chain(net, names, cores, sites, pol)
    return out


def _apply_chain(net, names, cores, sites, pol):
    from ..core.index import Index
    from ..core.tensor import Tensor
    from ..treetn.network import TreeTN
    from ..treetn.operator import TreeOperator

    opnet = TreeTN()
    bonds = [Index(int(cores[k].shape[-1]), tags="OpLink")
             for k in range(len(names) - 1)]
    s_in, s_out = {}, {}
    for k, v in enumerate(names):
        W = cores[k]
        s = sites[k]
        sp = s.prime()
        if len(names) == 1:
            data, inds = W[0, :, :, 0], (sp, s)
        elif k == 0:
            data, inds = W[0], (sp, s, bonds[0])
        elif k == len(names) - 1:
            data, inds = W[..., 0], (bonds[k - 1], sp, s)
        else:
            data, inds = W, (bonds[k - 1], sp, s, bonds[k])
        opnet.add_node(v, Tensor(inds, data))
        s_in[v], s_out[v] = s, sp
    for k in range(len(names) - 1):
        opnet.connect(names[k], names[k + 1], bonds[k])
    op = TreeOperator(opnet, s_in, s_out)
    return op.apply(net, method="zipup", policy=pol)


def treetn_evaluator_new(h: CTreeTN, site_order):
    from ..treetn.evaluator import TreeTNEvaluator

    return TreeTNEvaluator(h.net(), list(site_order))


def treetn_evaluator_evaluate(ev, idx_matrix):
    import numpy as _np

    idx = _np.asarray(idx_matrix, dtype=_np.int64)
    return _np.asarray(ev.evaluate_batch(idx), dtype=_np.float64)


def treetn_linsolve(b: CTreeTN, mpo_tt, order, a0_re, a0_im, a1_re,
                    a1_im, rtol, maxdim, nsweeps) -> CTreeTN:
    """Solve (a0 + a1*A) x = b with A a chain MPO over `order`."""
    from ..treetn.linsolve import LinsolveOptions, square_linsolve
    from ..tt.mpo import MPO

    net = b.net()
    names = list(order)
    sites = [net.site_indices(v)[0] for v in names]
    cores = []
    for k, c in enumerate(mpo_tt.cores):
        arr = np.asarray(c)
        l, d2, r = arr.shape
        d = sites[k].dim
        cores.append(arr.reshape(l, d, d, r))
    from ..core.index import Index
    from ..core.tensor import Tensor
    from ..treetn.network import TreeTN
    from ..treetn.operator import TreeOperator

    opnet = TreeTN()
    bonds = [Index(int(cores[k].shape[-1]), tags="OpLink")
             for k in range(len(names) - 1)]
    s_in, s_out = {}, {}
    for k, v in enumerate(names):
        W = cores[k]
        s = sites[k]
        sp = s.prime()
        if len(names) == 1:
            data, inds = W[0, :, :, 0], (sp, s)
        elif k == 0:
            data, inds = W[0], (sp, s, bonds[0])
        elif k == len(names) - 1:
            data, inds = W[..., 0], (bonds[k - 1], sp, s)
        else:
            data, inds = W, (bonds[k - 1], sp, s, bonds[k])
        opnet.add_node(v, Tensor(inds, data))
        s_in[v], s_out[v] = s, sp
    for k in range(len(names) - 1):
        opnet.connect(names[k], names[k + 1], bonds[k])
    op = TreeOperator(opnet, s_in, s_out)
    a0 = a0_re if a0_im == 0 else complex(a0_re, a0_im)
    a1 = a1_re if a1_im == 0 else complex(a1_re, a1_im)
    opts = LinsolveOptions(nsweeps=int(nsweeps),
                           maxdim=maxdim if maxdim > 0 else 64,
                           cutoff=rtol, a0=a0, a1=a1)
    res = square_linsolve(op, net, net.copy(), options=opts)
    out = CTreeTN()
    out._net = res.x
    return out


def treetn_to_dense(h: CTreeTN, indices):
    t = h.net().contract_to_tensor()
    arr = np.asarray(t.dense(tuple(indices)))
    if np.iscomplexobj(arr):
        # The f64 ABI entry point must not silently drop imaginary parts
        # (use the c64 copy functions for genuinely complex networks).
        if np.abs(arr.imag).max() > 1e-10 * max(1.0, np.abs(arr).max()):
            raise ValueError(
                "network is complex-valued; use the c64 dense accessor")
        arr = arr.real
    return np.asarray(arr, dtype=np.float64)


def treetn_partial_contract(a: CTreeTN, b: CTreeTN, pairs_a, pairs_b,
                            diag_a, diag_b) -> CTreeTN:
    from ..treetn.contraction import (
        PartialContractionSpec,
        partial_contract,
    )

    spec = PartialContractionSpec(
        contract_pairs=list(zip(pairs_a, pairs_b)),
        diagonal_pairs=list(zip(diag_a, diag_b)),
    )
    out = CTreeTN()
    out._net = partial_contract(a.net(), b.net(), spec)
    return out


# ----------------------------------------------------------------------
# QTT layouts + transform materializers (ref capi quanticstransform.rs)
# ----------------------------------------------------------------------
class QttLayout:
    """Descriptor: R bits x d dims, interleaved or fused unfolding."""

    def __init__(self, R: int, d: int, unfolding: str):
        if unfolding not in ("interleaved", "fused"):
            raise ValueError("unfolding must be interleaved|fused")
        self.R = int(R)
        self.d = int(d)
        self.unfolding = unfolding

    def clone(self):
        return QttLayout(self.R, self.d, self.unfolding)


def qtt_layout_new(R: int, d: int, unfolding: str) -> QttLayout:
    return QttLayout(R, d, unfolding)


def _mpo_to_tt(mpo):
    """Fuse MPO cores (l, out, in, r) -> TT cores (l, out*in, r)."""
    from ..tt.tensortrain import TensorTrain

    cores = []
    for c in mpo.cores:
        arr = np.asarray(c)
        l, o, i, r = arr.shape
        cores.append(arr.reshape(l, o * i, r))
    return TensorTrain(cores)


def qtransform_flip(R: int):
    from ..quantics.transforms import flip_operator

    return _mpo_to_tt(flip_operator(R))


def qtransform_shift(R: int, shift: int, bc: str):
    from ..quantics.transforms import shift_operator

    return _mpo_to_tt(shift_operator(R, int(shift), bc))


def qtransform_phase_rotation(R: int, theta: float):
    from ..quantics.transforms import phase_rotation_operator

    return _mpo_to_tt(phase_rotation_operator(R, theta))


def qtransform_cumsum(R: int):
    from ..quantics.transforms import cumsum_operator

    return _mpo_to_tt(cumsum_operator(R))


def qtransform_fourier(R: int, sign: int, rtol: float, maxdim: int):
    from ..quantics.transforms import quantics_fourier_operator

    return _mpo_to_tt(quantics_fourier_operator(
        R, sign=int(sign), tol=rtol,
        maxdim=maxdim if maxdim > 0 else 12))


def qtransform_affine(R: int, a_num: int, a_den: int, b_num: int,
                      b_den: int, bc: str):
    from fractions import Fraction

    from ..quantics.transforms import affine_operator

    return _mpo_to_tt(affine_operator(
        R, Fraction(int(a_num), int(a_den)),
        Fraction(int(b_num), int(b_den)), bc))


# ----------------------------------------------------------------------
# misc tensor helpers
# ----------------------------------------------------------------------
def tensor_qr(tensor, n_left: int):
    from ..core.decomp import qr

    Q, Rf = qr(tensor, tensor.indices[:n_left])
    return Q, Rf


def tensor_select(tensor, index, value: int):
    return tensor.select(index, int(value))


def tensor_conj(tensor):
    return tensor.conj()


def tensor_add(a, b):
    return a + b


def tensor_scale(t, re: float, im: float):
    return t * (re if im == 0.0 else complex(re, im))


def tensor_new_c64(indices, re_flat, im_flat, dims):
    from ..core.tensor import Tensor

    arr = (np.asarray(re_flat) + 1j * np.asarray(im_flat)).reshape(
        [int(d) for d in dims], order="F")
    return Tensor(tuple(indices), arr)


def tensor_payload_c64(tensor, order="F"):
    arr = np.asarray(tensor.data, dtype=np.complex128).flatten(order)
    return np.ascontiguousarray(arr.view(np.float64))


def contract_many_retain(tensors, retain):
    from ..core.contract import contract

    return contract(list(tensors), retain=tuple(retain),
                    check_connected=False)


# ----------------------------------------------------------------------
# Storage-parity constructors (ref capi tensor.rs:491-960): the dense
# design materializes diag/structured payloads into dense tensors —
# same observable semantics, axis_classes report all-dense.
# ----------------------------------------------------------------------
def tensor_axis_classes(tensor):
    return [0] * tensor.ndim


def tensor_diag_general(indices, values):
    import numpy as np

    from ..core.tensor import Tensor

    indices = tuple(indices)
    dims = [i.dim for i in indices]
    d = min(dims) if dims else 0
    vals = np.asarray(values)
    if vals.shape[0] != d:
        raise ValueError("diag length must equal the smallest index dim")
    out = np.zeros(dims, vals.dtype)
    if d:
        view = np.lib.stride_tricks.as_strided(
            out, shape=(d,), strides=(sum(out.strides),))
        view[:] = vals
    return Tensor(indices, out)


def tensor_structured(indices, axis_classes, payload, payload_dims):
    """Dense materialization of a structured payload: axes sharing a
    nonzero class id form a generalized-diagonal group backed by one
    payload axis (ref tensorbackend structured storage)."""
    import numpy as np

    from ..core.tensor import Tensor

    indices = tuple(indices)
    dims = [i.dim for i in indices]
    payload = np.asarray(payload).reshape(list(payload_dims), order="F")
    out = np.zeros(dims, payload.dtype)
    shape, strides, seen = [], [], {}
    for ax, cls in enumerate(axis_classes):
        cls = int(cls)
        if cls and cls in seen:
            k = seen[cls]
            strides[k] += out.strides[ax]
            shape[k] = min(shape[k], dims[ax])
        else:
            if cls:
                seen[cls] = len(shape)
            shape.append(dims[ax])
            strides.append(out.strides[ax])
    if list(shape) != list(payload.shape):
        raise ValueError(
            f"payload dims {list(payload.shape)} do not match the "
            f"axis-class structure {shape}")
    view = np.lib.stride_tricks.as_strided(out, shape, strides)
    view[:] = payload
    return Tensor(indices, out)


def treetn_restructure_to(h: CTreeTN, names, sites_flat, sites_lens,
                          edges_a, edges_b, rtol: float,
                          maxdim: int) -> CTreeTN:
    import networkx as nx

    from ..config import SvdTruncationPolicy
    from ..treetn.restructure import restructure_to

    g = nx.Graph()
    g.add_nodes_from(names)
    for a, b in zip(edges_a, edges_b):
        g.add_edge(a, b)
    sites = {}
    pos = 0
    for n, ln in zip(names, sites_lens):
        sites[n] = list(sites_flat[pos:pos + int(ln)])
        pos += int(ln)
    pol = SvdTruncationPolicy(tol=rtol,
                              maxdim=(maxdim if maxdim > 0 else None))
    out = CTreeTN()
    out._net = restructure_to(h.net(), g, sites, policy=pol)
    return out
