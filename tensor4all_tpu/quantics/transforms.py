"""Quantics-space transform operators (MPO constructors).

TPU-native rebuild of tensor4all-quanticstransform/src/
(flip.rs:41 `flip_operator`, shift.rs:45,81 `shift_operator{,_multivar}`,
phase_rotation.rs:55, cumsum.rs:72,106 `cumsum_operator`/`triangle`,
fourier.rs:202 `quantics_fourier_operator` (Chen-Lindsey QFT MPO,
arXiv:2404.03182), affine.rs:487 `affine_operator`,
difference_kernel.rs:24 `difference_kernel_mpo`).

Conventions: 1-D quantics TTs have R sites of dim 2, MSB first (site 0 is
the most significant bit). An operator O acts as ``(O f)(x) = f(sigma(x))``
with MPO element ``O[out=x, in=y]``. Carry automata (shift/affine) run
LSB->MSB, i.e. the MPO bond carries the carry right-to-left; boundary
condition ``periodic`` wraps mod 2^R, ``open`` zeroes out-of-range.

All cores are built densely on host (they are tiny: bond dims 2..a+2) and
handed to XLA as rank-4 arrays (tt.MPO).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..tt.mpo import MPO
from ..tt.tensortrain import TensorTrain


def _bits_msb_first(value: int, R: int) -> List[int]:
    return [(value >> (R - 1 - b)) & 1 for b in range(R)]


def shift_operator(R: int, shift: int, bc: str = "periodic",
                   dtype=np.float64) -> MPO:
    """(O f)(x) = f(x + shift) (ref shift.rs:45).

    Carry automaton: ``in = out + shift`` bit by bit, LSB->MSB. Bond value
    on the link right of site b = carry into site b. ``periodic`` wraps
    modulo 2^R; ``open`` gives 0 where x + shift leaves [0, 2^R).
    """
    if bc not in ("periodic", "open"):
        raise ValueError("bc must be 'periodic' or 'open'")
    s = shift % (1 << R) if bc == "periodic" else shift
    if bc == "open" and not (-(1 << R) < shift < (1 << R)):
        return MPO([np.zeros((1, 2, 2, 1), dtype)[...] for _ in range(R)])
    if bc == "open" and shift < 0:
        # f(x + s) with negative s: in = out + s fails the non-negative
        # carry automaton; build as the transpose of the +|s| shift
        pos = shift_operator(R, -shift, bc="open", dtype=dtype)
        return MPO([np.swapaxes(c, 1, 2) for c in pos.cores])
    sbits = _bits_msb_first(s if s >= 0 else s % (1 << R), R)
    # carry in {0,1}
    cores = []
    for b in range(R):
        l_dim = 1 if b == 0 else 2
        r_dim = 1 if b == R - 1 else 2
        W = np.zeros((l_dim, 2, 2, r_dim), dtype)
        for out in (0, 1):
            for r in range(r_dim):
                tot = out + sbits[b] + r
                inn = tot & 1
                carry = tot >> 1
                if b == 0:
                    if bc == "open" and carry != 0:
                        continue  # overflow forbidden
                    W[0, out, inn, r] += 1.0
                else:
                    W[carry, out, inn, r] += 1.0
        cores.append(W)
    return MPO(cores)


def bitflip_operator(R: int, dtype=np.float64) -> MPO:
    """(O f)(x) = f(2^R - 1 - x): bitwise NOT, rank 1."""
    X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype)
    return MPO([X[None, :, :, None] for _ in range(R)])


def flip_operator(R: int, dtype=np.float64) -> MPO:
    """(O f)(x) = f((-x) mod 2^R) (ref flip.rs:41).

    Composition: bitflip then +1 shift — f((2^R-1-x)+1) = f(-x mod 2^R).
    """
    return bitflip_operator(R, dtype).compose_zipup(
        shift_operator(R, 1, bc="periodic", dtype=dtype), tol=1e-14
    )


def phase_rotation_operator(R: int, theta: float) -> MPO:
    """(O f)(x) = e^{i theta x} f(x) (ref phase_rotation.rs:55); rank 1."""
    cores = []
    for b in range(R):
        w = np.exp(1j * theta * (1 << (R - 1 - b)))
        D = np.diag([1.0 + 0j, w])
        cores.append(D[None, :, :, None])
    return MPO(cores)


def cumsum_operator(R: int, inclusive: bool = False,
                    dtype=np.float64) -> MPO:
    """(O f)(x) = sum_{y < x} f(y) (ref cumsum.rs:72); ``inclusive`` adds
    the y = x term (triangle_operator, :106).

    Comparison automaton MSB->LSB: state 0 = bits equal so far,
    state 1 = already y < x. Exact bond dimension 2.
    """
    E, D = 0, 1
    cores = []
    for b in range(R):
        l_dim = 1 if b == 0 else 2
        r_dim = 1 if b == R - 1 else 2
        W = np.zeros((l_dim, 2, 2, r_dim), dtype)
        for l in range(2):
            if b == 0 and l != E:
                continue
            for x in (0, 1):
                for y in (0, 1):
                    if l == D:
                        nxt = D
                    elif x == y:
                        nxt = E
                    elif y < x:
                        nxt = D
                    else:
                        continue  # y > x with equal prefix: rejected
                    if b == R - 1:
                        accept = (nxt == D) or (inclusive and nxt == E)
                        if accept:
                            W[min(l, l_dim - 1), x, y, 0] += 1.0
                    else:
                        W[min(l, l_dim - 1), x, y, nxt] += 1.0
        cores.append(W)
    return MPO(cores)


def triangle_operator(R: int, dtype=np.float64) -> MPO:
    """Inclusive cumulative sum (ref cumsum.rs:106)."""
    return cumsum_operator(R, inclusive=True, dtype=dtype)


def quantics_fourier_operator(
    R: int,
    sign: int = -1,
    tol: float = 1e-12,
    maxdim: Optional[int] = None,
    normalize: bool = True,
) -> MPO:
    """QFT as a quantics MPO (ref fourier.rs:202; Chen-Lindsey
    arXiv:2404.03182): ``F[k, x] = 2^{-R/2} exp(sign * 2*pi*i * k x / 2^R)``
    with the OUTPUT bits in bit-reversed order (site j carries k_{R-1-j}).

    Built by TCI2 over fused (k-bit, x-bit) pairs — the kernel's
    exponentially decaying cross-scale couplings give bond dimension
    ~O(log 1/tol) (about 11 at 1e-10). Apply then ``TensorTrain.reverse()``
    to obtain standard MSB-first ordering of k.
    """
    from ..tci.tensorci2 import TCI2Options, crossinterpolate2

    if R > 31:
        raise ValueError("R > 31 would overflow the int64 phase arithmetic")
    norm = 2.0 ** (-R / 2) if normalize else 1.0
    pow_rev = (1 << np.arange(R, dtype=np.int64))  # weight of k_{R-1-j}
    pow_msb = (1 << np.arange(R - 1, -1, -1, dtype=np.int64))

    def batch_f(idx: np.ndarray) -> np.ndarray:
        # site j digit = 2 * k_{R-1-j} + x_j; exact integer phase mod 2^R
        # (k*x can exceed 2^53 — float64 would lose the phase)
        idx = idx.astype(np.int64)
        kbits_rev = idx >> 1  # (B, R): k_{R-1-j} at position j
        xbits = idx & 1
        k = (kbits_rev * pow_rev[None, :]).sum(axis=1)
        x = (xbits * pow_msb[None, :]).sum(axis=1)
        phase_num = (k * x) & ((1 << R) - 1)
        return norm * np.exp(sign * 2j * np.pi * (phase_num / (1 << R)))

    opts = TCI2Options(tol=tol, maxbonddim=maxdim, max_iter=16)
    tci, _, _ = crossinterpolate2(
        batch_f=batch_f, local_dims=[4] * R, options=opts,
        dtype=np.complex128,
    )
    tt = tci.to_tensortrain()
    cores = []
    for c in tt.cores:
        l, _, r = c.shape
        cores.append(np.asarray(c).reshape(l, 2, 2, r))
    return MPO(cores)


def affine_operator(R: int, a: int, b: int = 0, bc: str = "periodic",
                    dtype=np.float64) -> MPO:
    """(O f)(x) = f(a*x + b) for non-negative integer `a` (ref
    affine.rs:487 — the reference supports rational A,b; integer case
    here, rationals via grid rescaling).

    Carry automaton LSB->MSB with carries bounded by a+1.
    """
    if a < 0:
        raise NotImplementedError("negative scale: compose with flip_operator")
    if bc not in ("periodic", "open"):
        raise ValueError("bc must be 'periodic' or 'open'")
    bb = b % (1 << R) if bc == "periodic" else b
    if bc == "open" and bb < 0:
        raise NotImplementedError("open bc with negative offset")
    bbits = _bits_msb_first(bb % (1 << R), R)
    C = a + 2  # carry values 0..C-1 (fixpoint of (a + 1 + c) // 2)
    cores = []
    for site in range(R):
        l_dim = 1 if site == 0 else C
        r_dim = 1 if site == R - 1 else C
        W = np.zeros((l_dim, 2, 2, r_dim), dtype)
        for out in (0, 1):
            for r in range(r_dim):
                tot = a * out + bbits[site] + r
                inn = tot & 1
                carry = tot >> 1
                if site == 0:
                    if bc == "open" and carry != 0:
                        continue
                    W[0, out, inn, r] += 1.0
                else:
                    if carry < C:
                        W[carry, out, inn, r] += 1.0
        cores.append(W)
    return MPO(cores)


def difference_kernel_mpo(R: int, kind: str = "central",
                          bc: str = "open", dtype=np.float64) -> MPO:
    """Finite-difference kernels from shift operators
    (ref difference_kernel.rs:24): central ``(f(x+1) - f(x-1))/2``,
    forward ``f(x+1) - f(x)``, backward ``f(x) - f(x-1)``.
    Multiply by 1/h (grid step) for a derivative estimate.
    """
    if kind == "central":
        m = shift_operator(R, 1, bc, dtype) + shift_operator(R, -1, bc, dtype).scale(-1.0)
        return m.scale(0.5)
    if kind == "forward":
        return shift_operator(R, 1, bc, dtype) + shift_operator(R, 0, bc, dtype).scale(-1.0)
    if kind == "backward":
        return shift_operator(R, 0, bc, dtype) + shift_operator(R, -1, bc, dtype).scale(-1.0)
    raise ValueError("kind must be central/forward/backward")


def shift_operator_multivar(R: int, d: int, shifts: Sequence[int],
                            bc: str = "periodic", dtype=np.float64) -> MPO:
    """Per-dimension shifts on an interleaved multivariate quantics TT
    (ref shift.rs:81): dimension k occupies sites k, k+d, k+2d, ...

    Built as the product of per-dimension shift automata embedded with
    identity pass-through on the other dimensions' sites, composed with
    on-the-fly truncation.
    """
    if len(shifts) != d:
        raise ValueError("need one shift per dimension")
    n_sites = R * d
    total: Optional[MPO] = None
    for k, s in enumerate(shifts):
        base = shift_operator(R, s, bc, dtype)
        first, last = k, (R - 1) * d + k  # dim-k sites span [first, last]

        def link_dim(pos: int) -> int:
            """Dim of the link between sites pos and pos+1: the carry is
            in flight only strictly inside the dim-k span."""
            return 2 if first <= pos < last else 1

        cores = []
        for site in range(n_sites):
            scale, dim = divmod(site, d)
            l_dim = 1 if site == 0 else link_dim(site - 1)
            r_dim = 1 if site == n_sites - 1 else link_dim(site)
            if dim == k:
                cores.append(np.asarray(base.cores[scale], dtype).reshape(
                    l_dim, 2, 2, r_dim
                ))
            else:
                c = np.zeros((l_dim, 2, 2, r_dim), dtype)
                for t in range(min(l_dim, r_dim)):
                    c[t, 0, 0, t] = 1.0
                    c[t, 1, 1, t] = 1.0
                cores.append(c)
        m = MPO(cores)
        total = m if total is None else total.compose_zipup(m, tol=1e-13)
    return total


def apply_quantics_operator(op: MPO, tt: TensorTrain, tol: float = 1e-12,
                            maxdim: Optional[int] = None) -> TensorTrain:
    """Apply a transform MPO to a quantics TT with truncation."""
    return op.apply_zipup(tt, tol=tol, maxdim=maxdim)
