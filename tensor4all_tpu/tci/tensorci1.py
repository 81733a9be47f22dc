"""TCI1 — legacy one-site cross interpolation.

TPU-native rebuild of tensor4all-tensorci/src/tensorci1.rs:1-1055
(`TensorCI1`, `TCI1SweepStrategy`): pivots are grown one at a time per
bond per half-sweep (ACA-style), instead of TCI2's full two-site re-pivot.
Kept for parity with the reference's legacy path; TCI2 is the primary
engine.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from .cached_function import CachedFunction
from .indexset import IndexSet
from .tensorci2 import TensorCI2, estimate_true_error


@dataclasses.dataclass
class TCI1Options:
    """Ref: TCI1 options / TCI1SweepStrategy (tensorci1.rs:32)."""

    tol: float = 1e-8
    maxbonddim: Optional[int] = None
    max_iter: int = 30
    verbosity: int = 0


class TensorCI1(TensorCI2):
    """One-site TCI: shares the pivot-set state machine with TCI2 but grows
    each bond by at most one pivot per sweep (ref sweep semantics)."""

    def _grow_bond(self, p: int, opts: TCI1Options) -> float:
        """Add the single worst-error pivot at bond p; return its error."""
        d_p, d_q = self.local_dims[p], self.local_dims[p + 1]
        I_cand = [i + (s,) for i in self.Iset[p] for s in range(d_p)]
        J_cand = [(s,) + j for s in range(d_q) for j in self.Jset[p + 1]]
        Pi = self._eval_matrix(I_cand, J_cand)
        # residual of the current cross on the Pi block
        rows = [I_cand.index(i) for i in self.Iset[p + 1] if i in I_cand]
        cols = [J_cand.index(j) for j in self.Jset[p] if j in J_cand]
        if rows and cols and len(rows) == len(cols):
            P = Pi[np.ix_(rows, cols)]
            try:
                approx = Pi[:, cols] @ np.linalg.solve(P, Pi[rows, :])
            except np.linalg.LinAlgError:
                approx = np.zeros_like(Pi)
            R = Pi - approx
        else:
            R = Pi
        flat = int(np.argmax(np.abs(R)))
        i, j = flat // R.shape[1], flat % R.shape[1]
        err = float(np.abs(R[i, j]))
        if err > opts.tol * max(self.f_max, 1e-300) and (
            opts.maxbonddim is None or len(self.Iset[p + 1]) < opts.maxbonddim
        ):
            self.Iset[p + 1].add(I_cand[i])
            self.Jset[p].add(J_cand[j])
        self.pivot_errors[p] = err
        return err


def crossinterpolate1(
    f: Optional[Callable] = None,
    local_dims: Optional[Sequence[int]] = None,
    initial_pivots: Optional[Sequence[Sequence[int]]] = None,
    options: Optional[TCI1Options] = None,
    batch_f: Optional[Callable] = None,
    dtype=np.float64,
) -> Tuple[TensorCI1, List[int], List[float]]:
    """Legacy TCI1 driver (ref tensorci1.rs)."""
    opts = options or TCI1Options()
    func = CachedFunction(f=f, local_dims=local_dims, batch_f=batch_f,
                          dtype=dtype)
    tci = TensorCI1(func, initial_pivots)
    ranks_history: List[int] = []
    errors_history: List[float] = []
    for it in range(opts.max_iter):
        bonds = range(tci.L - 1) if it % 2 == 0 else range(tci.L - 2, -1, -1)
        for p in bonds:
            tci._grow_bond(p, opts)
        err = float(tci.pivot_errors.max()) / max(tci.f_max, 1e-300)
        ranks_history.append(max(tci.ranks))
        errors_history.append(err)
        if opts.verbosity:
            print(f"[tci1] iter={it} rank={ranks_history[-1]} err={err:.3e}")
        if err < opts.tol:
            break
    return tci, ranks_history, errors_history
