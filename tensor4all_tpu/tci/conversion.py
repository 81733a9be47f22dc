"""Rebuild TCI2 pivot state from an existing TensorTrain.

TPU-native rebuild of tensor4all-tensorci/src/conversion.rs:1-400
(`TensorCI2::from_tensor_train`): the de-facto resume path (SURVEY.md §5.4)
— pivot sets are re-derived by cross-interpolating the TT itself (cheap:
TT evaluation is batched on device).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..tt.tensortrain import TensorTrain
from .cached_function import CachedFunction
from .tensorci2 import TCI2Options, TensorCI2, crossinterpolate2


def tci2_from_tensortrain(
    tt: TensorTrain,
    tol: float = 1e-12,
    maxbonddim: Optional[int] = None,
) -> TensorCI2:
    """Create a TCI2 whose pivots reproduce `tt` to `tol`."""

    def batch_f(idx: np.ndarray) -> np.ndarray:
        return np.asarray(tt.evaluate_batch(idx))

    opts = TCI2Options(
        tol=tol,
        maxbonddim=maxbonddim or (tt.max_rank + 4),
        max_iter=8,
    )
    tci, _, _ = crossinterpolate2(
        batch_f=batch_f, local_dims=tt.local_dims, options=opts,
        dtype=np.asarray(tt.cores[0]).dtype,
    )
    return tci


def opt_first_pivot(
    func: CachedFunction,
    start: Optional[tuple] = None,
    max_rounds: int = 10,
) -> tuple:
    """Greedy coordinate ascent maximizing |f| for the starting pivot.

    Ref: tensorci/src/optfirstpivot.rs:40.
    """
    dims = func.local_dims
    point = np.asarray(start if start is not None else [0] * len(dims),
                       dtype=np.int64)
    best = abs(func(tuple(point)))
    for _ in range(max_rounds):
        improved = False
        for site, d in enumerate(dims):
            cand = np.tile(point, (d, 1))
            cand[:, site] = np.arange(d)
            vals = np.abs(func.eval_batch(cand))
            j = int(np.argmax(vals))
            if vals[j] > best * (1 + 1e-15):
                best = vals[j]
                point = cand[j]
                improved = True
        if not improved:
            break
    return tuple(int(v) for v in point)
