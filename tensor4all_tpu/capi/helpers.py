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
