"""Quantics TCI: cross-interpolate continuous/discrete functions on
exponentially fine grids.

TPU-native rebuild of tensor4all-quanticstci/src/quantics_tci.rs
(:71 `QuanticsTensorCI2`, :458 `quanticscrossinterpolate`, :621 discrete
variant, :729 from-arrays; batched/mod.rs:206): grid encoding + TCI2 with
the batched function evaluated through the grid mapping; `evaluate` maps
coordinates back to quantics indices, `integral` contracts the TT against
the Riemann weights.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ..tci.tensorci2 import TCI2Options, TensorCI2, crossinterpolate2
from ..tt.tensortrain import TensorTrain
from .grids import DiscretizedGrid, InherentDiscreteGrid, UnfoldingScheme


@dataclasses.dataclass
class QuanticsTensorCI2:
    """Result wrapper (ref QuanticsTensorCI2, quantics_tci.rs:71)."""

    tci: TensorCI2
    tt: TensorTrain
    grid: DiscretizedGrid
    ranks_history: List[int]
    errors_history: List[float]

    def evaluate(self, x) -> np.ndarray:
        """Evaluate the interpolant at continuous coordinates (B, d)."""
        q = self.grid.coord_to_quantics(np.atleast_2d(np.asarray(x, float)))
        return np.asarray(self.tt.evaluate_batch(q))

    def evaluate_quantics(self, q) -> np.ndarray:
        return np.asarray(self.tt.evaluate_batch(np.asarray(q)))

    def integral(self) -> complex:
        """Riemann sum: sum over the full grid times the cell volume
        (ref integral :239)."""
        return complex(self.tt.sum()) * self.grid.cell_volume

    @property
    def n_evals(self) -> int:
        return self.tci.func.num_evals


def quanticscrossinterpolate(
    f: Callable[[np.ndarray], np.ndarray],
    grid: DiscretizedGrid,
    initial_pivots: Optional[Sequence[Sequence[int]]] = None,
    options: Optional[TCI2Options] = None,
    dtype=np.float64,
) -> QuanticsTensorCI2:
    """Cross-interpolate a batched continuous function ``f((B,d)) -> (B,)``
    on a quantics grid (ref quanticscrossinterpolate :458)."""

    def batch_f(q: np.ndarray) -> np.ndarray:
        return np.asarray(f(grid.quantics_to_coord(q)))

    opts = options or TCI2Options(tol=1e-8, max_iter=20)
    piv = None
    if initial_pivots is not None:
        piv = [list(p) for p in initial_pivots]
    tci, ranks, errs = crossinterpolate2(
        batch_f=batch_f, local_dims=grid.local_dims,
        initial_pivots=piv, options=opts, dtype=dtype,
    )
    return QuanticsTensorCI2(tci, tci.to_tensortrain(), grid, ranks, errs)


def quanticscrossinterpolate_discrete(
    f: Callable[[np.ndarray], np.ndarray],
    grid: InherentDiscreteGrid,
    initial_pivots: Optional[Sequence[Sequence[int]]] = None,
    options: Optional[TCI2Options] = None,
    dtype=np.float64,
) -> QuanticsTensorCI2:
    """Discrete variant: ``f`` takes integer coordinates (B, d)
    (ref :621)."""

    def batch_f(q: np.ndarray) -> np.ndarray:
        return np.asarray(f(grid.quantics_to_index(q)))

    opts = options or TCI2Options(tol=1e-8, max_iter=20)
    piv = [list(p) for p in initial_pivots] if initial_pivots else None
    tci, ranks, errs = crossinterpolate2(
        batch_f=batch_f, local_dims=grid.local_dims,
        initial_pivots=piv, options=opts, dtype=dtype,
    )
    cont = DiscretizedGrid(grid.R, (0.0,) * grid.d,
                           (float(2 ** grid.R),) * grid.d, grid.unfolding)
    return QuanticsTensorCI2(tci, tci.to_tensortrain(), cont, ranks, errs)


def quantics_from_array(
    a: np.ndarray,
    unfolding: UnfoldingScheme = UnfoldingScheme.INTERLEAVED,
    tol: float = 1e-12,
    maxdim: Optional[int] = None,
) -> Tuple[TensorTrain, InherentDiscreteGrid]:
    """Dense array (2^R per axis) -> quantics TT by TT-SVD (ref :729
    `quanticscrossinterpolate_from_arrays`)."""
    a = np.asarray(a)
    d = a.ndim
    R = int(np.log2(a.shape[0]))
    if any(s != 2 ** R for s in a.shape):
        raise ValueError("all axes must have length 2^R")
    grid = InherentDiscreteGrid(R, d, unfolding)
    from ..tt.compression import tt_svd_dense

    # reshape to bit axes: axis of (dim k, scale b) is k*R + b (MSB first)
    a_bits = a.reshape([2] * (R * d))
    if unfolding is UnfoldingScheme.INTERLEAVED:
        # site order: scale-major, dimension-minor
        order = [k * R + b for b in range(R) for k in range(d)]
        return tt_svd_dense(a_bits.transpose(order), tol=tol,
                            maxdim=maxdim), grid
    # fused: group each scale's d bits into one axis of dim 2^d; in a
    # reshape the FIRST axis is most significant, and the fused digit uses
    # dim 0 as the LEAST significant bit, so order dims descending
    order = [k * R + b for b in range(R) for k in reversed(range(d))]
    a_fused = a_bits.transpose(order).reshape([2 ** d] * R)
    return tt_svd_dense(a_fused, tol=tol, maxdim=maxdim), grid
