"""ACI: elementwise operations on tensor trains by cross interpolation.

TPU-native rebuild of tensor4all-aci
(crates/tensor4all-aci/src/elementwise.rs:76 `elementwise_batched`,
`AciOptions`, batch.rs `ElementwiseBatch`): given input TTs A_1..A_k and an
elementwise map ``g``, produce a TT of ``g(A_1(x), ..., A_k(x))``.

Like the reference's local block evaluators (local.rs), the inputs are
evaluated through TWO-SIDED cached partial contractions (tt.TTCache):
the TCI sweep's pivot batches share index prefixes and suffixes across
bond updates, so each input TT pays only the local matvecs at the
meeting site per point. Very large batches fall back to the fully
batched device kernel (MXU matmul chains). The semantics (tolerance,
convergence, rank caps) match the reference's.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import numpy as np

from ..tci.tensorci2 import TCI2Options, crossinterpolate2
from .tensortrain import TensorTrain


@dataclasses.dataclass
class AciOptions:
    """Ref: AciOptions (aci/src/elementwise.rs)."""

    tol: float = 1e-10
    maxbonddim: Optional[int] = None
    max_iter: int = 16
    n_global_pivots: int = 2
    global_search_starts: int = 32
    seed: int = 0

    def to_tci2(self) -> TCI2Options:
        return TCI2Options(
            tol=self.tol,
            maxbonddim=self.maxbonddim,
            max_iter=self.max_iter,
            n_global_pivots=self.n_global_pivots,
            global_search_starts=self.global_search_starts,
            seed=self.seed,
        )


def elementwise(
    op,
    tts,
    options=None,
    initial_pivots=None,
    dtype=np.float64,
) -> "TensorTrain":
    """Scalar-callback variant of `elementwise_batched`
    (ref elementwise.rs:40 `elementwise`): `op` receives k floats and
    returns one float; vectorized internally."""
    def batched(*cols):
        return np.array([op(*vals) for vals in zip(*cols)])

    return elementwise_batched(batched, tts, options=options,
                               initial_pivots=initial_pivots, dtype=dtype)


def elementwise_batched(
    op: Callable[..., np.ndarray],
    tts: Sequence[TensorTrain],
    options: Optional[AciOptions] = None,
    initial_pivots: Optional[Sequence[Sequence[int]]] = None,
    dtype=np.float64,
) -> TensorTrain:
    """TT of ``op(A_1(x), ..., A_k(x))`` (ref elementwise.rs:76).

    `op` receives k arrays of shape (B,) and returns (B,).
    """
    if not tts:
        raise ValueError("need at least one input TT")
    dims = tts[0].local_dims
    for t in tts[1:]:
        if t.local_dims != dims:
            raise ValueError("input TTs must share local dims")
    from .cache import TTCache

    caches = [TTCache(t) for t in tts]

    def batch_f(idx: np.ndarray) -> np.ndarray:
        # cached local evaluation (ref aci local.rs block evaluators)
        vals = [c.evaluate_batch(idx) for c in caches]
        out = np.asarray(op(*vals))
        if out.shape != (idx.shape[0],):
            raise ValueError("op must map (B,)-arrays to a (B,) array")
        return out

    opts = (options or AciOptions()).to_tci2()
    tci, _, _ = crossinterpolate2(
        batch_f=batch_f, local_dims=dims,
        initial_pivots=initial_pivots, options=opts, dtype=dtype,
    )
    return tci.to_tensortrain()


def hadamard_aci(a: TensorTrain, b: TensorTrain,
                 options: Optional[AciOptions] = None) -> TensorTrain:
    """Elementwise product via ACI (rank-adaptive alternative to the exact
    kron-product ``TensorTrain.hadamard`` whose ranks multiply)."""
    return elementwise_batched(lambda x, y: x * y, [a, b], options)


def invert_tt(a: TensorTrain, options: Optional[AciOptions] = None,
              eps: float = 0.0) -> TensorTrain:
    """Elementwise reciprocal ``1/(A(x) + eps)`` via ACI (ref
    interpolativeqtt `invert_qtt` role)."""
    return elementwise_batched(lambda x: 1.0 / (x + eps), [a], options)
