"""ACI: elementwise operations on tensor trains by cross interpolation.

TPU-native rebuild of tensor4all-aci
(crates/tensor4all-aci/src/elementwise.rs:76 `elementwise_batched`,
`AciOptions`, batch.rs `ElementwiseBatch`, state.rs `ElementwiseProblem`):
given input TTs A_1..A_k and an elementwise map ``g``, produce a TT of
``g(A_1(x), ..., A_k(x))``.

Like the reference's local block evaluators (local.rs), the inputs are
evaluated through TWO-SIDED cached partial contractions (tt.TTCache):
the TCI sweep's pivot batches share index prefixes and suffixes across
bond updates, so each input TT pays only the local matvecs at the
meeting site per point. Very large batches fall back to the fully
batched device kernel (MXU matmul chains). The semantics (tolerance,
min-iteration convergence window, rank caps) match the reference's
(elementwise.rs `convergence_criterion_like_julia`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import numpy as np

from ..tci.tensorci2 import TCI2Options, crossinterpolate2
from .tensortrain import TensorTrain


@dataclasses.dataclass
class AciOptions:
    """Ref: AciOptions (aci/src/options.rs; defaults are conservative,
    tests.rs `default_options_are_conservative`). `min_iters` is the
    Julia-parity convergence window: ranks and errors must be stable
    over the last `min_iters` iterations before stopping
    (elementwise.rs:39 `convergence_criterion_like_julia`)."""

    tol: float = 1e-10
    maxbonddim: Optional[int] = None
    max_iter: int = 16
    min_iters: Optional[int] = None  # default: min(2, max_iter)
    n_global_pivots: int = 2
    global_search_starts: int = 32
    seed: int = 0

    def __post_init__(self):
        if self.max_iter < 1:
            raise ValueError("max_iter must be >= 1")
        if self.min_iters is None:
            self.min_iters = min(2, self.max_iter)
        if self.min_iters < 1 or self.min_iters > self.max_iter:
            raise ValueError("need 1 <= min_iters <= max_iter")
        if self.maxbonddim is not None and self.maxbonddim < 1:
            raise ValueError("maxbonddim must be >= 1")
        if not np.isfinite(self.tol) or self.tol < 0:
            raise ValueError("tol must be finite and >= 0")

    def to_tci2(self) -> TCI2Options:
        return TCI2Options(
            tol=self.tol,
            maxbonddim=self.maxbonddim,
            max_iter=self.max_iter,
            ncheck_history=self.min_iters,
            n_global_pivots=self.n_global_pivots,
            global_search_starts=self.global_search_starts,
            seed=self.seed,
        )


@dataclasses.dataclass
class AciResult:
    """Driver result (ref elementwise.rs `AciResult`): the interpolant
    plus per-iteration rank/error histories and the operator-evaluation
    count (the user-side cost of the run)."""

    tt: TensorTrain
    ranks: List[int]
    errors: List[float]
    n_operator_evals: int

    # the result quacks like its TT for the common consumption patterns
    def evaluate(self, idx):
        return self.tt.evaluate(idx)

    def evaluate_batch(self, idx):
        return self.tt.evaluate_batch(idx)

    def __len__(self):
        return len(self.tt)


class ElementwiseBatch:
    """Column-major (input-fastest) batch view (ref batch.rs
    `ElementwiseBatch`): `values[input + n_inputs * point]`. Used at the
    C boundary, where the reference hands operators flat col-major
    buffers; Python operators receive per-input rows via `input_rows`."""

    def __init__(self, values: np.ndarray, n_inputs: int, n_points: int):
        values = np.asarray(values).ravel()
        if n_inputs <= 0 or n_points <= 0:
            raise ValueError("n_inputs and n_points must be nonzero")
        if values.size != n_inputs * n_points:
            raise ValueError(
                f"need {n_inputs * n_points} values, got {values.size}")
        self._values = values
        self._n_inputs = int(n_inputs)
        self._n_points = int(n_points)

    @property
    def n_inputs(self) -> int:
        return self._n_inputs

    @property
    def n_points(self) -> int:
        return self._n_points

    def get(self, input: int, point: int):
        if not 0 <= input < self._n_inputs:
            raise IndexError("input out of range")
        if not 0 <= point < self._n_points:
            raise IndexError("point out of range")
        return self._values[input + self._n_inputs * point]

    def input_rows(self) -> List[np.ndarray]:
        """One (n_points,) array per input."""
        m = self._values.reshape(self._n_points, self._n_inputs)
        return [m[:, k] for k in range(self._n_inputs)]

    def as_col_major_array(self) -> np.ndarray:
        return self._values


def _validate_inputs(tts: Sequence[TensorTrain]) -> List[int]:
    """Ref validation.rs `validate_inputs`."""
    if not tts:
        raise ValueError("need at least one input TT")
    dims = tts[0].local_dims
    if len(dims) == 0:
        raise ValueError("input TTs must have at least one site")
    for t in tts[1:]:
        if t.local_dims != dims:
            raise ValueError("input TTs must share local dims")
    return dims


def elementwise(
    op,
    tts,
    options=None,
    initial_pivots=None,
    dtype=np.float64,
) -> "AciResult":
    """Scalar-callback variant of `elementwise_batched`
    (ref elementwise.rs:33 `elementwise`): `op` receives k scalars and
    returns one scalar; vectorized internally."""
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
) -> AciResult:
    """TT of ``op(A_1(x), ..., A_k(x))`` (ref elementwise.rs:27).

    `op` receives k arrays of shape (B,) and returns (B,). Returns an
    `AciResult` with rank/error histories (the result delegates
    `evaluate`/`evaluate_batch` to its `.tt`).
    """
    dims = _validate_inputs(tts)
    options = options or AciOptions()
    from .cache import TTCache

    caches = [TTCache(t) for t in tts]
    n_op_evals = [0]

    def batch_f(idx: np.ndarray) -> np.ndarray:
        # cached local evaluation (ref aci local.rs block evaluators)
        vals = [c.evaluate_batch(idx) for c in caches]
        out = np.asarray(op(*vals))
        n_op_evals[0] += int(idx.shape[0])
        if out.shape != (idx.shape[0],):
            raise ValueError("op must map (B,)-arrays to a (B,) array")
        return out

    if len(dims) == 1:
        # one-site input: evaluate op on the full (tiny) grid directly
        # (ref elementwise.rs:31 `elementwise_batched_one_site`)
        idx = np.arange(dims[0], dtype=np.int64)[:, None]
        vals = batch_f(idx).astype(dtype)
        tt = TensorTrain([np.asarray(vals)[None, :, None]])
        return AciResult(tt, ranks=[1], errors=[0.0],
                         n_operator_evals=n_op_evals[0])

    tci, ranks, errors = crossinterpolate2(
        batch_f=batch_f, local_dims=dims,
        initial_pivots=initial_pivots, options=options.to_tci2(),
        dtype=dtype,
    )
    return AciResult(tci.to_tensortrain(), ranks=list(ranks),
                     errors=[float(e) for e in errors],
                     n_operator_evals=n_op_evals[0])


def hadamard_aci(a: TensorTrain, b: TensorTrain,
                 options: Optional[AciOptions] = None) -> TensorTrain:
    """Elementwise product via ACI (rank-adaptive alternative to the exact
    kron-product ``TensorTrain.hadamard`` whose ranks multiply)."""
    return elementwise_batched(lambda x, y: x * y, [a, b], options).tt


def invert_tt(a: TensorTrain, options: Optional[AciOptions] = None,
              eps: float = 0.0) -> TensorTrain:
    """Elementwise reciprocal ``1/(A(x) + eps)`` via ACI (ref
    interpolativeqtt `invert_qtt` role)."""
    return elementwise_batched(lambda x: 1.0 / (x + eps), [a], options).tt
