"""Global defaults and truncation policies.

Mirrors the reference's three-tier config system (SURVEY.md §5.6):
per-call options structs, process-global mutable defaults
(ref: tensor4all-core/src/defaults/global_default.rs:32-80,
svd.rs:134 `set_default_svd_truncation_policy`,
qr.rs:105 `set_default_qr_rtol`), and ``T4A_*`` env vars for diagnostics.
"""

from __future__ import annotations

import dataclasses
import enum
import os
import threading
from typing import Optional


class ThresholdScale(enum.Enum):
    """How a truncation threshold is scaled.

    Ref: tensor4all-core/src/defaults/truncation.rs:25-208.
    ``RELATIVE`` scales the cutoff by the largest singular value (or the
    total squared sum for the squared-tail measure); ``ABSOLUTE`` uses it
    as-is.
    """

    RELATIVE = "relative"
    ABSOLUTE = "absolute"


class SingularValueMeasure(enum.Enum):
    """What quantity the cutoff is compared against.

    ``VALUE``: discard singular values with s_i < tol (ITensor
    ``use_absolute_cutoff`` style when combined with ABSOLUTE).
    ``SQUARED_TAIL``: discard the largest tail with
    sum(s_i^2 tail) < tol * sum(s^2) (ITensors default ``cutoff``).
    Ref: truncation.rs `SingularValueMeasure`.
    """

    VALUE = "value"
    SQUARED_TAIL = "squared_tail"


@dataclasses.dataclass(frozen=True)
class SvdTruncationPolicy:
    """Truncation policy for SVD-based factorization.

    Ref: tensor4all-core/src/defaults/truncation.rs:25-208
    (`SvdTruncationPolicy`, `TruncationRule`).

    Attributes:
      tol: threshold (interpreted per `scale` and `measure`).
      scale: relative (to max SV / total weight) or absolute.
      measure: per-value cutoff or squared-tail cutoff.
      maxdim: hard cap on kept rank (None = unbounded).
      mindim: keep at least this many singular values (subject to matrix size).
    """

    tol: float = 0.0
    scale: ThresholdScale = ThresholdScale.RELATIVE
    measure: SingularValueMeasure = SingularValueMeasure.SQUARED_TAIL
    maxdim: Optional[int] = None
    mindim: int = 1

    def with_tol(self, tol: float) -> "SvdTruncationPolicy":
        return dataclasses.replace(self, tol=tol)

    def with_maxdim(self, maxdim: Optional[int]) -> "SvdTruncationPolicy":
        return dataclasses.replace(self, maxdim=maxdim)


_lock = threading.Lock()
_default_svd_policy = SvdTruncationPolicy()
# Exact-shape QR by default (matching the reference: rank decisions
# belong to SVD/LU). Opt into row-norm tail dropping — sound but not
# rank-revealing without column pivoting — via set_default_qr_rtol.
_default_qr_rtol = 0.0


def get_default_svd_truncation_policy() -> SvdTruncationPolicy:
    with _lock:
        return _default_svd_policy


def set_default_svd_truncation_policy(policy: SvdTruncationPolicy) -> None:
    if policy.tol < 0:
        raise ValueError("truncation tol must be >= 0")
    global _default_svd_policy
    with _lock:
        _default_svd_policy = policy


def get_default_qr_rtol() -> float:
    with _lock:
        return _default_qr_rtol


def set_default_qr_rtol(rtol: float) -> None:
    if rtol < 0:
        raise ValueError("qr rtol must be >= 0")
    global _default_qr_rtol
    with _lock:
        _default_qr_rtol = rtol


def env_flag(name: str, default: bool = False) -> bool:
    """T4A_* env toggle (ref: 28 `T4A_*` vars, SURVEY.md §5.1/§5.6)."""
    v = os.environ.get(name)
    if v is None:
        return default
    return v not in ("0", "", "false", "False", "no")
