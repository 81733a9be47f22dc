"""Tensor cross interpolation (ref tensor4all-tcicore / -tensorci)."""

from .cached_function import CachedFunction, make_jax_batch_f
from .indexset import IndexSet
from .tensorci2 import (
    TCI2Options,
    TensorCI2,
    crossinterpolate2,
    estimate_true_error,
    find_global_pivots,
    floating_zone,
)
from .tensorci1 import TCI1Options, TensorCI1, crossinterpolate1
from .integration import IntegrationResult, integrate_tci
from .conversion import opt_first_pivot, tci2_from_tensortrain

__all__ = [
    "CachedFunction",
    "make_jax_batch_f",
    "IndexSet",
    "TCI2Options",
    "TensorCI2",
    "crossinterpolate2",
    "estimate_true_error",
    "find_global_pivots",
    "floating_zone",
    "TCI1Options",
    "TensorCI1",
    "crossinterpolate1",
    "IntegrationResult",
    "integrate_tci",
    "opt_first_pivot",
    "tci2_from_tensortrain",
]
