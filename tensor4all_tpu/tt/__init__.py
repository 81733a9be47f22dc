"""Tensor trains over plain rank-3/rank-4 cores (ref tensor4all-simplett)."""

from .tensortrain import TensorTrain
from .compression import (
    compress,
    left_orthogonalize,
    right_orthogonalize,
    tt_svd_dense,
)
from .canonical import SiteTensorTrain, VidalTensorTrain
from .mpo import MPO
from .cache import TTCache

__all__ = [
    "TensorTrain",
    "compress",
    "left_orthogonalize",
    "right_orthogonalize",
    "tt_svd_dense",
    "SiteTensorTrain",
    "VidalTensorTrain",
    "MPO",
    "TTCache",
]
