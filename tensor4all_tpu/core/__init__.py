"""Core tensor semantics: identity-carrying indices, dynamic-rank tensors,
n-ary contraction, factorizations (ref layer L2, tensor4all-core)."""

from .index import Index, TagSet, new_id, sim
from .tensor import Tensor
from .contract import contract, tensordot, outer_product
from .decomp import (
    Canonical,
    FactorizeAlg,
    TruncationSpec,
    direct_sum,
    eigh,
    factorize,
    lq,
    qr,
    svd,
    svd_two,
    truncated_svd_matrix,
    truncation_rank,
)

__all__ = [
    "Index",
    "TagSet",
    "new_id",
    "sim",
    "Tensor",
    "contract",
    "tensordot",
    "outer_product",
    "Canonical",
    "FactorizeAlg",
    "TruncationSpec",
    "direct_sum",
    "eigh",
    "factorize",
    "lq",
    "qr",
    "svd",
    "svd_two",
    "truncated_svd_matrix",
    "truncation_rank",
]
