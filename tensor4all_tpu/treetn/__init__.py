"""Tree tensor networks: containers, operators, and sweeping algorithms
(ref tensor4all-treetn)."""

from .network import TreeTN, random_treetn
from .operator import TreeOperator, mpo_to_treeoperator
from .projected import ProjectedOperator, ProjectedState
from .dmrg import DmrgOptions, DmrgResult, dmrg
from .tdvp import TdvpOptions, tdvp
from .linsolve import (
    LinsolveOptions,
    LinsolveResult,
    LinsolveVerifyReport,
    square_linsolve,
)
from .gse import (
    GseOptions,
    GseResult,
    global_subspace_expand,
    global_subspace_expand_with_references,
    gse_expand,
    gse_tdvp,
)

__all__ = [
    "TreeTN",
    "random_treetn",
    "TreeOperator",
    "mpo_to_treeoperator",
    "ProjectedOperator",
    "ProjectedState",
    "DmrgOptions",
    "DmrgResult",
    "dmrg",
    "TdvpOptions",
    "tdvp",
    "LinsolveOptions",
    "LinsolveResult",
    "LinsolveVerifyReport",
    "square_linsolve",
    "GseOptions",
    "GseResult",
    "global_subspace_expand",
    "global_subspace_expand_with_references",
    "gse_expand",
    "gse_tdvp",
]
