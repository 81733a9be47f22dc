"""GSE: global subspace expansion for TDVP on tree tensor networks.

TPU-native rebuild of tensor4all-treetn/src/gse.rs (:267 expansion, :296
Krylov reference states, :359 `gse_tdvp`, `GseOptions` :33): bond bases
are enriched with truncated Krylov reference states ``A^k |x>`` mixed into
a direct sum with small density weights, truncated at the expanded bond
dimension (rank-capped, cutoff-free so enrichment directions survive),
then the TDVP step runs on the enriched state. This counters the
projector-splitting integrator's inability to grow bond dimension in
poorly-represented directions.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from ..config import SvdTruncationPolicy
from .network import TreeTN, NodeName
from .operator import TreeOperator
from .tdvp import TdvpOptions, tdvp


@dataclasses.dataclass
class GseOptions:
    """Ref: GseOptions (gse.rs:33)."""

    krylov_dim: int = 2
    ref_maxdim: int = 32  # truncation of the Krylov reference states
    ref_cutoff: float = 1e-10
    weight: float = 1e-4  # density-matrix mixing weight
    expand_maxdim: int = 64  # bond cap after enrichment


def gse_expand(
    op: TreeOperator,
    state: TreeTN,
    options: Optional[GseOptions] = None,
) -> TreeTN:
    """Enrich the state's bond bases with Krylov references (ref :267)."""
    opts = options or GseOptions()
    nrm = float(state.norm())
    if nrm == 0:
        raise ValueError("zero state")
    refs: List[TreeTN] = []
    y = state
    for _ in range(opts.krylov_dim):
        y = op.apply(
            y,
            method="zipup",
            policy=SvdTruncationPolicy(tol=opts.ref_cutoff,
                                       maxdim=opts.ref_maxdim),
        )
        ny = float(y.norm())
        if ny == 0:
            break
        y = y.scale(1.0 / ny)
        refs.append(y)
    z = state
    w = opts.weight * nrm
    for y in refs:
        z = z.add(y.scale(w))
        w *= opts.weight
    # rank-capped, cutoff-free truncation keeps the enrichment directions
    z.truncate(SvdTruncationPolicy(tol=0.0, maxdim=opts.expand_maxdim))
    return z


def gse_tdvp(
    op: TreeOperator,
    init: TreeTN,
    t: complex,
    center: Optional[NodeName] = None,
    gse_options: Optional[GseOptions] = None,
    tdvp_options: Optional[TdvpOptions] = None,
) -> TreeTN:
    """Expand-then-evolve driver (ref gse.rs:359 `gse_tdvp`)."""
    g_opts = gse_options or GseOptions()
    t_opts = tdvp_options or TdvpOptions()
    state = init
    dt = t / t_opts.nsteps
    step_opts = dataclasses.replace(t_opts, nsteps=1)
    for _ in range(t_opts.nsteps):
        state = gse_expand(op, state, g_opts)
        state = tdvp(op, state, dt, center=center, options=step_opts)
    return state
