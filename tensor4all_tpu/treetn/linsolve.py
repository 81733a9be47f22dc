"""square_linsolve: solve (a0 + a1*A)|x> = |b> on tree tensor networks.

TPU-native rebuild of tensor4all-treetn/src/linsolve/square/
(mod.rs:137 entry, updater.rs `SquareLinsolveUpdater`, local_linop.rs,
LinsolveOptions/GmresToleranceMode in common/): canonicalize x, walk the
Euler tour with two-site regions, solve each local projected system
``(a0 + a1 A_proj) theta = b_proj`` with GMRES (core.krylov), split with
truncation, move the center, update cached environments. Ends with a
residual verification report (ref LinsolveVerifyReport, updater.rs).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..config import (
    SingularValueMeasure,
    SvdTruncationPolicy,
    ThresholdScale,
)
from ..core.contract import contract
from ..core.decomp import Canonical, svd_two
from ..core.krylov import gmres
from .network import TreeTN, NodeName
from .operator import TreeOperator
from .projected import ProjectedOperator, ProjectedState


@dataclasses.dataclass
class LinsolveOptions:
    """Ref: LinsolveOptions (linsolve/common)."""

    nsweeps: int = 4
    maxdim: int = 64
    cutoff: float = 1e-12
    gmres_rtol: float = 1e-10
    gmres_maxiter: int = 60
    a0: complex = 0.0
    a1: complex = 1.0
    residual_tol: float = 0.0  # stop early when verified residual below
    verbosity: int = 0
    mesh: object = None  # jax.sharding.Mesh: chi-partition two-site local solves

    def policy(self) -> SvdTruncationPolicy:
        return SvdTruncationPolicy(
            tol=self.cutoff,
            scale=ThresholdScale.RELATIVE,
            measure=SingularValueMeasure.SQUARED_TAIL,
            maxdim=self.maxdim,
        )


@dataclasses.dataclass
class LinsolveVerifyReport:
    """Ref: LinsolveVerifyReport (square/updater.rs)."""

    residual_norm: float
    rhs_norm: float

    @property
    def relative_residual(self) -> float:
        return self.residual_norm / self.rhs_norm if self.rhs_norm else 0.0


@dataclasses.dataclass
class LinsolveResult:
    x: TreeTN
    report: LinsolveVerifyReport
    converged: bool
    sweep_residuals: List[float]


def _verify(op: TreeOperator, x: TreeTN, b: TreeTN,
            opts: LinsolveOptions) -> LinsolveVerifyReport:
    """Residual ||a0 x + a1 A x - b|| via exact network arithmetic.

    Note: the norm of the difference network is evaluated through inner
    products whose cross terms cancel, so the smallest resolvable relative
    residual is ~sqrt(eps)*||b|| ≈ 1e-8 in f64 — residuals at or below
    that are at the metric's floor (the true residual may be far smaller).
    """
    ax = op.apply(x, method="naive")
    lhs = ax.scale(opts.a1)
    if opts.a0 != 0:
        lhs = lhs.add(x.scale(opts.a0))
    diff = lhs.add(b.scale(-1.0))
    return LinsolveVerifyReport(
        residual_norm=float(diff.norm()), rhs_norm=float(b.norm())
    )


def square_linsolve(
    op: TreeOperator,
    b: TreeTN,
    x0: TreeTN,
    center: Optional[NodeName] = None,
    options: Optional[LinsolveOptions] = None,
) -> LinsolveResult:
    """Solve ``(a0 + a1 A) x = b`` by local GMRES sweeps (ref mod.rs:137).

    `b` must share the site indices of `x0` (same physical space).
    """
    opts = options or LinsolveOptions()
    x = x0.copy()
    x.validate_tree()
    root = center if center is not None else x.node_names[0]
    x.canonicalize([root])
    proj_a = ProjectedOperator(op, x, mesh=opts.mesh)
    proj_b = ProjectedState(b, x)
    pol = opts.policy()
    sweep_residuals: List[float] = []
    converged = False
    if len(x.node_names) == 1:
        # Single-node network: no edges to sweep, solve the one local
        # problem directly (the Julia linsolve example is exactly this
        # shape, ref docs/examples/julia/treetn.jl "linsolve" anchor).
        theta0 = x.tensor(root)
        rhs = proj_b.project((root,))
        rhs = rhs.permute(theta0.indices) if set(rhs.indices) == set(
            theta0.indices
        ) else rhs

        def apply_single(th):
            y = proj_a.apply_local(th, (root,)) * opts.a1
            if opts.a0 != 0:
                y = y.axpby(opts.a0, th, 1.0)
            return y

        res = gmres(apply_single, rhs, x0=theta0,
                    rtol=opts.gmres_rtol, maxiter=opts.gmres_maxiter)
        x.set_tensor(root, res.x)
        report = _verify(op, x, b, opts)
        conv = (opts.residual_tol <= 0
                or report.relative_residual < opts.residual_tol)
        return LinsolveResult(x, report, conv,
                              [report.relative_residual])
    for sweep in range(opts.nsweeps):
        for (u, v) in x._euler_edges(root):
            bond = x.bond(u, v)
            tu, tv = x.tensor(u), x.tensor(v)
            theta0 = contract([tu, tv])
            rhs = proj_b.project((u, v))
            rhs = rhs.permute(theta0.indices) if set(rhs.indices) == set(
                theta0.indices
            ) else rhs

            def apply_local(th):
                y = proj_a.apply_local(th, (u, v)) * opts.a1
                if opts.a0 != 0:
                    y = y.axpby(opts.a0, th, 1.0)
                return y

            res = gmres(
                apply_local, rhs, x0=theta0,
                rtol=opts.gmres_rtol, maxiter=opts.gmres_maxiter,
            )
            theta = res.x
            u_side = tuple(i for i in tu.indices if i != bond)
            L, R, _ = svd_two(theta, u_side, pol, canonical=Canonical.LEFT)
            x.set_tensor(u, L)
            x.set_tensor(v, R)
            x.set_bond(u, v, L.indices[-1])
            x._set_ortho(u, v, v)
            proj_a.invalidate([u, v])
            proj_b.invalidate([u, v])
        rep = _verify(op, x, b, opts)
        sweep_residuals.append(rep.relative_residual)
        if opts.verbosity:
            print(f"[linsolve] sweep={sweep} rel_res={rep.relative_residual:.3e}")
        if opts.residual_tol > 0 and rep.relative_residual < opts.residual_tol:
            converged = True
            break
    report = _verify(op, x, b, opts)
    if opts.residual_tol > 0:
        converged = report.relative_residual < opts.residual_tol
    return LinsolveResult(x, report, converged, sweep_residuals)
