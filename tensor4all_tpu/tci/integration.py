"""Multi-dimensional quadrature via TCI + Gauss-Kronrod nodes.

TPU-native rebuild of tensor4all-tensorci/src/integration.rs:1-823:
discretize each dimension on Gauss-Kronrod points, cross-interpolate the
integrand into a TT, and contract with the weight vectors (a rank-1
contraction — one matvec chain).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
from scipy.special import roots_legendre

from .tensorci2 import TCI2Options, crossinterpolate2


def gauss_kronrod_nodes(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Nodes/weights on [-1, 1].

    The reference embeds fixed GK(15/31/41/51/61) tables; we generate
    Gauss-Legendre rules of matching accuracy via scipy (orthogonal
    polynomial roots), which serves the same role for the TT quadrature.
    """
    x, w = roots_legendre(n)
    return x, w


@dataclasses.dataclass
class IntegrationResult:
    value: float
    tt_ranks: Sequence[int]
    n_evals: int


def integrate_tci(
    f_batch: Callable[[np.ndarray], np.ndarray],
    ndim: int,
    domain: Sequence[Tuple[float, float]] = None,
    n_nodes: int = 15,
    options: Optional[TCI2Options] = None,
) -> IntegrationResult:
    """Integrate ``f`` over a box by TCI2 on a GK grid.

    Args:
      f_batch: batched integrand over points, ``(B, ndim) floats -> (B,)``.
      domain: per-dim (a, b); default [0,1]^ndim.
    """
    if domain is None:
        domain = [(0.0, 1.0)] * ndim
    if len(domain) != ndim:
        raise ValueError("domain length mismatch")
    x01, w01 = gauss_kronrod_nodes(n_nodes)
    nodes, weights = [], []
    for (a, b) in domain:
        nodes.append(0.5 * (b - a) * (x01 + 1.0) + a)
        weights.append(0.5 * (b - a) * w01)
    nodes = np.stack(nodes)  # (ndim, n_nodes)
    weights = np.stack(weights)

    def grid_f(idx: np.ndarray) -> np.ndarray:
        pts = np.take_along_axis(nodes, idx.T, axis=1).T  # (B, ndim)
        return f_batch(pts)

    opts = options or TCI2Options(tol=1e-10, max_iter=20)
    tci, _, _ = crossinterpolate2(
        batch_f=grid_f, local_dims=[n_nodes] * ndim, options=opts
    )
    tt = tci.to_tensortrain()
    # contract TT with per-dim weight vectors: one matvec chain
    import jax.numpy as jnp

    v = jnp.ones((1,), dtype=tt.dtype)
    for k, core in enumerate(tt.cores):
        wk = jnp.asarray(weights[k])
        v = v @ jnp.einsum("adb,d->ab", core, wk)
    return IntegrationResult(
        value=float(v[0]),
        tt_ranks=tt.ranks,
        n_evals=tci.func.num_evals,
    )
