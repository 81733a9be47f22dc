"""Interpolative QTT: Chebyshev-Lagrange construction without TCI.

TPU-native rebuild of tensor4all-interpolativeqtt
(crates/tensor4all-interpolativeqtt/src/interpolation.rs:47-460
single/multi-scale/adaptive variants, basis.rs LagrangePolynomials +
Chebyshev grid): the multiscale identity
``f((s + y)/2) ≈ sum_b f((s + t_b)/2) L_b(y)`` unrolled over R binary
scales gives explicit TT cores of bond dimension K (the number of
Chebyshev nodes) — no function-adaptive pivoting needed, only K*2*K
Lagrange evaluations per scale plus 2K function samples.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import numpy as np

from ..tt.tensortrain import TensorTrain


def chebyshev_nodes(K: int) -> np.ndarray:
    """K Chebyshev points on [0, 1] (ref basis.rs chebyshev grid)."""
    j = np.arange(K)
    return 0.5 * (1.0 - np.cos(np.pi * (j + 0.5) / K))


def lagrange_basis(nodes: np.ndarray, y: np.ndarray) -> np.ndarray:
    """L[b, m] = ell_b(y_m), barycentric form (ref LagrangePolynomials)."""
    nodes = np.asarray(nodes, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    K = nodes.shape[0]
    # barycentric weights
    diff = nodes[:, None] - nodes[None, :]
    np.fill_diagonal(diff, 1.0)
    w = 1.0 / diff.prod(axis=1)
    d = y[None, :] - nodes[:, None]  # (K, M)
    exact = np.isclose(d, 0.0, atol=1e-15)
    d_safe = np.where(exact, 1.0, d)
    terms = w[:, None] / d_safe
    denom = terms.sum(axis=0)
    L = terms / denom[None, :]
    # exact node hits
    hit_cols = exact.any(axis=0)
    if hit_cols.any():
        L[:, hit_cols] = exact[:, hit_cols].astype(np.float64)
    return L


@dataclasses.dataclass
class InterpolativeQtt:
    tt: TensorTrain
    R: int
    K: int
    lower: float
    upper: float

    def evaluate(self, x: np.ndarray) -> np.ndarray:
        x = np.atleast_1d(np.asarray(x, dtype=np.float64))
        u = (x - self.lower) / (self.upper - self.lower)
        m = np.clip((u * 2 ** self.R).astype(np.int64), 0, 2 ** self.R - 1)
        shifts = np.arange(self.R - 1, -1, -1)
        bits = (m[:, None] >> shifts[None, :]) & 1
        return np.asarray(self.tt.evaluate_batch(bits))


def interpolative_qtt(
    f: Callable[[np.ndarray], np.ndarray],
    R: int,
    K: int = 16,
    lower: float = 0.0,
    upper: float = 1.0,
) -> InterpolativeQtt:
    """Build a quantics TT of ``f`` on [lower, upper) with R binary scales
    and K Chebyshev nodes per scale (ref interpolation.rs:47 single-scale
    construction; bond dimension = K).

    `f` must accept arbitrary real points in the interval (vectorized).
    """
    t = chebyshev_nodes(K)
    width = upper - lower
    # first core: f sampled at depth-1 points (s + t_b)/2
    first = np.empty((1, 2, K))
    for s in (0, 1):
        pts = lower + width * (s + t) / 2.0
        first[0, s, :] = np.asarray(f(pts))
    # middle cores: ell_a((s + t_b)/2)
    mid = np.empty((K, 2, K))
    for s in (0, 1):
        mid[:, s, :] = lagrange_basis(t, (s + t) / 2.0)
    # last core: ell_a(s/2)
    last = np.empty((K, 2, 1))
    for s in (0, 1):
        last[:, s, 0] = lagrange_basis(t, np.asarray([s / 2.0]))[:, 0]
    cores = [first] + [mid.copy() for _ in range(R - 2)] + [last]
    if R == 1:
        # single scale: just sample both points
        pts = lower + width * np.asarray([0.0, 0.5])
        cores = [np.asarray(f(pts)).reshape(1, 2, 1)]
    return InterpolativeQtt(TensorTrain(cores), R, K, lower, upper)


def adaptive_interpolative_qtt(
    f: Callable[[np.ndarray], np.ndarray],
    R: int,
    tol: float = 1e-10,
    K_min: int = 4,
    K_max: int = 40,
    lower: float = 0.0,
    upper: float = 1.0,
    n_check: int = 200,
    seed: int = 0,
) -> InterpolativeQtt:
    """Grow K until the sampled interpolation error meets `tol`
    (ref interpolation.rs adaptive variant)."""
    rng = np.random.default_rng(seed)
    m = rng.integers(0, 2 ** R, size=n_check)
    x = lower + (upper - lower) * m / 2 ** R
    fx = np.asarray(f(x))
    scale = np.abs(fx).max() or 1.0
    K = K_min
    while True:
        q = interpolative_qtt(f, R, K, lower, upper)
        err = np.abs(q.evaluate(x) - fx).max() / scale
        if err <= tol or K >= K_max:
            return q
        K = min(K * 2, K_max)
