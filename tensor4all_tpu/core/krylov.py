"""Krylov solvers generic over a tensor vector space.

TPU-native rebuild of tensor4all-core/src/krylov.rs (`gmres` :889,
`hermitian_lanczos_lowest_eigenpair` :484, `hermitian_krylov_expm_multiply`
:640, restarted GMRES with truncation :2213).

The operand type only needs the `TensorVectorSpace` protocol
(ref tensor_like.rs:579): axpby / inner / norm / scale — satisfied by
``core.Tensor``, ``tt.TensorTrain`` (with truncation hooks), and plain jax
arrays via the `ArrayVS` adapter. Small dense Krylov subspace problems
(Hessenberg solves, tridiagonal eigs, expm) run on host-side jnp — they
are tiny; the heavy work is the caller's operator application.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Generic, List, Optional, Sequence, TypeVar

import jax.numpy as jnp
import numpy as np

V = TypeVar("V")


class VectorSpace:
    """Protocol adapter: override for non-Tensor operand types."""

    def axpby(self, a, x, b, y):  # a*x + b*y
        return y.axpby(a, x, b)

    def inner(self, x, y):  # <x|y>, conjugate-linear in x
        return complex(x.inner(y))

    def norm(self, x) -> float:
        return float(x.norm())

    def scale(self, a, x):
        return x * a

    def post(self, x):
        """Hook applied after every vector update (e.g. TT truncation —
        ref restart_gmres_with_truncation)."""
        return x


class ArrayVS(VectorSpace):
    def axpby(self, a, x, b, y):
        return a * x + b * y

    def inner(self, x, y):
        return complex(jnp.vdot(x, y))

    def norm(self, x):
        return float(jnp.linalg.norm(x))

    def scale(self, a, x):
        return a * x


@dataclasses.dataclass
class GmresResult(Generic[V]):
    """Ref: GmresResult (krylov.rs:230)."""

    x: V
    residual_norms: List[float]
    converged: bool
    n_iter: int


def gmres(
    apply_a: Callable[[V], V],
    b: V,
    x0: Optional[V] = None,
    vs: Optional[VectorSpace] = None,
    rtol: float = 1e-10,
    atol: float = 0.0,
    maxiter: int = 100,
    restart: Optional[int] = None,
) -> GmresResult:
    """Restarted GMRES for ``A x = b`` (ref krylov.rs:889).

    Modified Gram-Schmidt Arnoldi; the (m+1, m) Hessenberg least-squares
    problem is solved densely on host per restart cycle.
    """
    vs = vs or VectorSpace()
    restart = restart or maxiter
    bnorm = vs.norm(b)
    target = max(rtol * bnorm, atol)
    if bnorm == 0.0:
        return GmresResult(vs.scale(0.0, b), [0.0], True, 0)
    x = x0
    res_norms: List[float] = []
    total = 0
    while total < maxiter:
        if x is None:
            r = b
        else:
            r = vs.axpby(1.0, b, -1.0, vs.post(apply_a(x)))
        rnorm = vs.norm(r)
        res_norms.append(rnorm)
        if rnorm <= target:
            return GmresResult(x if x is not None else vs.scale(0.0, b),
                               res_norms, True, total)
        m = min(restart, maxiter - total)
        Vk: List[V] = [vs.scale(1.0 / rnorm, r)]
        H = np.zeros((m + 1, m), dtype=complex)
        k_used = 0
        for k in range(m):
            w = vs.post(apply_a(Vk[k]))
            for i in range(k + 1):
                H[i, k] = vs.inner(Vk[i], w)
                w = vs.axpby(-H[i, k], Vk[i], 1.0, w)
            H[k + 1, k] = vs.norm(w)
            k_used = k + 1
            total += 1
            # solve the small least-squares for current residual estimate
            e1 = np.zeros(k + 2, dtype=complex)
            e1[0] = rnorm
            y, res, _, _ = np.linalg.lstsq(H[: k + 2, : k + 1], e1, rcond=None)
            est = np.linalg.norm(H[: k + 2, : k + 1] @ y - e1)
            if H[k + 1, k].real <= 1e-14 * rnorm or est <= target or total >= maxiter:
                break
            Vk.append(vs.scale(1.0 / H[k + 1, k], w))
        e1 = np.zeros(k_used + 1, dtype=complex)
        e1[0] = rnorm
        y, _, _, _ = np.linalg.lstsq(H[: k_used + 1, :k_used], e1, rcond=None)
        dx = None
        for i in range(k_used):
            coef = y[i]
            if abs(coef) == 0:
                continue
            dx = vs.scale(coef, Vk[i]) if dx is None else vs.axpby(
                coef, Vk[i], 1.0, dx
            )
        if dx is not None:
            x = dx if x is None else vs.post(vs.axpby(1.0, dx, 1.0, x))
    if x is None:
        x = vs.scale(0.0, b)
    r = vs.axpby(1.0, b, -1.0, vs.post(apply_a(x)))
    rnorm = vs.norm(r)
    res_norms.append(rnorm)
    return GmresResult(x, res_norms, rnorm <= target, total)


def hermitian_lanczos_lowest_eigenpair(
    apply_a: Callable[[V], V],
    v0: V,
    vs: Optional[VectorSpace] = None,
    maxiter: int = 50,
    rtol: float = 1e-12,
) -> tuple:
    """Lowest eigenpair of Hermitian A (ref krylov.rs:484).

    Lanczos with full reorthogonalization (small maxiter) — the dense
    tridiagonal eigenproblem is solved on host.
    """
    vs = vs or VectorSpace()
    n0 = vs.norm(v0)
    if n0 == 0:
        raise ValueError("zero start vector")
    q = vs.scale(1.0 / n0, v0)
    Q: List[V] = [q]
    alphas: List[float] = []
    betas: List[float] = []
    prev_ev = None
    for k in range(maxiter):
        w = apply_a(Q[k])
        a_k = vs.inner(Q[k], w).real
        alphas.append(a_k)
        w = vs.axpby(-a_k, Q[k], 1.0, w)
        if k > 0:
            w = vs.axpby(-betas[-1], Q[k - 1], 1.0, w)
        # full reorthogonalization
        for qi in Q:
            c = vs.inner(qi, w)
            if abs(c) > 0:
                w = vs.axpby(-c, qi, 1.0, w)
        b_k = vs.norm(w)
        T = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
        evals, evecs = np.linalg.eigh(T)
        ev = evals[0]
        # residual estimate ||A x - ev x|| = beta_k * |last eigvec entry|
        res_est = b_k * abs(evecs[-1, 0])
        if res_est <= rtol * max(1.0, abs(ev)):
            break
        prev_ev = ev
        if b_k <= 1e-14 * max(1.0, abs(a_k)):
            break
        betas.append(b_k)
        Q.append(vs.scale(1.0 / b_k, w))
    T = np.diag(alphas) + np.diag(betas[: len(alphas) - 1], 1) + np.diag(
        betas[: len(alphas) - 1], -1
    )
    evals, evecs = np.linalg.eigh(T)
    coef = evecs[:, 0]
    x = None
    for c, qv in zip(coef, Q):
        x = vs.scale(c, qv) if x is None else vs.axpby(c, qv, 1.0, x)
    nx = vs.norm(x)
    x = vs.scale(1.0 / nx, x)
    return float(evals[0]), x


def hermitian_krylov_expm_multiply(
    apply_a: Callable[[V], V],
    v0: V,
    t: complex,
    vs: Optional[VectorSpace] = None,
    maxiter: int = 40,
    rtol: float = 1e-12,
) -> V:
    """``exp(t A) v0`` for Hermitian A (ref krylov.rs:640).

    Lanczos basis + dense expm of the tridiagonal projection
    (via eigh — exact for Hermitian T).
    """
    vs = vs or VectorSpace()
    n0 = vs.norm(v0)
    if n0 == 0:
        return v0
    Q: List[V] = [vs.scale(1.0 / n0, v0)]
    alphas: List[float] = []
    betas: List[float] = []
    prev = None
    for k in range(maxiter):
        w = apply_a(Q[k])
        a_k = vs.inner(Q[k], w).real
        alphas.append(a_k)
        w = vs.axpby(-a_k, Q[k], 1.0, w)
        if k > 0:
            w = vs.axpby(-betas[-1], Q[k - 1], 1.0, w)
        for qi in Q:
            c = vs.inner(qi, w)
            if abs(c) > 0:
                w = vs.axpby(-c, qi, 1.0, w)
        b_k = vs.norm(w)
        # current estimate of exp(tT) e1
        T = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
        evals, evecs = np.linalg.eigh(T)
        coef = evecs @ (np.exp(t * evals) * evecs[0, :].conj())
        if prev is not None and len(prev) == len(coef) - 1:
            err = abs(coef[-1])
            if err <= rtol * np.linalg.norm(coef):
                break
        prev = coef
        if b_k <= 1e-14 * max(1.0, abs(a_k)):
            break
        betas.append(b_k)
        Q.append(vs.scale(1.0 / b_k, w))
    T = np.diag(alphas) + np.diag(betas[: len(alphas) - 1], 1) + np.diag(
        betas[: len(alphas) - 1], -1
    )
    evals, evecs = np.linalg.eigh(T)
    coef = evecs @ (np.exp(t * evals) * evecs[0, :].conj())
    x = None
    for c, qv in zip(coef, Q):
        x = vs.scale(c, qv) if x is None else vs.axpby(c, qv, 1.0, x)
    return vs.scale(n0, x)
