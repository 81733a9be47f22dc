"""Canonical TT forms: center-canonical and Vidal (Gamma-Lambda).

TPU-native rebuild of tensor4all-simplett/src/canonical.rs:1-515
(`SiteTensorTrain`) and vidal.rs:1-749 (`VidalTensorTrain`).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp

from ..config import SvdTruncationPolicy
from ..core.decomp import truncated_svd_matrix
from .tensortrain import TensorTrain


class SiteTensorTrain:
    """Center-canonical TT: cores left of `center` are left-isometric,
    cores right of it right-isometric (ref canonical.rs `SiteTensorTrain`)."""

    def __init__(self, cores, center: int):
        self.tt = TensorTrain(cores)
        if not 0 <= center < len(self.tt):
            raise ValueError("center out of range")
        self.center = center

    @staticmethod
    def from_tt(tt: TensorTrain, center: int = 0) -> "SiteTensorTrain":
        from .compression import right_orthogonalize

        t = right_orthogonalize(tt)
        s = SiteTensorTrain(t.cores, 0)
        s.move_center(center)
        return s

    @property
    def cores(self):
        return self.tt.cores

    def move_center(self, new_center: int) -> "SiteTensorTrain":
        """QR-shift the orthogonality center (ref canonical.rs moves)."""
        cores = list(self.tt.cores)
        c = self.center
        while c < new_center:
            r0, d, r1 = cores[c].shape
            q, r = jnp.linalg.qr(cores[c].reshape(r0 * d, r1), mode="reduced")
            cores[c] = q.reshape(r0, d, q.shape[1])
            cores[c + 1] = jnp.tensordot(r, cores[c + 1], axes=[[1], [0]])
            c += 1
        while c > new_center:
            r0, d, r1 = cores[c].shape
            qt, rt = jnp.linalg.qr(cores[c].reshape(r0, d * r1).T, mode="reduced")
            cores[c] = qt.T.reshape(qt.shape[1], d, r1)
            cores[c - 1] = jnp.tensordot(cores[c - 1], rt.T, axes=[[2], [0]])
            c -= 1
        self.tt = TensorTrain(cores)
        self.center = c
        return self

    def to_tt(self) -> TensorTrain:
        return self.tt.copy()


class VidalTensorTrain:
    """Vidal form: Gamma cores + explicit bond singular values Lambda
    (ref vidal.rs `VidalTensorTrain`). ``gammas[k] : (r_k, d, r_{k+1})``,
    ``lambdas[k] : (r_{k+1},)`` for k < L-1."""

    def __init__(self, gammas: List[jnp.ndarray], lambdas: List[jnp.ndarray]):
        if len(lambdas) != len(gammas) - 1:
            raise ValueError("need L-1 lambda vectors")
        self.gammas = [jnp.asarray(g) for g in gammas]
        self.lambdas = [jnp.asarray(l) for l in lambdas]

    @staticmethod
    def from_tt(
        tt: TensorTrain,
        policy: Optional[SvdTruncationPolicy] = None,
    ) -> "VidalTensorTrain":
        """Left-orthogonalize, then SVD right-to-left extracting Lambdas."""
        from .compression import left_orthogonalize

        cores = list(left_orthogonalize(tt).cores)
        L = len(cores)
        policy = policy or SvdTruncationPolicy()
        lambdas: List[jnp.ndarray] = [None] * (L - 1)
        # right-to-left: split S off each bond
        for k in range(L - 1, 0, -1):
            r0, d, r1 = cores[k].shape
            u, s, vh, _ = truncated_svd_matrix(cores[k].reshape(r0, d * r1), policy)
            rk = u.shape[1]
            lambdas[k - 1] = s
            cores[k] = vh.reshape(rk, d, r1)
            # absorb U*S leftward: keeps the product intact and makes the
            # stored lambdas the true Schmidt coefficients of bond k-1
            cores[k - 1] = jnp.tensordot(
                cores[k - 1], u * s[None, :], axes=[[2], [0]]
            )
        # cores[] is now center-at-0 with B-matrices; extract gammas:
        # gamma_k = B_k / lambda_{k-1} on the left bond
        gammas = [cores[0]]
        for k in range(1, L):
            inv = jnp.where(lambdas[k - 1] > 0, 1.0 / lambdas[k - 1], 0.0)
            gammas.append(cores[k] * inv[:, None, None])
        return VidalTensorTrain(gammas, lambdas)

    def to_tt(self) -> TensorTrain:
        """Back to plain TT by absorbing each Lambda leftward."""
        cores = [self.gammas[0]]
        for k in range(1, len(self.gammas)):
            lam = self.lambdas[k - 1]
            cores.append(self.gammas[k] * lam[:, None, None])
        return TensorTrain(cores)

    @property
    def ranks(self):
        return [int(l.shape[0]) for l in self.lambdas]
