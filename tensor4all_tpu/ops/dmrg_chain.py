"""Fully-jitted two-site DMRG engine for chains (the hot path).

This is the bucket-and-mask design of SURVEY.md §7 applied to DMRG: every
MPS core is zero-padded to a static (chi, d, chi) shape (boundaries
embedded at slot 0), so an ENTIRE multi-sweep DMRG run is one XLA program
— no host round trips, no recompilation as ranks grow, every kernel on
the MXU. Zero-padding is self-consistent: padded rows/columns stay zero
through contractions, SVD produces zero singular values for them, and the
top-chi split keeps real content while garbage singular vectors are
annihilated by the zero rows they multiply.

The flexible host-driven TreeTN DMRG (treetn.dmrg) shares the same
algorithm; this engine is the speed-of-light path for chain topologies
(the reference's headline benchmark, BASELINE.md row 1).

Local eigensolver: fixed-iteration Lanczos on the two-site block with the
(chi, w, chi) environments applied as one einsum per iteration, and the
tridiagonal eigenproblem solved on device.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pad_mps(cores: List[jnp.ndarray], chi: int) -> jnp.ndarray:
    """Zero-pad rank-3 cores to a stacked (N, chi, d, chi) array."""
    N = len(cores)
    d = cores[0].shape[1]
    out = np.zeros((N, chi, d, chi), dtype=np.asarray(cores[0]).dtype)
    for k, c in enumerate(cores):
        a, dd, b = c.shape
        if a > chi or b > chi:
            raise ValueError(f"core {k} exceeds chi={chi}: {c.shape}")
        out[k, :a, :, :b] = np.asarray(c)
    return jnp.asarray(out)


def pad_mpo(cores: List[jnp.ndarray]) -> jnp.ndarray:
    """Stack rank-4 MPO cores to (N, w, d, d, w), boundaries at slot 0."""
    w = max(max(c.shape[0], c.shape[-1]) for c in cores)
    N = len(cores)
    d = cores[0].shape[1]
    out = np.zeros((N, w, d, d, w), dtype=np.asarray(cores[0]).dtype)
    for k, c in enumerate(cores):
        l, _, _, r = c.shape
        out[k, :l, :, :, :r] = np.asarray(c)
    return jnp.asarray(out)


@functools.partial(jax.jit, static_argnames=("n_sweeps", "lanczos_iters"))
def dmrg_run(h: jnp.ndarray, mps0: jnp.ndarray, n_sweeps: int = 4,
             lanczos_iters: int = 20) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run `n_sweeps` full (left-right-left) two-site DMRG sweeps.

    Args:
      h: (N, w, d, d, w) padded MPO (boundary slots 0).
      mps0: (N, chi, d, chi) padded MPS (right-canonical-ish start is
        fine; the first half-sweep canonicalizes implicitly through SVD).
    Returns (energy, optimized padded MPS).
    """
    N, chi, d, _ = mps0.shape
    w = h.shape[1]
    dtype = mps0.dtype

    def norm_site(A):
        n = jnp.sqrt(jnp.sum(jnp.abs(A) ** 2))
        return A / jnp.where(n > 0, n, 1.0)

    def lanczos_ground(theta0, L, Wl, Wr, R, m):
        """Lowest eigvec of the projected 2-site H by fixed-m Lanczos
        (static m: later sweeps need few iterations, scheduled by caller;
        a breakdown guard zeroes betas once the Krylov space is exhausted)."""

        def apply_h(th):
            # th (ket): (a, i1, i2, b); W axes (l, out, in, r);
            # envs (ket bond, mpo bond, bra bond)
            return jnp.einsum(
                "alx,lpim,mqjr,aijb,brB->xpqB",
                L, Wl, Wr, th, R, optimize=True,
            )

        v0 = norm_site(theta0)
        basis = jnp.zeros((m, chi, d, d, chi), dtype)
        # large (but square-safe on TPU's emulated f64) inactive diagonal
        # keeps eigh's minimum inside the active block
        alphas = jnp.full((m,), 1e8, jnp.float64)
        betas = jnp.zeros((m,), jnp.float64)

        def body(i, carry):
            basis, alphas, betas, v, v_prev, beta_prev, alive = carry
            basis = basis.at[i].set(v * alive)
            hv = apply_h(v)
            a = jnp.real(jnp.sum(jnp.conj(v) * hv))
            hv = hv - a * v - beta_prev * v_prev
            # full reorthogonalization against the stored basis
            ov = jnp.einsum("macuy,acuy->m", jnp.conj(basis), hv)
            mask = (jnp.arange(m) <= i).astype(hv.dtype)
            hv = hv - jnp.einsum("m,macuy->acuy", ov * mask, basis)
            b = jnp.sqrt(jnp.sum(jnp.abs(hv) ** 2))
            v_next = hv / jnp.where(b > 1e-300, b, 1.0)
            alphas = jnp.where(alive > 0, alphas.at[i].set(a), alphas)
            next_alive = alive * (jnp.real(b) > 1e-13 * jnp.maximum(
                1.0, jnp.abs(a)))
            betas = betas.at[i].set(
                jnp.real(b) * (i + 1 < m) * next_alive
            )
            return (basis, alphas, betas, v_next, v, jnp.real(b) * alive,
                    next_alive)

        carry = (basis, alphas, betas, v0, jnp.zeros_like(v0),
                 jnp.float64(0.0), jnp.float64(1.0))
        basis, alphas, betas, _, _, _, _ = jax.lax.fori_loop(
            0, m, body, carry
        )
        T = (jnp.diag(alphas) + jnp.diag(betas[:-1], 1)
             + jnp.diag(betas[:-1], -1))
        evals, evecs = jnp.linalg.eigh(T)
        coef = evecs[:, 0]
        theta = jnp.einsum("m,macuy->acuy", coef.astype(dtype), basis)
        return jnp.real(evals[0]), norm_site(theta)

    def split_theta(theta, toward_right):
        """SVD split keeping chi; returns (left core, right core)."""
        mat = theta.reshape(chi * d, d * chi)
        U, S, Vh = jnp.linalg.svd(mat, full_matrices=False)
        U, S, Vh = U[:, :chi], S[:chi], Vh[:chi, :]
        if toward_right:
            left = U.reshape(chi, d, chi)
            right = (S[:, None] * Vh).reshape(chi, d, chi)
        else:
            left = (U * S[None, :]).reshape(chi, d, chi)
            right = Vh.reshape(chi, d, chi)
        return left, right

    def update_left_env(L, A, W):
        # ket A carries the operator input leg, bra conj(A) the output
        return jnp.einsum("alx,aib,loir,xoB->brB", L, A, W, jnp.conj(A),
                          optimize=True)

    def update_right_env(R, A, W):
        return jnp.einsum("brB,aib,loir,xoB->alx", R, A, W, jnp.conj(A),
                          optimize=True)

    L_bound = jnp.zeros((chi, w, chi), dtype).at[0, 0, 0].set(1.0)
    R_bound = jnp.zeros((chi, w, chi), dtype).at[0, 0, 0].set(1.0)

    def get(stacked, k):
        return jax.lax.dynamic_index_in_dim(stacked, k, keepdims=False)

    def put(stacked, k, val):
        return jax.lax.dynamic_update_index_in_dim(stacked, val, k, axis=0)

    def right_env_scan(mps):
        """Rs[k] = env right of bond (k, k+1), k = 0..N-2."""

        def body(R, k):
            Rn = update_right_env(R, get(mps, k), get(h, k))
            return Rn, Rn

        _, Rs = jax.lax.scan(body, R_bound,
                             jnp.arange(N - 1, 0, -1))
        return jnp.flip(Rs, axis=0)  # Rs[k-1] built at step for site k

    # uniform Lanczos depth: aggressive tapering schedules stall the final
    # polish (local problems need ~m iterations to hit 1e-14 energy)
    m = lanczos_iters

    def one_sweep(_, state):
        mps, energy = state

        def fwd_body(carry, x, m=m):
            k, Rk = x
            mps, L, _ = carry
            A, B = get(mps, k), get(mps, k + 1)
            theta0 = jnp.einsum("asb,btc->astc", A, B)
            e, theta = lanczos_ground(theta0, L, get(h, k),
                                      get(h, k + 1), Rk, m)
            left, right = split_theta(theta, toward_right=True)
            mps = put(put(mps, k, left), k + 1, right)
            L_next = update_left_env(L, left, get(h, k))
            return (mps, L_next, e), L

        def bwd_body(carry, x, m=m):
            k, Lk = x
            mps, R, _ = carry
            A, B = get(mps, k), get(mps, k + 1)
            theta0 = jnp.einsum("asb,btc->astc", A, B)
            e, theta = lanczos_ground(theta0, Lk, get(h, k),
                                      get(h, k + 1), R, m)
            left, right = split_theta(theta, toward_right=False)
            mps = put(put(mps, k, left), k + 1, right)
            R_next = update_right_env(R, right, get(h, k + 1))
            return (mps, R_next, e), None

        Rs = right_env_scan(mps)  # Rs[k] = env right of bond (k, k+1)
        (mps, _, energy), Ls = jax.lax.scan(
            fwd_body, (mps, L_bound, energy),
            (jnp.arange(N - 1), Rs),
        )
        # Ls[k] = env left of bond (k, k+1), from the forward pass
        (mps, _, energy), _ = jax.lax.scan(
            bwd_body, (mps, R_bound, energy),
            (jnp.arange(N - 2, -1, -1), jnp.flip(Ls, axis=0)),
        )
        return mps, energy

    # sweeps share one compiled body: fori_loop keeps the program small
    # (remote TPU compiles are expensive)
    mps, energy = jax.lax.fori_loop(
        0, n_sweeps, one_sweep, (mps0, jnp.float64(0.0))
    )
    return energy, mps


def treeoperator_to_mpo_cores(op, order) -> List[np.ndarray]:
    """Chain TreeOperator -> plain (l, o, i, r) MPO core list."""
    cores = []
    net = op.network
    for pos, v in enumerate(order):
        t = net.tensor(v)
        axes = []
        if pos > 0:
            axes.append(net.bond(order[pos - 1], v))
        axes.append(op.site_out[v])
        axes.append(op.site_in[v])
        if pos < len(order) - 1:
            axes.append(net.bond(v, order[pos + 1]))
        arr = np.asarray(t.dense(tuple(axes)))
        if pos == 0:
            arr = arr[None, ...]
        if pos == len(order) - 1:
            arr = arr[..., None]
        cores.append(arr)
    return cores


def dmrg_chain(
    h_cores: List[np.ndarray],
    chi: int,
    n_sweeps: int = 4,
    lanczos_iters: int = 20,
    key=None,
    init_cores: Optional[List[np.ndarray]] = None,
    dtype=jnp.float64,
) -> Tuple[float, jnp.ndarray]:
    """Convenience driver: pad, jit-run, return (energy, padded MPS)."""
    N = len(h_cores)
    d = h_cores[0].shape[1]
    h = pad_mpo([jnp.asarray(c, dtype) for c in h_cores])
    if init_cores is None:
        from ..tt.tensortrain import TensorTrain

        key = key if key is not None else jax.random.PRNGKey(0)
        tt = TensorTrain.random(key, [d] * N, rank=chi, dtype=dtype)
        init_cores = tt.cores
    # right-orthogonalize so the first forward pass sees exact projected
    # problems (otherwise the first sweep solves a skewed local problem)
    from ..tt.compression import right_orthogonalize
    from ..tt.tensortrain import TensorTrain as _TT

    tt0 = right_orthogonalize(_TT([jnp.asarray(c, dtype)
                                   for c in init_cores]))
    nrm = jnp.sqrt(jnp.sum(jnp.abs(tt0.cores[0]) ** 2))
    cores0 = list(tt0.cores)
    cores0[0] = cores0[0] / jnp.where(nrm > 0, nrm, 1.0)
    mps0 = pad_mps(cores0, chi)
    e, mps = dmrg_run(h, mps0, n_sweeps=n_sweeps,
                      lanczos_iters=lanczos_iters)
    return e, mps
