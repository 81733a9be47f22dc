"""Fully-jitted TDVP engine for star topologies (hub + K single-site
leaves) — `ops.dmrg_star`'s design applied to time evolution, matching
`treetn/tdvp.py`'s tree projector-splitting plan (ref tdvp/plan.rs):

forward half-sweep (coefficient +delta on edges, -delta on the hub
one-site corrections between them):

    edge(hub,0) ; site(hub) ; edge(hub,1) ; ... ; edge(hub,K-1)

order 2 appends the exact mirror (palindromic composition, each half at
dt/2). Every local exponential is a fixed-m Lanczos propagator with the
GEMM-only tridiagonal exp(cT)e0 (`ops.tdvp_chain._expm_tridiag_e0`);
splits are exact (leaf Schmidt rank <= d) and keep the center at the
hub. The whole multi-step run is ONE XLA program.

Real `sweep dtype` serves imaginary time in real arithmetic; complex
dtypes serve real time — same contract as `ops.tdvp_chain.tdvp_run`.
Like ops.dmrg_star this is a latency-bound CPU-first engine (see the
backend note there); large-chi evolution belongs to ops/tdvp_chain.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dmrg_star import _BOND_LETTERS, _edge_einsum_specs, star_pair_terms  # noqa: F401
from .tdvp_chain import _expm_tridiag_e0


def tdvp_star_run(
    A: jnp.ndarray,
    B: jnp.ndarray,
    h_hub: jnp.ndarray,
    hub0: jnp.ndarray,
    leaves0: jnp.ndarray,
    t: complex,
    nsteps: int = 1,
    order: int = 2,
    krylov_m: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evolve ``exp(t * H)`` on a K-leaf star; returns (hub, leaves).

    H = sum_k sum_a A[k,a] (x) B[k,a] + h_hub (shapes as in
    `ops.dmrg_star.dmrg_star_run`). The state is gauged (leaves
    right-canonical toward the hub) and normalized inside the program.
    """
    if order not in (1, 2):
        raise ValueError("order must be 1 or 2")
    dt = jnp.result_type(A.dtype, hub0.dtype,
                         jnp.complex64 if isinstance(t, complex)
                         and t.imag != 0 else A.dtype)
    return _tdvp_star_jit(A.astype(dt), B.astype(dt), h_hub.astype(dt),
                          hub0.astype(dt), leaves0.astype(dt),
                          jnp.asarray(t), int(nsteps), int(order),
                          int(krylov_m))


def _star_tdvp_engine(A, B, h_hub, hub0, leaves0, t, nsteps, order, m):
    K = A.shape[0]
    dt_ = A.dtype
    real_dt = jnp.finfo(dt_).dtype
    specs = _edge_einsum_specs(K)
    bonds = _BOND_LETTERS[:K]
    hub_sub = "s" + bonds

    def norm_of(x):
        return jnp.sqrt(jnp.sum(jnp.abs(x) ** 2).astype(jnp.float64))

    def gauge(hub, leaves):
        new_leaves = []
        for k in range(K):
            Lk = leaves[k]
            U, S, Vh = jnp.linalg.svd(Lk, full_matrices=False)
            new_leaves.append(Vh)
            M = U * S[None, :]
            out = hub_sub.replace(bonds[k], "z")
            hub = jnp.einsum(f"{hub_sub},{bonds[k]}z->{out}", hub, M)
        hub = hub / jnp.maximum(norm_of(hub), 1e-300).astype(dt_)
        return hub, jnp.stack(new_leaves)

    def envs_of(leaves):
        return jnp.einsum("kbs,kast,kct->kabc", leaves, B,
                          jnp.conj(leaves))

    def lanczos_expm(apply_h, v0, coeff):
        n0 = norm_of(v0)
        v = v0 / jnp.maximum(n0, 1e-300).astype(dt_)
        basis = jnp.zeros((m,) + v0.shape, dt_)
        alphas = jnp.zeros((m,), jnp.float64)
        betas = jnp.zeros((m,), jnp.float64)
        amask = jnp.zeros((m,), jnp.float64)

        def body(i, carry):
            basis, alphas, betas, amask, v, v_prev, b_prev, alive = carry
            basis = basis.at[i].set(v * alive.astype(dt_))
            hv = apply_h(v)
            a_ = jnp.real(jnp.sum(jnp.conj(v) * hv))
            hv = hv - a_.astype(dt_) * v - b_prev.astype(dt_) * v_prev
            ov = jnp.einsum("m...,...->m", jnp.conj(basis), hv)
            mask = (jnp.arange(m) <= i).astype(dt_)
            hv = hv - jnp.einsum("m,m...->...", ov * mask, basis)
            b = norm_of(hv)
            v_next = hv / jnp.maximum(b, 1e-300).astype(dt_)
            alphas = alphas.at[i].set(
                jnp.where(alive > 0, a_.astype(jnp.float64), 0.0))
            amask = amask.at[i].set(alive)
            eps = jnp.asarray(10 * jnp.finfo(dt_).eps, jnp.float64)
            next_alive = alive * (b > eps * jnp.maximum(
                1.0, jnp.abs(a_).astype(jnp.float64)))
            betas = betas.at[i].set(b * (i + 1 < m) * next_alive)
            return (basis, alphas, betas, amask, v_next, v,
                    b * alive, next_alive)

        carry = (basis, alphas, betas, amask, v, jnp.zeros_like(v),
                 jnp.float64(0.0), jnp.float64(1.0))
        basis, alphas, betas, amask, _, _, _, _ = jax.lax.fori_loop(
            0, m, body, carry)
        if jnp.issubdtype(dt_, jnp.complexfloating):
            c = jnp.asarray(coeff, jnp.result_type(real_dt,
                                                   jnp.complex64))
        else:
            c = jnp.real(jnp.asarray(coeff, real_dt))
        coef = _expm_tridiag_e0(alphas.astype(real_dt),
                                betas.astype(real_dt), c)
        coef = coef * amask
        out = jnp.einsum("m,m...->...", coef.astype(dt_), basis)
        return out * n0.astype(dt_)

    def apply_edge(k, E):
        _, direct, env_specs, field, _ = specs[k]

        def f(th):
            y = jnp.einsum(field, h_hub, th)
            y = y + jnp.einsum("r" + direct.replace(",", ",r", 1),
                               A[k], B[k], th)
            for j in range(K):
                if j == k:
                    continue
                y = y + jnp.einsum(
                    "r" + env_specs[j].replace(",", ",r", 1),
                    A[j], E[j], th)
            return y
        return f

    def apply_hub(E):
        # one-site H_eff on the hub: every leg through its env
        def f(hub):
            y = jnp.einsum(f"xs,{hub_sub}->" + hub_sub.replace("s", "x"),
                           h_hub, hub)
            for j in range(K):
                out = hub_sub.replace("s", "x").replace(bonds[j], "y")
                y = y + jnp.einsum(
                    f"rxs,ry{bonds[j]},{hub_sub}->{out}",
                    A[j], E[j], hub)
            return y
        return f

    def evolve_edge(k, hub, leaves, E, delta):
        contract, _, _, _, theta_sub = specs[k]
        theta0 = jnp.einsum(contract, hub, leaves[k])
        theta = lanczos_expm(apply_edge(k, E), theta0, delta)
        perm = theta_sub.index("t")
        d = theta.shape[perm]
        th_mat = jnp.moveaxis(theta, perm, -1).reshape(-1, d)
        U, S, Vh = jnp.linalg.svd(th_mat, full_matrices=False)
        leaf_new = Vh
        hub_new = (U * S[None, :]).reshape(
            theta.shape[:perm] + theta.shape[perm + 1:] + (d,))
        hub_new = jnp.moveaxis(hub_new, -1, perm)
        leaves = leaves.at[k].set(leaf_new)
        E = E.at[k].set(jnp.einsum("bs,ast,ct->abc", leaf_new, B[k],
                                   jnp.conj(leaf_new)))
        return hub_new, leaves, E

    # plan: fwd = [edge 0, site, edge 1, site, ..., edge K-1];
    # order 2 appends the mirror
    plan = []
    for k in range(K):
        if k > 0:
            plan.append(("site", None))
        plan.append(("edge", k))
    if order == 2:
        plan = plan + list(reversed(plan))

    coeff_dtype = (jnp.complex128
                   if jnp.issubdtype(dt_, jnp.complexfloating)
                   else jnp.float64)
    step_dt = jnp.asarray(t, coeff_dtype) / nsteps
    delta = step_dt / 2.0 if order == 2 else step_dt

    def one_step(_, state):
        hub, leaves, E = state
        for kind, k in plan:
            if kind == "edge":
                hub, leaves, E = evolve_edge(k, hub, leaves, E, delta)
            else:
                hub = lanczos_expm(apply_hub(E), hub, -delta)
        return hub, leaves, E

    hub, leaves = gauge(hub0, leaves0)
    E = envs_of(leaves)
    hub, leaves, _ = jax.lax.fori_loop(0, nsteps, one_step,
                                       (hub, leaves, E))
    return hub, leaves


_tdvp_star_jit = jax.jit(_star_tdvp_engine,
                         static_argnames=("nsteps", "order", "m"))


def tdvp_star_heisenberg(K: int, t: complex, J: float = 1.0,
                         h: float = 0.0, nsteps: int = 2,
                         order: int = 2, krylov_m: int = 10,
                         seed: int = 0, dtype=jnp.complex128):
    """Convenience driver: Heisenberg on a K-leaf star from a seeded
    random start (the journal benchmark shape). Returns (hub, leaves)."""
    from ..models.spin import SM, SP, SZ

    A, B, h_hub = star_pair_terms(
        pass_ops=[SZ, SP, SM],
        complete_ops=[J * SZ, (J / 2) * SM, (J / 2) * SP],
        K=K,
        onsite_hub=(h * SZ if h else None),
        onsite_leaf=(h * SZ if h else None),
        dtype=dtype,
    )
    rng = np.random.default_rng(seed)
    d = 2
    hub0 = jnp.asarray(rng.standard_normal((d,) * (K + 1)), dtype)
    leaves0 = jnp.asarray(rng.standard_normal((K, d, d)), dtype)
    return tdvp_star_run(A, B, h_hub, hub0, leaves0, t, nsteps=nsteps,
                         order=order, krylov_m=krylov_m)


def tdvp_star_heisenberg_legs(K: int, L: int, t: complex,
                              J: float = 1.0, h: float = 0.0,
                              nsteps: int = 2, order: int = 2,
                              krylov_m: int = 10, seed: int = 0,
                              dtype=jnp.complex128):
    """Heisenberg time evolution on a star with K chain legs of length
    L via the exact dressed-leaf reduction
    (ops.dmrg_star.star_chain_legs_terms): composite d**L leaves, hub
    dimension d. Returns (hub, leaves);
    `ops.dmrg_star.unfold_composite_leaf` recovers leg cores."""
    from ..models.spin import SM, SP, SZ
    from .dmrg_star import star_chain_legs_terms

    A, B, h_hub = star_chain_legs_terms(
        pass_ops=[SZ, SP, SM],
        complete_ops=[J * SZ, (J / 2) * SM, (J / 2) * SP],
        K=K, L=L,
        onsite_hub=(h * SZ if h else None),
        onsite_leaf=(h * SZ if h else None),
        dtype=dtype,
    )
    rng = np.random.default_rng(seed)
    d, D = 2, 2 ** L
    hub0 = jnp.asarray(rng.standard_normal((d,) + (D,) * K), dtype)
    leaves0 = jnp.asarray(rng.standard_normal((K, D, D)), dtype)
    return tdvp_star_run(A, B, h_hub, hub0, leaves0, t, nsteps=nsteps,
                         order=order, krylov_m=krylov_m)
