"""Fully-jitted two-site TDVP engine for chains (the hot path).

The bucket-and-mask design of ops.dmrg_chain applied to time evolution
(ref tensor4all-treetn/src/tdvp/mod.rs:1101, plan.rs): every MPS core is
zero-padded to a static (chi, d, chi) shape so an ENTIRE multi-step TDVP
run is one XLA program — no host round trips inside sweeps.

Integrator: Lubich projector splitting, order 1 or 2 (palindromic
half-sweeps). Local exponentials are fixed-m Lanczos propagators:
``exp(c * H_eff) v ~= |v| * V expm(c * T) e0`` with the small tridiagonal
exponential computed by GEMM-only scaling-and-squaring
(_expm_tridiag_e0). Splits reuse the warm-started
subspace-QR of the DMRG engine (top-chi subspace == TDVP's built-in
truncation). Precision strategy as in dmrg_chain: pass
``sweep_dtype=jnp.complex64`` on TPU; the state error eps from the lower
precision costs only O(eps) in the trajectory (and observables built as
Rayleigh quotients only O(eps^2)).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .dmrg_chain import pad_mpo, pad_mps  # noqa: F401 (re-export)


def _expm_tridiag_e0(diag: jnp.ndarray, offd: jnp.ndarray, coeff,
                     max_squarings: int = 20) -> jnp.ndarray:
    """First column of ``exp(coeff * T)`` for symmetric tridiagonal T.

    ``jnp.linalg.eigh`` on the m x m Ritz matrix costs ~555 us per call
    on a v5e (iterative kernel + emulated f64) and the TDVP engine runs
    it TWICE per bond. The propagator only needs exp(c T) e0, so this
    uses GEMM-only scaling-and-squaring: scale A = c T / 2^s to
    ||A||_1 <= 0.5 (s data-dependent, applied as masked squarings so the
    program stays static), a 12-term Taylor-Horner evaluation (error
    <= 0.5^13/13! ~ 2e-14), then s masked squarings. Everything is m x m
    matmuls — a few us total on the MXU at m <= 20.

    ``coeff`` may be real (imaginary time) or complex (real time on
    complex-capable backends); the arithmetic follows its dtype. Slots
    with zero diag AND zero offd (dead Lanczos directions) decouple:
    their column of exp is e_i, so they contribute 0 to column 0.
    """
    m = diag.shape[0]
    wt = jnp.result_type(diag.dtype, jnp.asarray(coeff).dtype)
    b = offd.at[m - 1].set(0.0).astype(wt)
    T = (jnp.diag(diag.astype(wt)) + jnp.diag(b[:-1], 1)
         + jnp.diag(b[:-1], -1))
    A = jnp.asarray(coeff, wt) * T
    nrm = jnp.max(jnp.sum(jnp.abs(A), axis=0))
    # number of halvings so ||A/2^s||_1 <= 0.5
    s = jnp.ceil(jnp.maximum(jnp.log2(nrm / 0.5), 0.0))
    s = jnp.minimum(s, max_squarings).astype(jnp.int32)
    A = A * (2.0 ** (-s)).astype(wt)
    eye = jnp.eye(m, dtype=wt)
    E = eye + A / 12.0
    for k in range(11, 0, -1):
        E = eye + (A @ E) / k
    for i in range(max_squarings):
        E = jnp.where(i < s, E @ E, E)
    return E[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("nsteps", "order", "krylov_m", "sweep_dtype",
                     "orthogonalize", "precision", "reortho",
                     "gemm2_apply"),
)
def tdvp_run(
    h: jnp.ndarray,
    mps0: jnp.ndarray,
    t: complex,
    nsteps: int = 1,
    order: int = 2,
    krylov_m: int = 12,
    sweep_dtype=None,
    orthogonalize: bool = False,
    precision: str = "highest",
    reortho: bool = True,
    gemm2_apply: bool = False,
) -> jnp.ndarray:
    """Evolve ``exp(t*H)|mps0>``; returns the padded MPS.

    Args:
      h: (N, w, d, d, w) padded MPO.
      mps0: (N, chi, d, chi) padded MPS; right-orthogonal unless
        ``orthogonalize=True`` (which runs the QR gauge sweep inside the
        program — keeps the whole call one device dispatch).
      t: total evolution (e.g. ``-1j*T`` for real time).
      precision: matmul precision of the sweeps ('highest' = 6-pass f32
        default; 'high' = 3 passes, ~1e-7-grade state per step — well
        inside the trajectory contract when the projector-splitting
        error dominates, and ~1.4x faster applies on TPU).
      reortho: full per-iteration reorthogonalization of the Krylov
        basis (default True). False keeps the plain 3-term recurrence —
        for the SHORT-time local propagators here the Krylov space only
        needs to capture exp(c H_eff)v to step tolerance, and lost
        orthogonality perturbs the projected T by O(eps*|H|) (Paige),
        i.e. below the splitting error for production dt.
      gemm2_apply: contract the local H as two large GEMMs per Krylov
        iteration against per-bond precontracted L*Wl / Wr*R operands
        (2x FLOPs, no small-K MXU passes — faster for chi >= 256, as in
        ops.dmrg_chain.dmrg_run).
    """
    if order not in (1, 2):
        raise ValueError("order must be 1 or 2")
    with jax.default_matmul_precision(precision):
        return _tdvp_sweeps(h, mps0, t, nsteps, order, krylov_m,
                            sweep_dtype, orthogonalize, reortho,
                            gemm2_apply)


def _tdvp_sweeps(h, mps0, t, nsteps, order, krylov_m, sweep_dtype,
                 orthogonalize=False, reortho=True, gemm2_apply=False):
    N, chi, d, _ = mps0.shape
    w = h.shape[1]
    # real sweep dtypes are allowed for IMAGINARY-time evolution (real t)
    # — the path that runs on TPUs without complex support; real-time
    # evolution needs a complex dtype (CPU, or complex-capable TPUs).
    st = jnp.dtype(sweep_dtype) if sweep_dtype is not None else \
        jnp.result_type(mps0.dtype, jnp.complex64)
    hs = h.astype(st)
    mps = mps0.astype(st)
    real_st = jnp.finfo(st).dtype
    m = krylov_m

    def norm_of(A):
        return jnp.sqrt(jnp.sum(jnp.abs(A) ** 2).astype(jnp.float64))

    def lanczos_expm(apply_h, v0, coeff, shape):
        """exp(coeff*H) v0 by fixed-m Lanczos (ref krylov.rs:640)."""
        n0 = norm_of(v0)
        v = v0 / jnp.maximum(n0, 1e-300).astype(st)
        basis = jnp.zeros((m,) + shape, st)
        alphas = jnp.zeros((m,), jnp.float64)
        betas = jnp.zeros((m,), jnp.float64)
        amask = jnp.zeros((m,), jnp.float64)

        def body(i, carry):
            basis, alphas, betas, amask, v, v_prev, beta_prev, alive = carry
            basis = basis.at[i].set(v * alive.astype(st))
            hv = apply_h(v)
            a = jnp.real(jnp.sum(jnp.conj(v) * hv))
            hv = hv - a.astype(st) * v - beta_prev.astype(st) * v_prev
            if reortho:
                ov = jnp.einsum("m...,...->m", jnp.conj(basis), hv)
                mask = (jnp.arange(m) <= i).astype(st)
                hv = hv - jnp.einsum("m,m...->...", ov * mask, basis)
            b = norm_of(hv)
            v_next = hv / jnp.maximum(b, 1e-300).astype(st)
            alphas = alphas.at[i].set(
                jnp.where(alive > 0, a.astype(jnp.float64), 0.0))
            amask = amask.at[i].set(alive)
            eps = jnp.asarray(10 * jnp.finfo(real_st).eps, jnp.float64)
            next_alive = alive * (b > eps * jnp.maximum(
                1.0, jnp.abs(a).astype(jnp.float64)))
            betas = betas.at[i].set(b * (i + 1 < m) * next_alive)
            return (basis, alphas, betas, amask, v_next, v,
                    b * alive, next_alive)

        carry = (basis, alphas, betas, amask, v, jnp.zeros_like(v),
                 jnp.float64(0.0), jnp.float64(1.0))
        basis, alphas, betas, amask, _, _, _, _ = jax.lax.fori_loop(
            0, m, body, carry)
        # exp(coeff*T) e0 by GEMM-only scaling-and-squaring (dead slots
        # carry zero diag/offd and decouple; masked below for safety).
        # Imaginary time keeps real arithmetic — the path that runs on
        # TPUs without complex kernels.
        # the small solve runs at the SWEEP grade (f32 when sweeping
        # f32): f64 matmuls are emulated on TPU, so the 12-term Horner +
        # squarings chain of m x m products was ~100x off its MXU cost
        # in f64, once per bond per propagator. Coefficient error
        # ~eps(real_st) enters the state linearly — the same grade as
        # the Krylov basis itself. f64 sweeps keep the f64 solve.
        if jnp.issubdtype(st, jnp.complexfloating):
            c = jnp.asarray(coeff, jnp.result_type(real_st, jnp.complex64))
        else:
            c = jnp.real(jnp.asarray(coeff, real_st))
        coef = _expm_tridiag_e0(alphas.astype(real_st),
                                betas.astype(real_st), c)
        coef = coef * amask
        out = jnp.einsum("m,m...->...", coef.astype(st), basis)
        return out * n0.astype(st)

    if gemm2_apply:
        # Precontract the environments with their MPO cores ONCE per
        # local propagator (amortized over the m Krylov iterations) so
        # each iteration is two large GEMMs with every M/N/K >= chi*d —
        # no (w d)-sized contraction pass ever touches the MXU (which
        # pads small K/N up to 128 lanes). Same trade as
        # ops.dmrg_chain.dmrg_run(gemm2_apply=True): 2x the minimal-path
        # FLOPs, measurably faster on TPU for chi >= 256.
        def apply_h2(L, Wl, Wr, R):
            LW = jnp.einsum("alx,lpim->aixpm", L, Wl)
            RW = jnp.einsum("mqjr,brB->mjbqB", Wr, R)

            def f(th):
                t1 = jnp.einsum("aixpm,aijb->xpmjb", LW, th)
                return jnp.einsum("xpmjb,mjbqB->xpqB", t1, RW)
            return f

        def apply_h1(L, W, R):
            LW = jnp.einsum("alx,lpir->aixpr", L, W)

            def f(A):
                t1 = jnp.einsum("aixpr,aib->xprb", LW, A)
                return jnp.einsum("xprb,brB->xpB", t1, R)
            return f
    else:
        def apply_h2(L, Wl, Wr, R):
            def f(th):
                return jnp.einsum("alx,lpim,mqjr,aijb,brB->xpqB",
                                  L, Wl, Wr, th, R, optimize=True)
            return f

        def apply_h1(L, W, R):
            def f(A):
                return jnp.einsum("alx,lpir,aib,brB->xpB",
                                  L, W, A, R, optimize=True)
            return f

    def split_theta(theta, Q0, toward_right):
        mat = theta.reshape(chi * d, d * chi)
        if toward_right:
            Y = mat @ (jnp.conj(mat).T @ Q0)
            Q, _ = jnp.linalg.qr(Y)
            Y = mat @ (jnp.conj(mat).T @ Q)
            Q, _ = jnp.linalg.qr(Y)
            left = Q.reshape(chi, d, chi)
            right = (jnp.conj(Q).T @ mat).reshape(chi, d, chi)
        else:
            Y = jnp.conj(mat).T @ (mat @ Q0)
            Q, _ = jnp.linalg.qr(Y)
            Y = jnp.conj(mat).T @ (mat @ Q)
            Q, _ = jnp.linalg.qr(Y)
            right = jnp.conj(Q).T.reshape(chi, d, chi)
            left = (mat @ Q).reshape(chi, d, chi)
        return left, right

    def update_left_env(L, A, W):
        return jnp.einsum("alx,aib,loir,xoB->brB", L, A, W, jnp.conj(A),
                          optimize=True)

    def update_right_env(R, A, W):
        return jnp.einsum("brB,aib,loir,xoB->alx", R, A, W, jnp.conj(A),
                          optimize=True)

    L_bound = jnp.zeros((chi, w, chi), st).at[0, 0, 0].set(1.0)
    R_bound = jnp.zeros((chi, w, chi), st).at[0, 0, 0].set(1.0)

    def get(stacked, k):
        return jax.lax.dynamic_index_in_dim(stacked, k, keepdims=False)

    def put(stacked, k, val):
        return jax.lax.dynamic_update_index_in_dim(stacked, val, k, axis=0)

    def right_env_scan(mps):
        def body(R, k):
            Rn = update_right_env(R, get(mps, k), get(hs, k))
            return Rn, Rn

        _, Rs = jax.lax.scan(body, R_bound, jnp.arange(N - 1, 0, -1))
        return jnp.flip(Rs, axis=0)

    def right_orthogonalize_padded(mps):
        """In-program right-orthogonalization: QR gauge sweep N-1..1."""

        def ortho_body(carry, k):
            mps = carry
            A = get(mps, k)
            M = A.reshape(chi, d * chi)
            Q1, R1 = jnp.linalg.qr(jnp.conj(M).T)  # (d chi, chi)
            core = jnp.conj(Q1).T.reshape(chi, d, chi)
            prev = get(mps, k - 1)
            # absorb R1^H into the previous core's right bond
            # (M = R1^H Q1^H)
            prev = jnp.einsum("adb,bc->adc", prev, jnp.conj(R1).T)
            mps = put(put(mps, k, core), k - 1, prev)
            return mps, None

        mps, _ = jax.lax.scan(ortho_body, mps, jnp.arange(N - 1, 0, -1))
        return mps

    if orthogonalize:
        # initial gauge + normalization (evolution then preserves norm)
        mps = right_orthogonalize_padded(mps)
        n0 = jnp.sqrt(jnp.sum(jnp.abs(get(mps, 0)) ** 2))
        mps = put(mps, 0, get(mps, 0)
                  / jnp.maximum(n0, 1e-300).astype(st))

    coeff_dtype = (jnp.complex128
                   if jnp.issubdtype(st, jnp.complexfloating)
                   else jnp.float64)
    dt = jnp.asarray(t, coeff_dtype) / nsteps
    delta = dt / 2.0 if order == 2 else dt

    def half_sweep_fwd(mps, delta):
        Rs = right_env_scan(mps)

        def body(carry, x):
            k, Rk = x
            mps, L = carry
            A, B = get(mps, k), get(mps, k + 1)
            theta0 = jnp.einsum("asb,btc->astc", A, B)
            theta = lanczos_expm(
                apply_h2(L, get(hs, k), get(hs, k + 1), Rk), theta0,
                delta, (chi, d, d, chi))
            left, right = split_theta(theta, A.reshape(chi * d, chi),
                                      toward_right=True)
            L_next = update_left_env(L, left, get(hs, k))
            # backward one-site step on the new center (skip at last bond)
            c = jnp.where(k < N - 2, -delta, 0.0 * delta)
            right = lanczos_expm(
                apply_h1(L_next, get(hs, k + 1), Rk), right, c,
                (chi, d, chi))
            mps = put(put(mps, k, left), k + 1, right)
            return (mps, L_next), L

        (mps, _), Ls = jax.lax.scan(body, (mps, L_bound),
                                    (jnp.arange(N - 1), Rs))
        return mps, Ls

    def half_sweep_bwd(mps, delta, Ls):
        def body(carry, x):
            k, Lk = x
            mps, R = carry
            A, B = get(mps, k), get(mps, k + 1)
            theta0 = jnp.einsum("asb,btc->astc", A, B)
            theta = lanczos_expm(
                apply_h2(Lk, get(hs, k), get(hs, k + 1), R), theta0,
                delta, (chi, d, d, chi))
            left, right = split_theta(
                theta, B.reshape(chi, d * chi).T, toward_right=False)
            R_next = update_right_env(R, right, get(hs, k + 1))
            c = jnp.where(k > 0, -delta, 0.0 * delta)
            left = lanczos_expm(
                apply_h1(Lk, get(hs, k), R_next), left, c, (chi, d, chi))
            mps = put(put(mps, k, left), k + 1, right)
            return (mps, R_next), None

        (mps, _), _ = jax.lax.scan(
            body, (mps, R_bound),
            (jnp.arange(N - 2, -1, -1), jnp.flip(Ls, axis=0)))
        return mps

    def one_step(_, mps):
        mps, Ls = half_sweep_fwd(mps, delta)
        if order == 2:
            mps = half_sweep_bwd(mps, delta, Ls)
        else:
            # forward-only Lie splitting leaves the chain left-canonical;
            # the next step's right environments require right-canonical
            # form — re-gauge (exact, preserves the state)
            mps = right_orthogonalize_padded(mps)
        return mps

    mps = jax.lax.fori_loop(0, nsteps, one_step, mps)
    return mps


def tdvp_sweep_flops(N: int, chi: int, d: int, w: int, krylov_m: int,
                     nsteps: int, order: int = 2,
                     complex_dtype: bool = False,
                     reortho: bool = True,
                     gemm2_apply: bool = False) -> float:
    """Analytic FLOP count of ``tdvp_run``'s sweep loop (same cost model
    as ops.dmrg_chain.dmrg_sweep_flops; complex arithmetic counts 4x
    the real-valued multiplies). The knob parameters MUST mirror the
    tdvp_run call being measured (ADVICE r2)."""
    import numpy as np
    import opt_einsum as oe

    def ec(expr, shapes):
        _, info = oe.contract_path(
            expr, *[np.empty(s, np.float32) for s in shapes])
        return float(info.opt_cost)

    m = krylov_m
    if gemm2_apply:
        apply2_f = (2.0 * (chi * d * w) * (chi * d) * (d * chi)
                    + 2.0 * (chi * d) * (w * d * chi) * (d * chi))
        apply1_f = (2.0 * (chi * d * w) * chi * (d * chi)
                    + 2.0 * (chi * d) * (chi * w) * chi)
        pre2_f = (2.0 * (chi * d) * w * (chi * d * w)
                  + 2.0 * (w * d * chi) * w * (d * chi))
        pre1_f = 2.0 * (chi * d * w) * w * (d * chi)
    else:
        apply2_f = ec("alx,lpim,mqjr,aijb,brB->xpqB",
                      [(chi, w, chi), (w, d, d, w), (w, d, d, w),
                       (chi, d, d, chi), (chi, w, chi)])
        apply1_f = ec("alx,lpir,aib,brB->xpB",
                      [(chi, w, chi), (w, d, d, w), (chi, d, chi),
                       (chi, w, chi)])
        pre2_f = pre1_f = 0.0
    env_f = ec("alx,aib,loir,xoB->brB",
               [(chi, w, chi), (chi, d, chi), (w, d, d, w), (chi, d, chi)])
    td2 = chi * d * d * chi
    td1 = chi * d * chi

    def lan(apply_f, td, pre_f):
        ro = 4 * m * td if reortho else 0
        return pre_f + m * (apply_f + 2 * td + 4 * td + ro + 2 * td)

    theta0_f = 2.0 * chi ** 3 * d ** 2
    qr_f = 4 * 2.0 * (chi * d) * chi ** 2
    mm_f = 4 * 2.0 * (chi * d) * (d * chi) * chi
    per_bond = (theta0_f + lan(apply2_f, td2, pre2_f)
                + lan(apply1_f, td1, pre1_f)
                + qr_f + mm_f + env_f)
    half_sweep = (N - 1) * per_bond + (N - 1) * env_f  # + env scan
    per_step = (2 if order == 2 else 1) * half_sweep
    total = nsteps * per_step
    return total * (4.0 if complex_dtype else 1.0)


def tdvp_chain(h_cores, init_cores, t, chi, nsteps=1, order=2,
               krylov_m=12, sweep_dtype=None, engine="auto"):
    """Convenience driver: pad on host, run ONE device program (the
    orthogonalization sweep is fused into it).

    ``engine``: 'auto' routes CPU backends to the host two-site engine
    (ops.tdvp_chain_host) — measured crossover (r3, 1-thread CPU): the
    jitted engine's fixed worst-case-shape work loses at EVERY size
    tested (N=8 chi=32: 576 vs 72 ms; N=16 chi=64: 7.1 s vs 0.89 s;
    N=16 chi=128: 68 s vs 3.3 s) and the gap widens with chi, so on CPU
    there is no crossover — the jitted engine is a device design (TPU:
    N=32 chi=256 in 631 ms where the host engine does not finish in
    comparable time). 'jit'/'host' force an engine."""
    import numpy as np

    if engine == "auto":
        try:
            engine = "host" if jax.default_backend() == "cpu" else "jit"
        except Exception:  # noqa: BLE001
            engine = "jit"
    if engine == "host":
        from .tdvp_chain_host import tdvp_chain_host

        out = tdvp_chain_host(
            [np.asarray(c) for c in h_cores],
            # np.array (copy): the host engine normalizes cores
            # in place and np.asarray of a jax.Array is read-only
            [np.array(c) for c in init_cores], t, chi,
            nsteps=nsteps, order=order)
        # match the jitted engine's contract: unit-norm padded stack
        # (transfer-matrix norm, O(N chi^3 d))
        stk = [np.asarray(c) for c in out]
        T = np.ones((1, 1), stk[0].dtype)
        for c in stk:
            T = np.einsum("ab,adr,bds->rs", T, c, np.conj(c),
                          optimize=True)
        nrm = float(np.sqrt(np.abs(T[0, 0])))
        if nrm > 0:
            stk[0] = stk[0] / nrm
        return pad_mps([jnp.asarray(c) for c in stk], chi)

    # NOTE on chi: unlike dmrg_chain (variational, exact at the
    # Hilbert rank cap), the two-site splits here measurably benefit
    # from padding slack — at chi == exact bond rank the trajectory
    # error is ~1e-6 while chi >= 2x the target rank reaches 1e-14
    # (empirical, N=6 Heisenberg), so no automatic clamp is applied.
    dtype = jnp.complex128 if sweep_dtype is None else sweep_dtype
    h = pad_mpo([jnp.asarray(np.asarray(c), dtype) for c in h_cores])
    # Per-core normalization guards low-precision sweeps against the
    # concentrated-norm underflow (see dmrg_chain._dmrg_sweeps): the
    # engine's local steps unit-normalize the state, so its output is
    # UNIT-NORM by convention regardless of input scale, and the
    # rescaling here is invisible in the result.
    normed = []
    for c in init_cores:
        a = np.asarray(c)
        # two-stage: max-abs first (cannot underflow even for f32 cores
        # whose sum-of-squares would flush to zero), then unit 2-norm of
        # the O(1)-rescaled core
        m = float(np.abs(a).max()) if a.size else 0.0
        if m > 0:
            a = a / m
            # widen in the SAME domain: complex cores must keep their
            # imaginary part (astype(float64) would drop it -> a purely
            # imaginary core would divide by ~0 and NaN the evolution)
            wide = np.complex128 if np.iscomplexobj(a) else np.float64
            a = a / float(np.linalg.norm(a.astype(wide)))
        normed.append(a)
    mps0 = pad_mps([jnp.asarray(c, dtype) for c in normed], chi)
    return tdvp_run(h, mps0, t, nsteps=nsteps, order=order,
                    krylov_m=krylov_m, sweep_dtype=sweep_dtype,
                    orthogonalize=True)
