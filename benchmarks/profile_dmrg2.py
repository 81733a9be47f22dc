"""Round-3 follow-up roofline: components of the BEST grid config.

profile_dmrg.py measured the r2-default components; the grid then showed
`full-high` (gemm2_apply + coarse knobs + fine_precision='high' +
fine_reortho=False) at 20.7% MFU — 4.3 pts short of the VERDICT #1 bar.
This profile times what that config actually executes at chi=512,
INCLUDING pieces the first profile skipped:

  - gemm2 two-GEMM apply at default (1 bf16 pass) and 'high' (3 passes),
    plus its per-solve precontraction
  - Newton-Schulz inner orthogonalization (the split's inner steps)
  - the m x m float64 tridiagonal eigh + sentinel reductions (runs ONCE
    PER UPDATE inside the scan; x64 is emulated on TPU)
  - f32 vs f64 variants of that small solve
  - Householder QR vs shifted CholeskyQR2 at (chi d, chi)
  - one full fine two-site update (ground truth to compare to the sum)

Usage (one TPU process at a time, see memory/tpu-box-quirks):
  nohup python benchmarks/profile_dmrg2.py > /tmp/profile_dmrg2.log 2>&1 &
"""

from __future__ import annotations

import json
import time

import numpy as np


def _timeit(fn, reps=5):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main(chi=512, w=5, d=2, m=16, K=64):
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    f32 = jnp.float32
    L = jax.random.normal(ks[0], (chi, w, chi), f32)
    R = jax.random.normal(ks[1], (chi, w, chi), f32)
    Wl = jax.random.normal(ks[2], (w, d, d, w), f32)
    Wr = jax.random.normal(ks[3], (w, d, d, w), f32)
    th0 = jax.random.normal(ks[4], (chi, d, d, chi), f32)
    mat = jax.random.normal(ks[5], (chi * d, d * chi), f32)
    y = jax.random.normal(ks[6], (chi * d, chi), f32)
    out = {"chi": chi, "m": m}

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def chain(fn, x0, prec, k=None):
        # Python-unrolled for GEMM chains (fuses well); keep k small for
        # programs with decompositions (eigh/qr/cholesky) — 64 unrolled
        # eigh instances produce a pathological TPU compile (the r3
        # first attempt hung >45 min in the compile server).
        kk = K if k is None else k
        @jax.jit
        def prog():
            with jax.default_matmul_precision(prec):
                x = x0
                for i in range(kk):
                    x = fn(x, i)
                return x
        return prog, kk

    # ---- gemm2 apply: precontract once, then two big GEMMs ----------
    def make_gemm2():
        LW = jnp.einsum("alx,lpim->aixpm", L, Wl)
        RW = jnp.einsum("mqjr,brB->mjbqB", Wr, R)
        def apply2(th, i):
            t1 = jnp.einsum("aixpm,aijb->xpmjb", LW, th)
            yv = jnp.einsum("xpmjb,mjbqB->xpqB", t1, RW)
            return yv / (1.0 + jnp.float32(i))
        return apply2

    for prec in ("default", "high"):
        prog, kk = chain(make_gemm2(), th0, prec)
        t = _timeit(lambda: sync(prog()))
        out[f"gemm2_apply_{prec}_us"] = t / kk * 1e6
        flops = (2.0 * (chi * d * w) * (chi * d) * (d * chi)
                 + 2.0 * (chi * d) * (w * d * chi) * (d * chi))
        out[f"gemm2_apply_{prec}_tflops"] = flops / (t / kk) / 1e12

    # precontraction alone (amortized /m in the engine)
    def precon(x, i):
        LW = jnp.einsum("alx,lpim->aixpm", L * (1.0 + jnp.float32(i)), Wl)
        RW = jnp.einsum("mqjr,brB->mjbqB", Wr, R * (1.0 + jnp.float32(i)))
        return jnp.sum(LW) + jnp.sum(RW)

    prog, kk = chain(lambda s, i: s + precon(s, i), jnp.float32(0.0),
                     "high")
    t = _timeit(lambda: sync(prog()))
    out["gemm2_precontract_us"] = t / kk * 1e6
    print(json.dumps(out), flush=True)

    # ---- Newton-Schulz inner orth at 'high' -------------------------
    eye = jnp.eye(chi, dtype=f32)

    def ns_orth(yv, i):
        g = yv.T @ yv
        tr = jnp.trace(g)
        g = g + (1e-6 * tr / chi + 1e-30) * eye
        s = jnp.sqrt(jnp.sum(g * g))
        A = g / s
        Y, Z = A, eye
        for _ in range(4):
            T = 0.5 * (3.0 * eye - Z @ Y)
            Y, Z = Y @ T, T @ Z
        return (yv @ (Z / jnp.sqrt(s))) * (1.0 + 1e-9 * jnp.float32(i))

    prog, kk = chain(ns_orth, y, "high")
    t = _timeit(lambda: sync(prog()))
    out["ns_orth_high_us"] = t / kk * 1e6
    print(json.dumps(out), flush=True)

    # ---- QR flavors at (chi d, chi) ----------------------------------
    def qr_h(yv, i):
        q = jnp.linalg.qr(yv)[0]
        return q * (1.0 + 1e-9 * jnp.float32(i))

    prog, kk = chain(qr_h, y, "high", k=12)
    t = _timeit(lambda: sync(prog()))
    out["qr_householder_us"] = t / kk * 1e6

    def cholqr2(yv, i):
        for _ in range(2):
            g = yv.T @ yv
            tr = jnp.trace(g)
            g = g + (1e-6 * tr / chi) * eye
            c = jnp.linalg.cholesky(g)
            yv = jax.lax.linalg.triangular_solve(
                c, yv, left_side=False, lower=True, transpose_a=True)
        return yv * (1.0 + 1e-9 * jnp.float32(i))

    prog, kk = chain(cholqr2, y, "high", k=12)
    t = _timeit(lambda: sync(prog()))
    out["cholqr2_us"] = t / kk * 1e6
    print(json.dumps(out), flush=True)

    # ---- the small tridiagonal solve (per update!) -------------------
    alphas64 = jnp.asarray(np.random.randn(m), jnp.float64)
    betas64 = jnp.asarray(np.abs(np.random.randn(m)), jnp.float64)
    amask = jnp.ones((m,), jnp.float64)

    def ritz(dtype):
        a, b, msk = (alphas64.astype(dtype), betas64.astype(dtype),
                     amask.astype(dtype))
        def step(acc, i):
            ai = a * (1.0 + 1e-9 * acc)
            big = jnp.where(msk > 0, ai, -jnp.inf).max()
            small = jnp.where(msk > 0, ai, jnp.inf).min()
            bmax = jnp.abs(b).max()
            pad = big + (big - small) + 4.0 * bmax + 1.0
            diag = jnp.where(msk > 0, ai, pad)
            T = (jnp.diag(diag) + jnp.diag(b[:-1], 1) + jnp.diag(b[:-1], -1))
            evals, evecs = jnp.linalg.eigh(T)
            return acc + evals[0] * 1e-9 + evecs[0, 0] * 1e-12
        return step

    for name, dt in (("f64", jnp.float64), ("f32", jnp.float32)):
        prog, kk = chain(ritz(dt), jnp.asarray(0.0, dt), "high", k=6)
        t = _timeit(lambda: sync(prog()))
        out[f"ritz_eigh_{name}_us"] = t / kk * 1e6
        print(json.dumps(out), flush=True)

    # ---- one full fine update, ground truth --------------------------
    from tensor4all_tpu.ops.dmrg_chain import pad_mpo  # noqa: F401  (import check)

    def full_update(th, i):
        LW = jnp.einsum("alx,lpim->aixpm", L, Wl)
        RW = jnp.einsum("mqjr,brB->mjbqB", Wr, R)
        def apply2(t_):
            t1 = jnp.einsum("aixpm,aijb->xpmjb", LW, t_)
            return jnp.einsum("xpmjb,mjbqB->xpqB", t1, RW)
        v = th / jnp.sqrt(jnp.sum(th * th))
        basis = jnp.zeros((m, chi, d, d, chi), f32)
        alphas = jnp.zeros((m,), jnp.float64)
        betas = jnp.zeros((m,), jnp.float64)

        def body(k, carry):
            basis, alphas, betas, v, v_prev, beta_prev = carry
            basis = basis.at[k].set(v)
            hv = apply2(v)
            a_ = jnp.sum(v * hv)
            hv = hv - a_ * v - beta_prev * v_prev
            b_ = jnp.sqrt(jnp.sum(hv * hv))
            v_next = hv / jnp.where(b_ > 0, b_, 1.0)
            alphas = alphas.at[k].set(a_.astype(jnp.float64))
            betas = betas.at[k].set(b_.astype(jnp.float64) * (k + 1 < m))
            return (basis, alphas, betas, v_next, v, b_)

        basis, alphas, betas, _, _, _ = jax.lax.fori_loop(
            0, m, body, (basis, alphas, betas, v,
                         jnp.zeros_like(v), jnp.float32(0.0)))
        T = (jnp.diag(alphas) + jnp.diag(betas[:-1], 1)
             + jnp.diag(betas[:-1], -1))
        evals, evecs = jnp.linalg.eigh(T)
        theta = jnp.einsum("m,macuy->acuy", evecs[:, 0].astype(f32), basis)
        # split: 3 NS inner + 1 QR + subspace matmuls
        matv = theta.reshape(chi * d, d * chi)
        Q0 = y
        for it in range(2):
            Z = ns_orth(matv.T @ Q0, 0)
            Q0 = (qr_h if it == 1 else ns_orth)(matv @ Z, 0)
        left = Q0
        right = Q0.T @ matv
        # env update
        Lp = jnp.einsum("alx,aib,loir,xoB->brB", L,
                        left.reshape(chi, d, chi), Wl,
                        left.reshape(chi, d, chi), optimize=True)
        return th + 1e-9 * (jnp.sum(Lp) + jnp.sum(right)) * th / (
            1.0 + jnp.float32(i))

    prog, kk = chain(full_update, th0, "high", k=3)
    t = _timeit(lambda: sync(prog()), reps=3)
    out["full_update_high_ms"] = t / kk * 1e3

    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
