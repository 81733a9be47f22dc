"""Component-level roofline profile of the jitted DMRG chain engine.

VERDICT r2 next-step #1: before redesigning the sweep hot loop, measure
where the 11.4 ms/update at chi=512 actually goes.  Each component is
timed as a K-times chained jitted program (one dispatch, amortizing the
~30 ms axon round-trip floor) at the exact shapes `ops.dmrg_chain` uses:

  - apply_h einsum at default (1 bf16 pass) / high (3) / highest (6)
  - Lanczos full-reorthogonalization einsum pair (f32 and bf16 basis)
  - Householder QR (chi d, chi) vs CholeskyQR2 (Gram+chol+solve, GEMMs)
  - environment update einsum
  - theta0 formation

Usage (one TPU process at a time, see memory/tpu-box-quirks):
  nohup python benchmarks/profile_dmrg.py > /tmp/profile_dmrg.log 2>&1 &
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
    ks = jax.random.split(key, 6)
    f32 = jnp.float32
    L = jax.random.normal(ks[0], (chi, w, chi), f32)
    R = jax.random.normal(ks[1], (chi, w, chi), f32)
    Wl = jax.random.normal(ks[2], (w, d, d, w), f32)
    Wr = jax.random.normal(ks[3], (w, d, d, w), f32)
    th0 = jax.random.normal(ks[4], (chi, d, d, chi), f32)
    basis = jax.random.normal(ks[5], (m, chi, d, d, chi), f32)
    out = {}

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    # ---- apply_h at three precisions -------------------------------
    import opt_einsum as oe
    expr = "alx,lpim,mqjr,aijb,brB->xpqB"
    _, info = oe.contract_path(
        expr, *[np.empty(s, np.float32) for s in
                [(chi, w, chi), (w, d, d, w), (w, d, d, w),
                 (chi, d, d, chi), (chi, w, chi)]])
    apply_fl = float(info.opt_cost)

    for prec in ("default", "high", "highest"):
        @jax.jit
        def chain(th, prec=prec):
            with jax.default_matmul_precision(prec):
                def body(i, t):
                    t = jnp.einsum(expr, L, Wl, Wr, t, R, optimize=True)
                    n = jnp.sqrt(jnp.sum(jnp.square(t)))
                    return t / jnp.maximum(n, 1e-30)
                return jax.lax.fori_loop(0, K, body, th)
        t = _timeit(lambda: sync(chain(th0)))
        out[f"apply_{prec}_us"] = t / K * 1e6
        out[f"apply_{prec}_tflops"] = apply_fl * K / t / 1e12

    # ---- reortho pair (f32 and bf16 basis) -------------------------
    for name, B in (("f32", basis), ("bf16", basis.astype(jnp.bfloat16))):
        @jax.jit
        def ro(th, B=B):
            def body(i, t):
                ov = jnp.einsum("macuy,acuy->m", B.astype(f32), t)
                t = t - jnp.einsum("m,macuy->acuy", ov, B.astype(f32))
                n = jnp.sqrt(jnp.sum(jnp.square(t)))
                return t / jnp.maximum(n, 1e-30)
            return jax.lax.fori_loop(0, K, body, th)
        t = _timeit(lambda: sync(ro(th0)))
        out[f"reortho_{name}_us"] = t / K * 1e6

    # ---- QR variants on (chi d, chi) -------------------------------
    mat = jax.random.normal(ks[4], (chi * d, chi), f32)

    @jax.jit
    def hqr(x):
        def body(i, y):
            q = jnp.linalg.qr(y)[0]
            return q + 1e-6 * x
        return jax.lax.fori_loop(0, K // 4, body, x)
    t = _timeit(lambda: sync(hqr(mat)))
    out["qr_householder_us"] = t / (K // 4) * 1e6

    @jax.jit
    def cqr2(x):
        with jax.default_matmul_precision("highest"):
            def one(y):
                G = y.T @ y
                Rc = jnp.linalg.cholesky(
                    G + 1e-6 * jnp.trace(G) / chi * jnp.eye(chi, dtype=f32))
                q = jax.scipy.linalg.solve_triangular(
                    Rc.T, y.T, lower=False).T
                return q
            def body(i, y):
                q = one(one(y))
                return q + 1e-6 * x
            return jax.lax.fori_loop(0, K // 4, body, x)
    t = _timeit(lambda: sync(cqr2(mat)))
    out["cholqr2_us"] = t / (K // 4) * 1e6

    # ---- env update + theta0 ---------------------------------------
    A = jax.random.normal(ks[1], (chi, d, chi), f32)

    @jax.jit
    def env(Lc):
        def body(i, Lx):
            Lx = jnp.einsum("alx,aib,loir,xoB->brB", Lx, A, Wl,
                            jnp.conj(A), optimize=True)
            n = jnp.sqrt(jnp.sum(jnp.square(Lx)))
            return Lx / jnp.maximum(n, 1e-30)
        return jax.lax.fori_loop(0, K, body, Lc)
    t = _timeit(lambda: sync(env(L)))
    out["env_update_us"] = t / K * 1e6

    @jax.jit
    def th0f(a):
        def body(i, x):
            th = jnp.einsum("asb,btc->astc", a, x)
            return jnp.einsum("astc,ct->asc", th, jnp.ones((chi, d), f32)) \
                / (1.0 + i)
        return jax.lax.fori_loop(0, K, body, A)
    t = _timeit(lambda: sync(th0f(A)))
    out["theta0_pair_us"] = t / K * 1e6

    out["chi"] = chi
    out["m"] = m
    print(json.dumps(out, indent=1), flush=True)
    return out


if __name__ == "__main__":
    import sys
    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    main(chi=chi)
