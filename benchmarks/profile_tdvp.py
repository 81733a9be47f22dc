"""Round-4 slope profile of the production TDVP schedule (chi=512).

The corrected roofline decomposition (`benchmarks/tdvp_roofline.py`,
2026-08-19 revision) leaves a ~4.9 ms/bond-visit fixed cost at chi=512
— 69% of wall time. This profile attributes it by differencing full
`tdvp_run` timings (component microbenches under-count in-engine HBM
pressure, same method as profile_dmrg3):

  per 2-site Krylov iter (single-pass region) = [T(m=20)-T(m=12)]/(8*nb)
  per 1-site Krylov iter                      = [T(m1=12)-T(m1=6)]/(6*nb)
  expm squaring chain                         = [T(sq=20)-T(sq=8)]/(12*2*nb)
  initial gauge sweep (31 QR panels)          = T(ortho) - T(no ortho)
  per-step marginal                           = [T(4 steps)-T(2 steps)]/2

plus direct microbenches of the candidate split replacements:
Householder `_colnorm_qr` vs CholeskyQR2 on the (chi d, chi) panel.

Run alone:  nohup env PYTHONPATH=/root/repo \
    python -u benchmarks/profile_tdvp.py > /tmp/prof_tdvp.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault(
    "T4A_COMPILE_CACHE",
    os.path.expanduser("~/.cache/t4a_xla_bench"))


def _median(f, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.dmrg_chain import _setup
    from tensor4all_tpu.ops.tdvp_chain import tdvp_run

    print("devices:", jax.devices(), flush=True)
    dev = jax.devices()[0]
    N, chi, d = 32, 512, 2
    _, _, hp, mpsp, _ = _setup(N, chi)
    hp = jax.device_put(hp.astype(jnp.float32), dev)
    mpsp = jax.device_put(mpsp.astype(jnp.float32), dev)

    base = dict(order=2, krylov_m=12, sweep_dtype=jnp.float32,
                orthogonalize=True, precision="high", reortho=False,
                gemm2_apply=True, bf16_tail=2, krylov_m1=6,
                expm_max_squarings=8)
    rows = [
        ("base_4steps", dict()),
        ("m20", dict(krylov_m=20)),
        ("m1_12", dict(krylov_m1=12)),
        ("sq20", dict(expm_max_squarings=20)),
        ("steps2", dict(nsteps=2)),
        ("tail0", dict(bf16_tail=0)),  # all applies 3-pass: pass cost
    ]
    out = {}
    for name, kw in rows:
        cfg = {**base, **kw}
        nsteps = cfg.pop("nsteps", 4)

        def body():
            o = tdvp_run(hp, mpsp, -0.05, nsteps=nsteps, **cfg)
            return float(jnp.sum(jnp.abs(o[0])))

        t0 = time.perf_counter()
        body()
        tc = time.perf_counter() - t0
        t = _median(body)
        out[name] = {"ms": round(t * 1e3, 1), "compile_s": round(tc, 1)}
        print(name, out[name], flush=True)

    # ---- derived slopes (nb = two-site bond visits = 62/step) ----
    nb = 62 * 4
    b = out["base_4steps"]["ms"]
    out["slopes"] = {
        "per_2site_iter_singlepass_us": round(
            (out["m20"]["ms"] - b) / (8 * nb) * 1e3, 1),
        "per_1site_iter_us": round(
            (out["m1_12"]["ms"] - b) / (6 * nb) * 1e3, 1),
        "per_expm_squaring_us": round(
            (out["sq20"]["ms"] - b) / (12 * 2 * nb) * 1e3, 2),
        "per_step_marginal_ms": round(
            (b - out["steps2"]["ms"]) / 2, 1),
        "pass_cost_tail0_minus_base_ms": round(out["tail0"]["ms"] - b, 1),
    }
    print(json.dumps(out["slopes"], indent=1), flush=True)

    # ---- microbench: Householder colnorm QR vs CholeskyQR2 ----
    from tensor4all_tpu.ops.dmrg_chain import _colnorm_qr

    key = jax.random.PRNGKey(0)
    # representative split operand: (chi d, chi) with decaying spectrum
    u = jax.random.normal(key, (chi * d, chi), jnp.float32)
    s = jnp.exp(-jnp.arange(chi, dtype=jnp.float32) / 16.0)
    v = jax.random.normal(jax.random.PRNGKey(1), (chi, chi), jnp.float32)
    Y = jax.device_put(u * s[None, :] @ v, dev)

    qr_j = jax.jit(_colnorm_qr)

    def cholqr2(Yx):
        # shifted CholeskyQR, two passes; Gram at 3-pass f32
        hi = jax.lax.Precision.HIGHEST
        eps = jnp.finfo(Yx.dtype).eps
        cn = jnp.sqrt(jnp.sum(Yx * Yx, axis=0, keepdims=True))
        keep = cn > 10 * eps * jnp.max(cn)
        Q = jnp.where(keep, Yx / jnp.where(keep, cn, 1.0), 0.0)
        for _ in range(2):
            G = jnp.matmul(Q.T, Q, precision=hi)
            m_ = Yx.shape[1]
            G = G + (m_ * eps * 10) * jnp.eye(m_, dtype=Yx.dtype)
            R = jnp.linalg.cholesky(G.astype(jnp.float32)).T
            Q = jax.lax.linalg.triangular_solve(
                R, Q, left_side=False, lower=False)
        return Q

    cq_j = jax.jit(cholqr2)
    for nm, f in (("householder_colnorm_qr", qr_j), ("cholqr2", cq_j)):
        Q = f(Y)
        Q.block_until_ready()
        t = _median(lambda: f(Y).block_until_ready(), reps=10)
        orth = float(jnp.linalg.norm(
            Q.T @ Q - jnp.eye(chi, dtype=jnp.float32)))
        out[nm] = {"ms": round(t * 1e3, 3), "orth_err": orth}
        print(nm, out[nm], flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
