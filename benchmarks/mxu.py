"""MXU utilization benchmark: large-chi two-site operator apply.

The chi**3 kernel every sweep algorithm rides (DMRG/TDVP/linsolve local
apply, ref benchmarks/results/2026-05-18-projected-apply.md): contract the
two-site block with its left/right environments and MPO cores,

    theta' = L . Wl . Wr . theta . R      (einsum alx,lpim,mqjr,aijb,brB)

at production bond dimensions (chi >= 256), where the MXU — not op
latency — is the limit. Reports achieved TFLOP/s and MFU vs the chip's
bf16 peak (BASELINE.md north star: "MXU speed-of-light for bond dim
>=256").

Runs K applies chained in one XLA program (one dispatch); FLOPs counted
via opt_einsum's contraction-path cost model on the same path order.
"""

from __future__ import annotations

import time

import numpy as np

# TPU v5e (v5 lite) single-chip peak; other chips only change the MFU
# denominator, the TFLOP/s line stays hardware-honest.
PEAK_BF16_TFLOPS = 197.0

EXPR = "alx,lpim,mqjr,aijb,brB->xpqB"


def _apply_flops(chi: int, w: int, d: int) -> float:
    import opt_einsum as oe

    shapes = [(chi, w, chi), (w, d, d, w), (w, d, d, w),
              (chi, d, d, chi), (chi, w, chi)]
    _, info = oe.contract_path(EXPR, *[np.empty(s, np.float32)
                                       for s in shapes])
    return float(info.opt_cost)


def run(chi: int = 256, w: int = 8, d: int = 2, dtype_name: str = "bfloat16",
        k_applies: int = 512, reps: int = 5) -> dict:
    import jax
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype_name)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    L = jax.random.normal(ks[0], (chi, w, chi), jnp.float32).astype(dtype)
    R = jax.random.normal(ks[1], (chi, w, chi), jnp.float32).astype(dtype)
    Wl = jax.random.normal(ks[2], (w, d, d, w), jnp.float32).astype(dtype)
    Wr = jax.random.normal(ks[3], (w, d, d, w), jnp.float32).astype(dtype)
    th0 = jax.random.normal(ks[4], (chi, d, d, chi), jnp.float32).astype(dtype)

    @jax.jit
    def chain(theta):
        def body(i, th):
            th = jnp.einsum(EXPR, L, Wl, Wr, th, R, optimize=True)
            n = jnp.sqrt(jnp.sum(jnp.square(th.astype(jnp.float32))))
            return (th.astype(jnp.float32)
                    / jnp.maximum(n, 1e-30)).astype(dtype)
        return jax.lax.fori_loop(0, k_applies, body, theta)

    # warmup (compile)
    float(jnp.sum(chain(th0).astype(jnp.float32)))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(chain(th0 * (1.0 + 1e-3 * r)).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    t = ts[len(ts) // 2]
    flops = _apply_flops(chi, w, d) * k_applies
    tflops = flops / t / 1e12
    return {
        "chi": chi,
        "dtype": dtype_name,
        "k_applies": k_applies,
        "total_ms": t * 1e3,
        "tflops": tflops,
        "mfu_vs_bf16_peak": tflops / PEAK_BF16_TFLOPS,
    }


if __name__ == "__main__":
    import json

    for chi in (256, 512):
        for dt in ("bfloat16", "float32"):
            print(json.dumps(run(chi=chi, dtype_name=dt,
                                 k_applies=2048 if chi == 256 else 512)))
