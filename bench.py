#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Runs the most advanced benchmark currently supported by the framework,
compared against the reference journal number (BASELINE.md). Falls back
down the ladder if a higher-level component is not yet available.

Current ladder (top first):
  1. TreeTN DMRG chain N=8, chi=32, 4 sweeps   (baseline 135.4 ms)
  2. rrLU Hilbert 128x128                      (baseline 0.329 ms median)
  3. MPO x MPO zipup L=10, chi=8, maxdim=8     (baseline 2.297 ms)

vs_baseline = baseline_time / our_time (>1 means we are faster).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _median_time(fn, warmup: int = 2, reps: int = 5) -> float:
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def bench_dmrg():
    from benchmarks.dmrg_chain import run  # noqa

    return run(_median_time)


def bench_rrlu():
    import jax.numpy as jnp
    import numpy as np
    from tensor4all_tpu.ops.rrlu import rrlu

    n = 128
    i = np.arange(n)
    hilbert = jnp.asarray(1.0 / (1.0 + i[:, None] + i[None, :]))

    def run():
        out = rrlu(hilbert, rtol=1e-10)
        out.lu.block_until_ready()
        return out

    t = _median_time(run, warmup=2, reps=9)
    out = run()
    return {
        "metric": "rrlu_hilbert_128_ms",
        "value": t * 1e3,
        "unit": "ms",
        "vs_baseline": 0.329 / (t * 1e3),
        "detail": {"rank": int(out.rank)},
    }


def bench_mpo_zipup():
    import jax
    import jax.numpy as jnp

    from tensor4all_tpu.tt import MPO

    L, d, chi = 10, 2, 8
    links = [1] + [chi] * (L - 1) + [1]
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 2 * L)
    dtype = jnp.float64
    a = MPO([
        jax.random.normal(ks[k], (links[k], d, d, links[k + 1]), dtype) / chi
        for k in range(L)
    ])
    b = MPO([
        jax.random.normal(ks[L + k], (links[k], d, d, links[k + 1]), dtype) / chi
        for k in range(L)
    ])

    def run():
        out = a.compose_zipup(b, tol=1e-12, maxdim=chi)
        out.cores[-1].block_until_ready()
        return out

    t = _median_time(run, warmup=3, reps=7)
    return {
        "metric": "mpo_zipup_L10_chi8_ms",
        "value": t * 1e3,
        "unit": "ms",
        "vs_baseline": 2.297 / (t * 1e3),
    }


def main():
    ladder = [bench_dmrg, bench_rrlu, bench_mpo_zipup]
    failures = []
    for bench in ladder:
        try:
            result = bench()
        except Exception as e:  # noqa: BLE001 — fall down the ladder
            import traceback

            msg = f"{bench.__name__}: {type(e).__name__}: {e}"
            failures.append(msg)
            print(f"[bench] rung failed: {msg}", file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            continue
        if failures:
            # a fallback result must be distinguishable from a healthy run
            detail = result.setdefault("detail", {})
            if isinstance(detail, dict):
                detail["failed_rungs"] = failures
        print(json.dumps(result))
        return
    print(json.dumps({
        "metric": "error",
        "value": 0,
        "unit": "none",
        "vs_baseline": 0,
        "detail": {"failed_rungs": failures},
    }))


if __name__ == "__main__":
    main()
