"""Validate + time energy_precision='mixed' on the production schedule.

For chi in (256, 512): run the 3-coarse+1-fine schedule with mixed
energy, then re-evaluate the SAME returned state with the f64 Rayleigh
— the difference is pure evaluation error (expected ~1e-6 relative).

Run alone:  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
    python -u benchmarks/probe_mixed_energy.py > /tmp/probe_mixed.log 2>&1 &
"""
from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.dmrg_chain import _setup
    from tensor4all_tpu.ops.dmrg_chain import (
        _rayleigh_chain,
        dmrg_run,
        dmrg_sweep_flops,
    )

    print("devices:", jax.devices(), flush=True)
    dev = jax.devices()[0]
    ray64 = jax.jit(_rayleigh_chain)
    N = 32
    for chi, sweeps in ((512, 4), (256, 6)):
        _, _, hp, mpsp, _ = _setup(N, chi)
        hp = jax.device_put(hp, dev)
        mpsp = jax.device_put(mpsp, dev)
        knobs = dict(coarse_sweeps=sweeps - 1, coarse_lanczos_iters=8,
                     coarse_bf16=True, coarse_reortho=False,
                     coarse_ns_split=True, gemm2_apply=True,
                     fine_reortho=False, fine_precision="high",
                     ritz_solver="bisect_f32", energy_precision="mixed")

        def body():
            e, mps = dmrg_run(hp, mpsp, n_sweeps=sweeps,
                              lanczos_iters=16, sweep_dtype=jnp.float32,
                              **knobs)
            return float(e), mps

        t0 = time.perf_counter()
        e_mixed, mps = body()
        tc = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            e_mixed, mps = body()
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[1]
        e_f64 = float(ray64(hp, mps.astype(jnp.float64)))
        fl = dmrg_sweep_flops(N, chi, 2, hp.shape[1], 16, sweeps,
                              coarse_sweeps=sweeps - 1,
                              coarse_lanczos_iters=8,
                              coarse_reortho=False, coarse_ns_split=True,
                              fine_reortho=False, gemm2_apply=True)
        tflops = fl / t / 1e12
        print(json.dumps({
            "chi": chi, "sweeps": sweeps,
            "ms": round(t * 1e3, 1), "compile_s": round(tc, 1),
            "e_per_site_mixed": round(e_mixed / N, 9),
            "e_per_site_f64_same_state": round(e_f64 / N, 9),
            "energy_eval_abs_err": abs(e_mixed - e_f64),
            "tflops": round(tflops, 2),
            "mfu_bf16": round(tflops / 197.0, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
