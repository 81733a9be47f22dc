"""Probe: isolate the fixed per-run cost of dmrg_run (suspected: the
f64 global Rayleigh quotient, ~263 GF of emulated-f64 einsums at
N=32 chi=512).

Run alone:  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
    python -u benchmarks/probe_rayleigh.py > /tmp/probe_ray.log 2>&1 &
"""
from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.dmrg_chain import _setup
    from tensor4all_tpu.ops.dmrg_chain import _rayleigh_chain, dmrg_run

    print("devices:", jax.devices(), flush=True)
    dev = jax.devices()[0]
    N, chi = 32, 512
    _, _, hp, mpsp, _ = _setup(N, chi)
    hp = jax.device_put(hp, dev)
    mpsp = jax.device_put(mpsp, dev)

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        tc = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn()
            ts.append(time.perf_counter() - t0)
        print(json.dumps({name: {"ms": round(sorted(ts)[1] * 1e3, 2),
                                 "compile_s": round(tc, 1),
                                 "val": float(r)}}), flush=True)
        return r

    # 1. zero-sweep run = preamble + f64 Rayleigh only
    def zero_run():
        e, _ = dmrg_run(hp, mpsp, n_sweeps=0, coarse_sweeps=0,
                        lanczos_iters=16, sweep_dtype=jnp.float32)
        return float(e)

    timed("n0_full_f64_rayleigh", zero_run)

    # 2. f64 Rayleigh alone on the f64 state
    ray64 = jax.jit(_rayleigh_chain)

    def r64():
        return float(ray64(hp, mpsp))

    e64 = timed("rayleigh_f64", r64)

    # 3. f32 'highest' Rayleigh on the same state
    def _ray32(h, mps):
        with jax.default_matmul_precision("highest"):
            return _rayleigh_chain(h.astype(jnp.float32),
                                   mps.astype(jnp.float32))

    ray32 = jax.jit(_ray32)

    def r32():
        return float(ray32(hp, mpsp))

    e32 = timed("rayleigh_f32_highest", r32)

    # 4. f32 'high' (3-pass) for comparison
    def _ray32h(h, mps):
        with jax.default_matmul_precision("high"):
            return _rayleigh_chain(h.astype(jnp.float32),
                                   mps.astype(jnp.float32))

    ray32h = jax.jit(_ray32h)
    e32h = timed("rayleigh_f32_high", lambda: float(ray32h(hp, mpsp)))

    print(json.dumps({
        "abs_err_f32_highest": abs(e32 - e64),
        "abs_err_f32_high": abs(e32h - e64),
        "rel_err_f32_highest": abs((e32 - e64) / e64),
        "rel_err_f32_high": abs((e32h - e64) / e64),
    }), flush=True)


if __name__ == "__main__":
    main()
