"""Grid 3 (r3 MFU push, round B): ritz-solver A/B inside the real engine.

Grid 2 landed fh-3coarse at 21.0% MFU (chi=512) with the default
ritz_solver='bisect' — but the Sturm bisect was committed on CORRECTNESS
tests only, and it unrolls ~800 tiny f64 ops per update (f64 elementwise
is emulated on TPU). full-high regressed 20.7% (eigh, grid 1) ->
18.3% (bisect, grid 2), so the small solve is the suspect. This grid
A/Bs {bisect, bisect_f32, eigh} on the fh-3coarse schedule, each with
and without fine_ns_inner (the untested energy-safe combo).

Energy gate: the grid-2 all-fine reference is e_per_site = -0.43741607.

Run alone:  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
    python -u benchmarks/dmrg_speed_grid3.py > /tmp/grid4.log 2>&1 &
"""
from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.dmrg_chain import _setup
    from benchmarks.mxu import PEAK_BF16_TFLOPS
    from tensor4all_tpu.ops.dmrg_chain import dmrg_run, dmrg_sweep_flops

    print("devices:", jax.devices(), flush=True)
    dev = jax.devices()[0]

    for chi in (512,):
        N = 32
        _, _, hp, mpsp, _ = _setup(N, chi)
        hp = jax.device_put(hp, dev)
        mpsp = jax.device_put(mpsp, dev)
        w = hp.shape[1]
        sweeps = 4
        ck = dict(coarse_lanczos_iters=8, coarse_bf16=True,
                  coarse_reortho=False, coarse_ns_split=True)
        base = dict(gemm2_apply=True, fine_reortho=False,
                    fine_precision="high", coarse_sweeps=sweeps - 1, **ck)
        grid = [
            ("3c-eigh", dict(base, ritz_solver="eigh")),
            ("3c-b32", dict(base, ritz_solver="bisect_f32")),
            ("3c-eigh-nsi", dict(base, ritz_solver="eigh",
                                 fine_ns_inner=True)),
            ("3c-b32-nsi", dict(base, ritz_solver="bisect_f32",
                                fine_ns_inner=True)),
        ]
        for name, kw in grid:
            m_fine = 16
            try:
                def body():
                    e, _ = dmrg_run(hp, mpsp, n_sweeps=sweeps,
                                    lanczos_iters=m_fine,
                                    sweep_dtype=jnp.float32, **kw)
                    return float(e)

                t0 = time.perf_counter()
                ep = body()
                tc = time.perf_counter() - t0
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    ep = body()
                    ts.append(time.perf_counter() - t0)
                t = sorted(ts)[1]
                fl = dmrg_sweep_flops(
                    N, chi, 2, w, m_fine, sweeps,
                    coarse_sweeps=kw.get("coarse_sweeps", 0),
                    coarse_lanczos_iters=kw.get("coarse_lanczos_iters"),
                    coarse_reortho=kw.get("coarse_reortho", True),
                    coarse_ns_split=kw.get("coarse_ns_split", False),
                    fine_reortho=kw.get("fine_reortho", True),
                    gemm2_apply=kw.get("gemm2_apply", False),
                    fine_ns_inner=kw.get("fine_ns_inner", False))
                tf = fl / t / 1e12
                print(json.dumps({
                    "config": name, "chi": chi, "sweeps": sweeps,
                    "m_fine": m_fine,
                    "ms": round(t * 1e3, 1),
                    "compile_s": round(tc, 1),
                    "e_per_site": round(ep / N, 8),
                    "tflops": round(tf, 2),
                    "mfu_bf16": round(tf / PEAK_BF16_TFLOPS, 4),
                }), flush=True)
            except Exception as exc:  # noqa: BLE001
                print(json.dumps({"config": name, "chi": chi,
                                  "error": f"{type(exc).__name__}: {exc}"}),
                      flush=True)


if __name__ == "__main__":
    main()
