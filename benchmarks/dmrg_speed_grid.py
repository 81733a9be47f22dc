"""Grid experiment: DMRG chain engine schedules at production scale.

Round-3 MFU push (VERDICT r2 #1): measure wall-clock, energy parity and
model-FLOP throughput of candidate coarse/fine schedules on the real
chip. Run alone (one TPU process at a time):

  nohup python benchmarks/dmrg_speed_grid.py > /tmp/dmrg_grid.log 2>&1 &
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

    for chi in (512, 256):
        N = 32
        _, _, hp, mpsp, _ = _setup(N, chi)
        hp = jax.device_put(hp, dev)
        mpsp = jax.device_put(mpsp, dev)
        w = hp.shape[1]
        sweeps = 4 if chi == 512 else 6
        coarse_kn = dict(coarse_sweeps=sweeps - 2, coarse_lanczos_iters=8,
                         coarse_bf16=True, coarse_reortho=False,
                         coarse_ns_split=True)
        grid = [
            # NS-inner split orth is now always on; r2-default rerun
            # shows its effect alone
            ("nsinner", dict(coarse_sweeps=sweeps - 2)),
            ("gemm2", dict(coarse_sweeps=sweeps - 2, gemm2_apply=True)),
            ("gemm2-noro", dict(coarse_sweeps=sweeps - 2,
                                gemm2_apply=True, fine_reortho=False)),
            ("full", dict(gemm2_apply=True, fine_reortho=False,
                          **coarse_kn)),
            ("full-high", dict(gemm2_apply=True, fine_reortho=False,
                               fine_precision="high", **coarse_kn)),
        ]
        for name, kw in grid:
            try:
                def body():
                    e, _ = dmrg_run(hp, mpsp, n_sweeps=sweeps,
                                    lanczos_iters=16,
                                    sweep_dtype=jnp.float32, **kw)
                    return float(e)

                t0 = time.perf_counter()
                ep = body()  # compile
                tc = time.perf_counter() - t0
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    ep = body()
                    ts.append(time.perf_counter() - t0)
                t = sorted(ts)[1]
                fl = dmrg_sweep_flops(
                    N, chi, 2, w, 16, sweeps,
                    coarse_sweeps=kw.get("coarse_sweeps", 0),
                    coarse_lanczos_iters=kw.get("coarse_lanczos_iters"),
                    coarse_reortho=kw.get("coarse_reortho", True),
                    coarse_ns_split=kw.get("coarse_ns_split", False),
                    fine_reortho=kw.get("fine_reortho", True),
                    gemm2_apply=kw.get("gemm2_apply", False))
                tf = fl / t / 1e12
                print(json.dumps({
                    "config": name, "chi": chi, "sweeps": sweeps,
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
