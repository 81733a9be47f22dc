"""Grid 2 (r3 MFU push): schedule mix / apply flavor / Lanczos depth.

Slope-calibrated component profile (prof_lean2, v5e chi=512):
gemm2 apply 194us default / 376us high; einsum-min apply 128/312us;
QR (1024x512) 653us; ritz eigh f64 555us; NS orth 21us; env 75us.
=> the levers are (1) more default-precision coarse sweeps, (2) NS
inner orth in fine splits, (3) the 1x-flops einsum apply, (4) fine
Lanczos depth. Energy gate: e_per_site vs the all-fine reference.

Run alone:  nohup python benchmarks/dmrg_speed_grid2.py > /tmp/dmrg_grid3.log 2>&1 &
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
        ck = dict(coarse_lanczos_iters=8, coarse_bf16=True,
                  coarse_reortho=False, coarse_ns_split=True)
        base = dict(gemm2_apply=True, fine_reortho=False,
                    fine_precision="high", coarse_sweeps=sweeps - 2, **ck)
        grid = [
            ("full-high", dict(base)),
            ("fh-nsinner", dict(base, fine_ns_inner=True)),
            ("fh-3coarse", dict(base, coarse_sweeps=sweeps - 1)),
            ("fh-einsum", dict(base, gemm2_apply=False)),
            ("fh-nsinner-einsum", dict(base, fine_ns_inner=True,
                                       gemm2_apply=False)),
            ("fh-nsinner-m12", dict(base, fine_ns_inner=True), 12),
            ("fh-all", dict(base, fine_ns_inner=True,
                            coarse_sweeps=sweeps - 1), 12),
        ]
        for row in grid:
            name, kw = row[0], row[1]
            m_fine = row[2] if len(row) > 2 else 16
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
                    gemm2_apply=kw.get("gemm2_apply", False))
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
