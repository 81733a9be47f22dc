"""Round-3 slope profile of the production schedule (3c-b32, chi=512).

Differences of full `dmrg_run` timings isolate the real per-sweep and
per-iteration costs (component microbenches under-count in-engine HBM
pressure):

  marginal fine sweep  = T(n=2,c=0) - T(n=1,c=0)
  marginal coarse sweep= T(n=2,c=2) - T(n=1,c=1)
  per-Lanczos-iter     = [T(n=2,c=0,m=24) - T(n=2,c=0,m=8)] / (2*62*16)
  fine fixed per update= (marginal fine - 62*16*periter)/62
  + a fine_precision='default' row (energy + time: is 3-pass needed?)

Run alone:  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
    python -u benchmarks/profile_dmrg3.py > /tmp/prof3.log 2>&1 &
"""
from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.dmrg_chain import _setup
    from tensor4all_tpu.ops.dmrg_chain import dmrg_run

    print("devices:", jax.devices(), flush=True)
    dev = jax.devices()[0]
    N, chi = 32, 512
    _, _, hp, mpsp, _ = _setup(N, chi)
    hp = jax.device_put(hp, dev)
    mpsp = jax.device_put(mpsp, dev)
    ck = dict(coarse_lanczos_iters=8, coarse_bf16=True,
              coarse_reortho=False, coarse_ns_split=True,
              gemm2_apply=True, fine_reortho=False,
              ritz_solver="bisect_f32")
    rows = [
        ("n1c0_m16", dict(n_sweeps=1, coarse_sweeps=0, lanczos_iters=16)),
        ("n2c0_m16", dict(n_sweeps=2, coarse_sweeps=0, lanczos_iters=16)),
        ("n2c0_m8", dict(n_sweeps=2, coarse_sweeps=0, lanczos_iters=8)),
        ("n2c0_m24", dict(n_sweeps=2, coarse_sweeps=0, lanczos_iters=24)),
        ("n1c1_m16", dict(n_sweeps=1, coarse_sweeps=1, lanczos_iters=16)),
        ("n2c2_m16", dict(n_sweeps=2, coarse_sweeps=2, lanczos_iters=16)),
        ("n2c0_m16_default", dict(n_sweeps=2, coarse_sweeps=0,
                                  lanczos_iters=16,
                                  fine_precision="default")),
    ]
    out = {}
    for name, kw in rows:
        try:
            fp = kw.pop("fine_precision", "high")

            def body():
                e, _ = dmrg_run(hp, mpsp, sweep_dtype=jnp.float32,
                                fine_precision=fp, **{**ck, **kw})
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
            out[name] = {"ms": round(t * 1e3, 1),
                         "e_per_site": round(ep / N, 8),
                         "compile_s": round(tc, 1)}
            print(json.dumps({name: out[name]}), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({name: f"{type(exc).__name__}: {exc}"}),
                  flush=True)

    try:
        upd = 2 * (N - 1)
        mf = (out["n2c0_m16"]["ms"] - out["n1c0_m16"]["ms"])
        mc = (out["n2c2_m16"]["ms"] - out["n1c1_m16"]["ms"])
        per_it = ((out["n2c0_m24"]["ms"] - out["n2c0_m8"]["ms"])
                  / (2 * upd * 16))
        fine_fixed = (mf / upd) - 16 * per_it
        print(json.dumps({
            "marginal_fine_sweep_ms": round(mf, 1),
            "marginal_coarse_sweep_ms": round(mc, 1),
            "fine_per_lanczos_iter_us": round(per_it * 1e3, 1),
            "fine_fixed_per_update_us": round(fine_fixed * 1e3, 1),
            "coarse_per_update_us": round(mc / upd * 1e3, 1),
        }), flush=True)
    except Exception as exc:  # noqa: BLE001
        print("summary failed:", exc, flush=True)


if __name__ == "__main__":
    main()
