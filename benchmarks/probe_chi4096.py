"""HBM-ceiling probe (VERDICT r3 #7): where does the DMRG chain engine
actually run out of memory on a 16 GB TPU v5 lite chip?

chi=2048 is the institutionalized bench row (fits: ~6 GB live). This
probe walks chi in {3072, 4096} at N=32 and records, per chi:

  - the analytic live-array footprint (MPS + L/R env stacks + the
    two-site workspaces at the engine's dtype mix),
  - whether compilation + one run succeeds,
  - the failure class if not (XLA RESOURCE_EXHAUSTED with its
    allocation report).

A 1-sweep schedule is enough: the memory high-water mark is set by the
env stacks + theta workspace, not the sweep count.

Run:  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
        python -u benchmarks/probe_chi4096.py > /tmp/chi4096.log 2>&1 &
"""
from __future__ import annotations

import os
import time
import traceback

os.environ.setdefault("T4A_COMPILE_CACHE",
                      os.path.expanduser("~/.cache/t4a_xla_bench"))


def footprint_gb(N, chi, d, w):
    """Analytic live f32 footprint of dmrg_run's sweep state (bytes ->
    GB): padded MPS, L/R env stacks ((N+1, chi, w, chi) each), the
    (chi d, chi d) two-site theta + its Lanczos basis (m+1 vectors at
    bf16 in the coarse sweeps, f32 fine), and the gemm2 precontracted
    operands (chi d w, chi d) x2."""
    f = 4 * N * chi * d * chi                 # MPS
    f += 2 * 4 * (N + 1) * chi * w * chi      # env stacks
    f += 4 * (chi * d) ** 2 * 3               # theta + split workspaces
    f += 17 * 2 * (chi * d) ** 2 // 1         # bf16 Lanczos basis m=16
    f += 2 * 4 * (chi * d * w) * (chi * d)    # gemm2 operands
    return f / 1e9


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.dmrg_chain import _setup
    from tensor4all_tpu.ops.dmrg_chain import dmrg_run

    print("devices:", jax.devices(), flush=True)
    dev = jax.devices()[0]
    N, d = 32, 2
    for chi in (3072, 4096):
        print(f"--- chi={chi}: analytic footprint "
              f"{footprint_gb(N, chi, d, 5):.1f} GB of 16 GB ---",
              flush=True)
        try:
            _, _, hp, mpsp, _ = _setup(N, chi, init_rank=64)
            hp = jax.device_put(hp, dev)
            mpsp = jax.device_put(mpsp, dev)
            t0 = time.perf_counter()
            e, _ = dmrg_run(hp, mpsp, n_sweeps=1, lanczos_iters=16,
                            sweep_dtype=jnp.float32,
                            coarse_sweeps=0, gemm2_apply=True,
                            fine_reortho=False, fine_precision="high",
                            ritz_solver="bisect_f32",
                            energy_precision="mixed",
                            fine_split_iters=1)
            e = float(e)
            print(f"chi={chi}: OK e={e:.9f} "
                  f"compile+run {time.perf_counter() - t0:.1f} s",
                  flush=True)
            t0 = time.perf_counter()
            e, _ = dmrg_run(hp, mpsp, n_sweeps=1, lanczos_iters=16,
                            sweep_dtype=jnp.float32, coarse_sweeps=0,
                            gemm2_apply=True, fine_reortho=False,
                            fine_precision="high",
                            ritz_solver="bisect_f32",
                            energy_precision="mixed",
                            fine_split_iters=1)
            print(f"chi={chi}: warm 1-sweep {time.perf_counter() - t0:.1f} s"
                  f" e={float(e):.9f}", flush=True)
        except Exception as exc:  # noqa: BLE001 — the failure IS the data
            print(f"chi={chi}: FAILED {type(exc).__name__}", flush=True)
            msg = str(exc)
            print(msg[:4000], flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
