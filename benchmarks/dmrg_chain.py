"""Headline benchmark: DMRG, Heisenberg chain N=8, chi=32, 4 sweeps.

Reference: 135.4 ms mean (Rust, 1 thread), energy err 5.3e-15 vs dense
exact — benchmarks/results/2026-06-27-treetn-dmrg-itensornetworks.md.

Uses the fully-jitted fixed-shape sweep engine (ops.dmrg_chain): the
whole multi-sweep run is one XLA program.
"""

from __future__ import annotations

import networkx as nx
import numpy as np


def _setup(N, chi, bond_dim=2, init_rank=None):
    """Build (graph, op, padded MPO, padded MPS) for a Heisenberg chain."""
    import jax
    import jax.numpy as jnp

    from tensor4all_tpu.models.spin import heisenberg
    from tensor4all_tpu.ops.dmrg_chain import (
        pad_mpo,
        pad_mps,
        treeoperator_to_mpo_cores,
    )
    from tensor4all_tpu.treetn.network import random_treetn
    from tensor4all_tpu.tt.compression import right_orthogonalize
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    g = nx.path_graph(N)
    tn, site_inds = random_treetn(
        jax.random.PRNGKey(0), g, {n: [2] for n in g.nodes},
        bond_dim=bond_dim
    )
    sites = {n: site_inds[n][0] for n in g.nodes}
    op = heisenberg(g, sites)
    h = pad_mpo([jnp.asarray(c)
                 for c in treeoperator_to_mpo_cores(op, list(range(N)))])
    tt = right_orthogonalize(TensorTrain.random(
        jax.random.PRNGKey(0), [2] * N, rank=init_rank or chi))
    mps0 = pad_mps(list(tt.cores), chi)
    host_cores = [np.asarray(c) for c in tt.cores]
    return g, op, h, mps0, host_cores


def headline(median_time):
    """The BASELINE headline row alone: DMRG chain N=8 chi=32, 4 sweeps
    (reference 135.4 ms). Production-chi rows live in `prod_row` so the
    bench driver can budget them individually."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensor4all_tpu.models.spin import dense_heisenberg
    from tensor4all_tpu.ops.dmrg_chain import (
        dmrg_run,
        treeoperator_to_mpo_cores,
    )

    N, chi = 8, 32
    g, op, h, mps0, host_cores = _setup(N, chi)

    result = {}
    device = jax.devices()[0]
    h_d = jax.device_put(h, device)
    mps_d = jax.device_put(mps0, device)
    # Precision strategy (ops.dmrg_chain docstring): on accelerators the
    # sweep hot loop runs f32 (full-precision MXU passes) and the energy
    # is a global f64 Rayleigh quotient — err ~ eps_f32^2 ~ 1e-12.
    on_cpu = jax.default_backend() == "cpu"
    sweep_dtype = None if on_cpu else jnp.float32

    if on_cpu:
        # CPU hosts are dispatch-latency-bound at this size: use the
        # host-numpy adaptive engine (same sweeps, same accuracy;
        # ops/tdvp_chain_host.py)
        from tensor4all_tpu.ops.tdvp_chain_host import dmrg_chain_host

        host_h = treeoperator_to_mpo_cores(op, list(range(N)))

        def body():
            e, _, _ = dmrg_chain_host(host_h, host_cores, chi, n_sweeps=4)
            result["energy"] = float(e)
            return e
    else:
        def body():
            e, mps = dmrg_run(h_d, mps_d, n_sweeps=4, lanczos_iters=12,
                              sweep_dtype=sweep_dtype)
            # block via host read-back: block_until_ready is unreliable
            # on the axon remote backend (returns before execution
            # completes)
            result["energy"] = float(e)
            return e

    t = median_time(body, warmup=2, reps=5)
    e0 = np.linalg.eigvalsh(dense_heisenberg(g, list(g.nodes)))[0]
    err = abs(result["energy"] - e0)
    return {
        "metric": "dmrg_chain_N8_chi32_4sweeps_ms",
        "value": t * 1e3,
        "unit": "ms",
        "vs_baseline": 135.4 / (t * 1e3),
        "detail": {
            "energy_abs_err": err,
            "device": str(device),
            "sweep_dtype": "float64" if sweep_dtype is None else "float32",
            "engine": ("host-numpy adaptive" if on_cpu
                       else "jitted one-program"),
        },
    }


# sweep counts re-tuned after the right-env off-by-one fix (ccbcd5b):
# the forward half-sweeps now do real optimization, so the same
# 1e-8-grade e/site needs 2 FEWER sweeps at chi=256/512 (grid
# 2026-08-18: chi=256 ns=4 -0.43741605, chi=512 ns=3 -0.43741620, both
# matching the old 6/4-sweep energies). r4: fine_split_iters=1
# (warm-started splits need one subspace step near convergence) + the
# unrolled-Lanczos engine; grid 2026-08-19 e/site agrees to ~2e-7/site
# with the si=2 runs at every chi. chi=2048 is the institutionalized
# memory-ceiling row (VERDICT r3 #7): ONE rep — it exists to pin that
# the engine FITS and what it costs, not for throughput tuning.
PROD_CONFIGS = {256: (4, 16), 512: (4, 16), 1024: (3, 16),
                2048: (3, 16)}


def prod_row(chip, median_time):
    """One production-scale DMRG row (N=32) with per-sweep TFLOP/s +
    MFU from the analytic engine FLOP model (VERDICT r1 #1). Raises on
    failure; the caller owns error containment and budgets each chi
    individually (a chi=2048 compile must not starve the TCI rows)."""
    import jax
    import jax.numpy as jnp

    from benchmarks.mxu import PEAK_BF16_TFLOPS
    from tensor4all_tpu.ops.dmrg_chain import dmrg_run, dmrg_sweep_flops

    sweeps, lanc = PROD_CONFIGS[chip]
    Np = 32
    device = jax.devices()[0]
    # r3 production schedule ("3c-b32", dmrg_speed_grid3): all but the
    # LAST sweep run coarse (single-bf16-pass matmuls, m=8
    # 3-term-recurrence Lanczos, bf16 basis, Newton-Schulz splits at
    # one subspace iteration); the final fine sweep (3-pass f32
    # applies, m=16, QR splits) restores the f32-grade state —
    # e_per_site matched the all-fine run to ~1e-7/site at chi=512 and
    # the energy is an f64 Rayleigh quotient regardless. Ritz pairs by
    # native-f32 Sturm bisection (f64 elementwise is emulated on TPU).
    # energy_precision='mixed': the final Rayleigh quotient runs at
    # f32-'highest' grade (~1e-6 relative; the f64 scan is 525 ms of
    # emulated GEMMs at chi=512 — 38% of the run — while the optimized
    # STATE is identical)
    knobs = dict(coarse_sweeps=sweeps - 1,
                 coarse_lanczos_iters=8, coarse_bf16=True,
                 coarse_reortho=False, coarse_ns_split=True,
                 gemm2_apply=True, fine_reortho=False,
                 fine_precision="high", ritz_solver="bisect_f32",
                 energy_precision="mixed", fine_split_iters=1)
    _, _, hp, mpsp, _ = _setup(Np, chip)
    hp = jax.device_put(hp, device)
    mpsp = jax.device_put(mpsp, device)

    def big():
        e, _ = dmrg_run(hp, mpsp, n_sweeps=sweeps, lanczos_iters=lanc,
                        sweep_dtype=jnp.float32, **knobs)
        return float(e)

    ep = big()  # compile
    reps = 1 if chip >= 2048 else 3
    tp = median_time(big, warmup=0, reps=reps)
    fl = dmrg_sweep_flops(Np, chip, 2, hp.shape[1], lanc, sweeps,
                          coarse_sweeps=sweeps - 1,
                          coarse_lanczos_iters=8, coarse_reortho=False,
                          coarse_ns_split=True, fine_reortho=False,
                          gemm2_apply=True, fine_split_iters=1)
    tflops = fl / tp / 1e12
    key = f"dmrg_N32_chi{chip}"
    out = {
        f"{key}_{sweeps}sweeps_ms": round(tp * 1e3, 1),
        f"{key}_e_per_site": round(ep / Np, 8),
        f"{key}_tflops": round(tflops, 2),
        f"{key}_mfu_vs_bf16_peak": round(tflops / PEAK_BF16_TFLOPS, 4),
    }
    if reps == 1:
        out[f"{key}_reps"] = 1  # memory-ceiling row
    return out


def run(median_time):
    """Headline + all production rows (journal compatibility; the bench
    driver calls `headline` and `prod_row` separately for budgeting)."""
    import jax

    result = headline(median_time)
    if jax.default_backend() != "cpu":
        for chip in PROD_CONFIGS:
            try:
                result["detail"].update(prod_row(chip, median_time))
            except Exception as exc:  # noqa: BLE001
                result["detail"][f"dmrg_N32_chi{chip}_error"] = (
                    f"{type(exc).__name__}: {exc}")
    return result
