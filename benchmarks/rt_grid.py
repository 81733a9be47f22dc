"""Real-time split-TDVP orthonormalization grid (companion to
benchmarks/results/2026-08-21-rt-roofline.md).

Measures `ops.tdvp_chain_split.tdvp_run_split` wall time per config on
the bench state (N=32 Heisenberg, 4 order-2 steps, full-rank random
start) and the gold overlap of each fast config against the
high-precision reference (split_iters=2, precision='highest', corth
splits) at chi=256. This is the driver that produced the r5 ladder:

    r3 base (corth)        2907 ms   |  cholqr_split        3157 ms
    +karatsuba             2781 ms   |  bench_r4 (cholqr)   2677 ms
    r4 no cholqr           2461 ms   |  cholqr1 (PROD)      1867 ms
    gold overlaps: qr 0.9999992, cholqr1 0.9999977, stacked 0.9999881,
    eq 0.99942

Run:  nohup env PYTHONPATH=/root/repo:/root/.axon_site \
        python -u benchmarks/rt_grid.py > /tmp/rt_grid.log 2>&1 &

NOTE: run ONE TPU client at a time — two concurrent JAX processes on
the tunneled chip deadlock each other and can wedge the remote worker
for ~15 minutes (observed 2026-08-21).
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("T4A_COMPILE_CACHE",
                      os.path.expanduser("~/.cache/t4a_xla_bench"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pair_inner_host(ar, ai, br, bi):
    """<a|b> of padded split pairs, f64 on host (transfer contraction;
    dead padded slots are zero so the plain scan is exact)."""
    import numpy as np

    a = np.asarray(ar, np.float64) + 1j * np.asarray(ai, np.float64)
    b = np.asarray(br, np.float64) + 1j * np.asarray(bi, np.float64)
    N, chi = a.shape[0], a.shape[1]
    E = np.zeros((chi, chi), complex)
    E[0, 0] = 1.0
    for k in range(N):
        E = np.einsum("ab,aic,bid->cd", E, a[k].conj(), b[k],
                      optimize=True)
    return E[0, 0]


def norm_host(ar, ai):
    return abs(pair_inner_host(ar, ai, ar, ai)) ** 0.5


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.dmrg_chain import _setup
    from tensor4all_tpu.ops.tdvp_chain_split import tdvp_run_split

    dev = jax.devices()[0]
    N, m, nsteps = 32, 12, 4
    base = dict(nsteps=nsteps, order=2, krylov_m=m, orthogonalize=True,
                split_iters=1, complete_basis=False, precision="high",
                reortho=False)
    fast = dict(karatsuba=True, bf16_tail=3, krylov_m1=8,
                expm_max_squarings=8)
    cfgs = {
        "r3_base": {},
        "karatsuba": dict(karatsuba=True),
        "cholqr_full": dict(cholqr_split=True),
        "r4_bench": dict(fast, cholqr_split=True),
        "r4_no_cholqr": dict(fast),
        "eq": dict(fast, split_orth="eq"),
        "stacked": dict(fast, split_orth="stacked"),
        "cholqr1_PROD": dict(fast, split_orth="cholqr1"),
    }
    results = {}
    for chi in (256, 512):
        _, _, h, mps0, _ = _setup(N, chi)
        h_d = jax.device_put(h.astype(jnp.float32), dev)
        mr = jax.device_put(mps0.astype(jnp.float32), dev)
        mi = jax.device_put(jnp.zeros_like(mr), dev)
        gold = None
        names = list(cfgs) if chi == 256 else ["r4_bench",
                                               "cholqr1_PROD"]
        for name in names + ["gold"]:
            if name == "gold":
                if chi != 256:
                    continue
                kw = dict(base, split_iters=2, precision="highest")
            else:
                kw = dict(base)
                kw.update(cfgs[name])
            t0 = time.time()
            r_, i_ = tdvp_run_split(h_d, mr, mi, 0.0, -0.05, **kw)
            float(jnp.sum(r_[0]))
            tc = time.time() - t0
            ts = []
            for _ in range(3):
                t0 = time.time()
                r_, i_ = tdvp_run_split(h_d, mr, mi, 0.0, -0.05, **kw)
                float(jnp.sum(r_[0]))
                ts.append(time.time() - t0)
            ts.sort()
            fin = bool(jnp.isfinite(r_).all() & jnp.isfinite(i_).all())
            print(f"chi={chi} {name:14s} warm {ts[1]*1e3:8.1f} ms "
                  f"(compile+1 {tc:.1f}s) finite={fin}", flush=True)
            if name == "gold":
                gold = (np.asarray(r_), np.asarray(i_))
            results[(chi, name)] = (np.asarray(r_), np.asarray(i_))
        if gold is not None:
            br, bi = gold
            gn = norm_host(br, bi)
            for name in names:
                ar, ai = results[(chi, name)]
                ov = abs(pair_inner_host(ar, ai, br, bi)) / (
                    norm_host(ar, ai) * gn)
                print(f"chi={chi} {name:14s} gold overlap {ov:.7f}",
                      flush=True)


if __name__ == "__main__":
    main()
