"""Round-4 bench-knob grid on TPU: reproduce the 779af76/474aac9 probe
numbers that the session lost, and extend them to the rows VERDICT r3
asks bench.py to carry.

  A. imaginary-time TDVP chi=256/512: r3 bench knobs vs +cholqr_split
  B. DMRG chi=512 with the r4 bench schedule (fine_split_iters=1)
  C. real-time split TDVP chi=256/512, nsteps=4: karatsuba/cholqr grid,
     with norm-conservation drift + overlap-vs-gold at chi=256
  D. linsolve_run_tol chi=256/512 to tol=1e-6 (certified residual,
     sweeps used, wall)
  E. comb-tree DMRG chi=512

Run:  nohup env PYTHONPATH=/root/repo python -u benchmarks/r4_grid.py \
          > /tmp/r4grid.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("T4A_COMPILE_CACHE",
                      os.path.expanduser("~/.cache/t4a_xla_bench"))


def _median(f, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def _pair_inner(ar, ai, br, bi):
    """<a|b> for padded split MPS pairs, f32 on device: returns
    (re, im). Dead padded slots are zero so plain transfer contraction
    is exact."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def go(ar, ai, br, bi):
        N, chi, d, _ = ar.shape
        hi = jax.lax.Precision.HIGHEST  # 3-pass f32: the default
        # single-bf16-pass einsum reads ~1e-2 off on chi=512 transfers
        er = jnp.zeros((chi, chi), jnp.float32).at[0, 0].set(1.0)
        ei = jnp.zeros((chi, chi), jnp.float32)

        def step(c, ops):
            er, ei = c
            xr, xi, yr, yi = ops
            # E'[c,f] = sum_{a,b,d} x[a,d,c] E[a,b] y[b,d,f]
            def t(e, x, y):
                tmp = jnp.einsum("ab,bdf->adf", e, y, precision=hi)
                return jnp.einsum("adc,adf->cf", x, tmp, precision=hi)
            # complex: E' = conj(x)^T (er + i ei) y with
            # conj(x) = xr - i xi, y = yr + i yi
            rr = (t(er, xr, yr) + t(er, xi, yi)
                  + t(ei, xi, yr) - t(ei, xr, yi))
            ii = (t(ei, xr, yr) + t(er, xr, yi)
                  - t(er, xi, yr) + t(ei, xi, yi))
            er2, ei2 = rr, ii
            return (er2, ei2), 0.0

        (er, ei), _ = jax.lax.scan(step, (er, ei), (ar, ai, br, bi))
        return er[0, 0], ei[0, 0]

    r, i = go(ar, ai, br, bi)
    return float(r), float(i)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.dmrg_chain import _setup
    from benchmarks.mxu import PEAK_BF16_TFLOPS
    from tensor4all_tpu.ops.dmrg_chain import (dmrg_run,
                                               dmrg_sweep_flops,
                                               pad_mps)
    from tensor4all_tpu.ops.tdvp_chain import tdvp_run, tdvp_sweep_flops
    from tensor4all_tpu.ops.tdvp_chain_split import tdvp_run_split
    from tensor4all_tpu.ops.linsolve_chain import (linsolve_run_tol,
                                                   linsolve_sweep_flops)
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    print("devices:", jax.devices(), flush=True)
    dev = jax.devices()[0]
    N, d = 32, 2
    out = {}

    def rec(name, row):
        out[name] = row
        print(name, row, flush=True)

    # ---------------- A. imaginary-time TDVP ----------------
    for chi in (256, 512):
        _, _, hp, mpsp, _ = _setup(N, chi)
        hp = jax.device_put(hp.astype(jnp.float32), dev)
        mpsp = jax.device_put(mpsp.astype(jnp.float32), dev)
        base = dict(order=2, krylov_m=12, sweep_dtype=jnp.float32,
                    orthogonalize=True, precision="high", reortho=False,
                    gemm2_apply=True, bf16_tail=2, krylov_m1=6,
                    expm_max_squarings=8)
        if chi == 256:
            base = dict(order=2, krylov_m=12, sweep_dtype=jnp.float32,
                        orthogonalize=True, precision="high",
                        reortho=False, gemm2_apply=True)
        for tag, kw in (("r3", {}), ("cholqr", dict(cholqr_split=True))):
            cfg = {**base, **kw}

            def body():
                o = tdvp_run(hp, mpsp, -0.05, nsteps=4, **cfg)
                return o, float(jnp.sum(jnp.abs(o[0])))

            t0 = time.perf_counter()
            o, _ = body()
            tc = time.perf_counter() - t0
            fin = bool(jnp.isfinite(o).all())
            t = _median(lambda: body()[1], reps=3)
            fl = tdvp_sweep_flops(N, chi, d, hp.shape[1], 12, 4,
                                  order=2, reortho=False,
                                  gemm2_apply=True,
                                  krylov_m1=base.get("krylov_m1"))
            rec(f"tdvp_chi{chi}_{tag}",
                dict(ms=round(t * 1e3, 1), compile_s=round(tc, 1),
                     finite=fin,
                     mfu=round(fl / t / 1e12 / PEAK_BF16_TFLOPS, 4)))

    # ---------------- B. DMRG chi=512 r4 schedule ----------------
    chi = 512
    _, _, hp, mpsp, _ = _setup(N, chi)
    hp = jax.device_put(hp, dev)
    mpsp = jax.device_put(mpsp, dev)
    knobs = dict(coarse_sweeps=3, coarse_lanczos_iters=8,
                 coarse_bf16=True, coarse_reortho=False,
                 coarse_ns_split=True, gemm2_apply=True,
                 fine_reortho=False, fine_precision="high",
                 ritz_solver="bisect_f32", energy_precision="mixed",
                 fine_split_iters=1)

    def bodyd():
        e, _ = dmrg_run(hp, mpsp, n_sweeps=4, lanczos_iters=16,
                        sweep_dtype=jnp.float32, **knobs)
        return float(e)

    t0 = time.perf_counter()
    e = bodyd()
    tc = time.perf_counter() - t0
    t = _median(bodyd, reps=3)
    fl = dmrg_sweep_flops(N, chi, 2, hp.shape[1], 16, 4,
                          coarse_sweeps=3, coarse_lanczos_iters=8,
                          coarse_reortho=False, coarse_ns_split=True,
                          fine_reortho=False, gemm2_apply=True,
                          fine_split_iters=1)
    rec("dmrg_chi512_r4", dict(ms=round(t * 1e3, 1),
                               compile_s=round(tc, 1),
                               e_per_site=round(e / N, 9),
                               mfu=round(fl / t / 1e12 / PEAK_BF16_TFLOPS,
                                         4)))

    # ---------------- C. real-time split TDVP ----------------
    rng = np.random.default_rng(0)
    for chi in (256, 512):
        _, _, hp, mpsp, _ = _setup(N, chi)
        hp = jax.device_put(hp.astype(jnp.float32), dev)
        mr0 = jax.device_put(mpsp.astype(jnp.float32), dev)
        mi0 = jax.device_put(jnp.zeros_like(mr0), dev)
        grid = [("r3", dict()),
                ("kara", dict(karatsuba=True)),
                ("kara_cholqr", dict(karatsuba=True, cholqr_split=True))]
        if chi == 512:
            grid = [("kara", dict(karatsuba=True)),
                    ("kara_cholqr", dict(karatsuba=True,
                                         cholqr_split=True))]
        gold = None
        for tag, kw in grid:
            cfg = dict(order=2, krylov_m=12, orthogonalize=True,
                       split_iters=1, complete_basis=False,
                       precision="high", reortho=False, bf16_tail=3,
                       krylov_m1=8, expm_max_squarings=8, **kw)

            def body():
                r_, i_ = tdvp_run_split(hp, mr0, mi0, 0.0, -0.05,
                                        nsteps=4, **cfg)
                return r_, i_, float(jnp.sum(r_[0] ** 2 + i_[0] ** 2))

            t0 = time.perf_counter()
            r_, i_, _ = body()
            tc = time.perf_counter() - t0
            fin = bool(jnp.isfinite(r_).all() & jnp.isfinite(i_).all())
            nrm, _ = _pair_inner(r_, i_, r_, i_)
            t = _median(lambda: body()[2], reps=3)
            fl = tdvp_sweep_flops(N, chi, d, hp.shape[1], 12, 4,
                                  order=2, complex_dtype=True,
                                  reortho=False, krylov_m1=8,
                                  karatsuba=kw.get("karatsuba", False))
            row = dict(ms=round(t * 1e3, 1), compile_s=round(tc, 1),
                       finite=fin, norm=round(nrm, 6),
                       mfu=round(fl / t / 1e12 / PEAK_BF16_TFLOPS, 4))
            if chi == 256:
                if gold is None:
                    gr, gi = tdvp_run_split(
                        hp, mr0, mi0, 0.0, -0.05, nsteps=4, order=2,
                        krylov_m=12, orthogonalize=True, split_iters=2,
                        complete_basis=True, precision="highest",
                        reortho=True)
                    gold = (gr, gi)
                    gn, _ = _pair_inner(gr, gi, gr, gi)
                    print("gold norm", gn, flush=True)
                ovr, ovi = _pair_inner(gold[0], gold[1], r_, i_)
                gn, _ = _pair_inner(gold[0], gold[1], gold[0], gold[1])
                row["fid_vs_gold"] = round(
                    (ovr ** 2 + ovi ** 2) / (gn * nrm), 7)
            rec(f"tdvp_split_rt_chi{chi}_{tag}", row)

    # ---------------- D. linsolve to tolerance ----------------
    for chi, chib in ((256, 128), (512, 256)):
        _, _, hp, mpsp, _ = _setup(N, chi)
        hp = jax.device_put(hp.astype(jnp.float32), dev)
        x0 = jax.device_put(mpsp.astype(jnp.float32), dev)
        bt = TensorTrain.random(jax.random.PRNGKey(1), [2] * N,
                                rank=chib, dtype=jnp.float32)
        b = jax.device_put(pad_mps(list(bt.cores), chib), dev)

        def bodyl():
            cert, est, x, sw = linsolve_run_tol(
                hp, b, x0, 1.0, 0.05, tol=1e-6, max_sweeps=8,
                minres_m=16, gemm2_apply=True, bf16=True,
                precision="high")
            return float(cert), float(est), x, float(sw)

        t0 = time.perf_counter()
        cert, est, x, sw = bodyl()
        tc = time.perf_counter() - t0
        fin = bool(jnp.isfinite(x).all())
        t = _median(lambda: bodyl()[0], reps=3)
        fl = linsolve_sweep_flops(N, chi, chib, 2, hp.shape[1], 16,
                                  int(sw), gemm2_apply=True)
        rec(f"linsolve_tol_chi{chi}",
            dict(ms=round(t * 1e3, 1), compile_s=round(tc, 1),
                 certified=float(f"{cert:.3e}"),
                 estimate=float(f"{est:.3e}"), sweeps=sw, finite=fin,
                 mfu=round(fl / t / 1e12 / PEAK_BF16_TFLOPS, 4)))

    # ---------------- E. comb chi=512 ----------------
    from tensor4all_tpu.ops.dmrg_comb import (comb_heisenberg_stacks,
                                              dmrg_comb_run,
                                              dmrg_comb_sweep_flops,
                                              random_comb_state)

    Nb, Mt, chit = 16, 2, 4
    wb64, wt64 = comb_heisenberg_stacks(Nb, Mt)
    chi = 512
    wb = jax.device_put(wb64.astype(jnp.float32), dev)
    wt = jax.device_put(wt64.astype(jnp.float32), dev)
    ab0, at0 = random_comb_state(jax.random.PRNGKey(0), Nb, Mt, chi, chit)
    ab0 = jax.device_put(ab0.astype(jnp.float32), dev)
    at0 = jax.device_put(at0.astype(jnp.float32), dev)

    def bodyc():
        e, _, _ = dmrg_comb_run(wb, wt, ab0, at0, n_sweeps=4,
                                lanczos_iters=16, tooth_lanczos_iters=8,
                                gemm2_apply=True, reortho=False,
                                ritz_solver="bisect_f32",
                                energy_precision="mixed",
                                precision="high")
        return float(e)

    t0 = time.perf_counter()
    e = bodyc()
    tc = time.perf_counter() - t0
    t = _median(bodyc, reps=3)
    fl = dmrg_comb_sweep_flops(Nb, Mt, chi, chit, d, wb.shape[1], 4, 16,
                               8, gemm2_apply=True, reortho=False)
    rec("comb_chi512", dict(ms=round(t * 1e3, 1), compile_s=round(tc, 1),
                            e_per_site=round(e / (Nb * (1 + Mt)), 8),
                            mfu=round(fl / t / 1e12 / PEAK_BF16_TFLOPS,
                                      4)))

    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
