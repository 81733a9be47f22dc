"""TDVP precision-roofline decomposition (companion to
benchmarks/results/2026-08-19-tdvp-roofline.md).

Splits the analytic FLOP model of ``ops.tdvp_chain.tdvp_run`` (the same
model ``bench.py`` uses for its TFLOP/s rows — every knob mirrored) into
the Krylov APPLY GEMMs vs everything else, and prices the applies at
their pass-weighted bf16 light speed: the engine runs f32-grade applies
as THREE bf16 MXU passes ('high' precision), EXCEPT that with
``bf16_tail=k`` only the k LEADING Krylov iterations are full-precision
and every iteration i >= k runs its H-apply single-pass bf16 (factorial
coefficient decay — see tdvp_run's docstring; the engine cond is
``i < tail ? full : single-pass``, tdvp_chain.py:192, for BOTH the
two-site and the one-site propagators). The r4 ADVICE review caught the
original version of this script pricing the split the other way round
(k tail iterations cheap instead of m-k), which overstated the chi=512
apply light speed by ~2x; the corrected weighting is below. The quotient

    t_apply_light / t_measured

is the fraction of wall time the engine spends at the precision-limited
roofline of its own GEMM stream; the residual is per-bond fixed cost
(two QR splits per bond at (chi*d, chi) + env refresh + small-m Krylov
vector ops), cross-checked against the DMRG slope profile's measured
QR panel cost (benchmarks/results/2026-08-18-roofline.md).

Run: python benchmarks/tdvp_roofline.py
"""
from __future__ import annotations

import os
import sys

import numpy as np
import opt_einsum as oe

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from benchmarks.mxu import PEAK_BF16_TFLOPS  # noqa: E402
from tensor4all_tpu.ops.tdvp_chain import bond_gemm_flops  # noqa: E402

PEAK_BF16 = PEAK_BF16_TFLOPS * 1e12  # TPU v5 lite; single source of truth


def _ec(expr, shapes):
    _, info = oe.contract_path(
        expr, *[np.empty(s, np.float32) for s in shapes])
    return float(info.opt_cost)


def decompose(N: int, chi: int, d: int, w: int, m: int, nsteps: int,
              order: int = 2, m1: int | None = None,
              bf16_tail: int = 0) -> dict:
    """FLOP split + pass-weighted apply light-speed time.

    Mirrors ops.tdvp_chain.tdvp_sweep_flops for the production knobs
    (gemm2_apply=True, reortho=False) used by bench.py's TDVP rows.
    """
    apply2, apply1, pre2, pre1 = bond_gemm_flops(chi, d, w)
    env = _ec("alx,aib,loir,xoB->brB",
              [(chi, w, chi), (chi, d, chi), (w, d, d, w), (chi, d, chi)])
    td2, td1 = chi * d * d * chi, chi * d * chi
    m1 = m if m1 is None else m1

    theta0 = 2.0 * chi ** 3 * d ** 2
    qr = 4 * 2.0 * (chi * d) * chi ** 2
    mm = 4 * 2.0 * (chi * d) * (d * chi) * chi
    apply_gemm = m * apply2 + m1 * apply1 + pre2 + pre1
    vec = m * 8 * td2 + m1 * 8 * td1
    other_bond = theta0 + qr + mm + env + vec

    nb = (N - 1) * (2 if order == 2 else 1) * nsteps
    env_scan = (N - 1) * env * (2 if order == 2 else 1) * nsteps
    total = nb * (apply_gemm + other_bond) + env_scan

    # pass-weighted apply time: 'high' = 3 bf16 passes. Engine
    # semantics (tdvp_chain.py:192, docstring :118-130): with
    # bf16_tail=k the FIRST k Krylov iterations of EACH propagator
    # (two-site m and one-site m1 alike) run full-precision; every
    # iteration i >= k runs single-pass bf16. The per-bond
    # precontractions (pre2/pre1) always run at 'high'.
    a3 = (min(bf16_tail, m) * apply2 + min(bf16_tail, m1) * apply1
          + pre2 + pre1) if bf16_tail else (
        m * apply2 + m1 * apply1 + pre2 + pre1)
    a1 = (max(m - bf16_tail, 0) * apply2
          + max(m1 - bf16_tail, 0) * apply1) if bf16_tail else 0.0
    t_apply_light = nb * (3 * a3 + a1) / PEAK_BF16
    return {
        "bond_visits": nb,
        "total_tf": total / 1e12,
        "apply_gemm_share": nb * apply_gemm / total,
        "t_apply_light_s": t_apply_light,
        "mfu_ceiling_nongemm_free": total / t_apply_light / PEAK_BF16,
    }


def decompose_split(N: int, chi: int, d: int, w: int, m: int,
                    nsteps: int, order: int = 2, m1: int | None = None,
                    bf16_tail: int = 0,
                    karatsuba: bool = True) -> dict:
    """Pass-weighted apply light speed for the REAL-TIME split engine
    (``ops.tdvp_chain_split.tdvp_run_split``), VERDICT r3 #2.

    Mirrors ``tdvp_sweep_flops(complex_dtype=True, karatsuba=...)``:
    a complex-complex H-apply runs ``cmul_x`` real GEMM streams per
    logical GEMM (4, or 3 under Karatsuba — _cmul_ein3), each stream
    priced at 3 bf16 MXU passes when full-precision ('high') and 1
    pass when in the bf16 tail (same i<tail cond as the imaginary-time
    engine). The per-bond precontractions multiply a complex pair by
    the REAL MPO core — 2 real einsum streams, always 'high' (3-pass).
    """
    apply2, apply1, pre2, pre1 = bond_gemm_flops(chi, d, w)
    m1 = m if m1 is None else m1
    cmul_x = 3.0 if karatsuba else 4.0

    nb = (N - 1) * (2 if order == 2 else 1) * nsteps
    # complex applies, pass-weighted: i < bf16_tail full (3-pass
    # per real stream), i >= tail single-pass — per real stream.
    # Both terms clamp at 0 (ADVICE r4: bf16_tail > m must not
    # produce negative tail FLOPs).
    a_full = (min(bf16_tail, m) * apply2 + min(bf16_tail, m1) * apply1
              ) if bf16_tail else (m * apply2 + m1 * apply1)
    a_tail = (max(m - bf16_tail, 0) * apply2
              + max(m1 - bf16_tail, 0) * apply1) if bf16_tail else 0.0
    t_apply_light = nb * (cmul_x * (3 * a_full + a_tail)
                          + 2 * 3 * (pre2 + pre1)) / PEAK_BF16
    from tensor4all_tpu.ops.tdvp_chain import tdvp_sweep_flops

    total = tdvp_sweep_flops(N, chi, d, w, m, nsteps, order=order,
                             complex_dtype=True, reortho=False,
                             gemm2_apply=True, krylov_m1=m1,
                             karatsuba=karatsuba)
    return {
        "bond_visits": nb,
        "total_tf": total / 1e12,
        "t_apply_light_s": t_apply_light,
        "mfu_ceiling_nongemm_free": total / t_apply_light / PEAK_BF16,
    }


if __name__ == "__main__":
    # measured rows: bench.py TDVP detail (STATUS/BENCH journal)
    for chi, t_meas, kn in ((256, 0.403, {}),
                            (512, 1.75, dict(m1=6, bf16_tail=2))):
        r = decompose(32, chi, 2, 5, 12, 4, **kn)
        resid = t_meas - r["t_apply_light_s"]
        print(f"chi={chi}: model {r['total_tf']:.2f} TF "
              f"(apply share {r['apply_gemm_share']:.1%}); "
              f"apply light-speed {r['t_apply_light_s']*1e3:.0f} ms "
              f"vs measured {t_meas*1e3:.0f} ms "
              f"-> {r['t_apply_light_s']/t_meas:.0%} of roofline; "
              f"residual {resid*1e3:.0f} ms over {r['bond_visits']} bonds "
              f"= {resid/r['bond_visits']*1e3:.2f} ms/bond fixed; "
              f"non-GEMM-free MFU ceiling "
              f"{r['mfu_ceiling_nongemm_free']:.1%}")
    # real-time split engine: pass measured seconds as chi=seconds
    # pairs (e.g. `python benchmarks/tdvp_roofline.py 512=1.08`), else
    # model-only (ADVICE r4: positional argv required a dummy first
    # argument to supply only chi=512)
    meas = {}
    for arg in sys.argv[1:]:
        try:
            chi_s, sec_s = arg.split("=", 1)
            meas[int(chi_s)] = float(sec_s)
        except ValueError:
            sys.exit(f"usage: {sys.argv[0]} [CHI=SECONDS ...] "
                     f"(got {arg!r})")
    for chi, t_meas in ((256, meas.get(256)), (512, meas.get(512))):
        r = decompose_split(32, chi, 2, 5, 12, 4, m1=8, bf16_tail=3)
        line = (f"split rt chi={chi}: model {r['total_tf']:.2f} TF; "
                f"apply light-speed {r['t_apply_light_s']*1e3:.0f} ms; "
                f"non-GEMM-free MFU ceiling "
                f"{r['mfu_ceiling_nongemm_free']:.1%}")
        if t_meas is not None:
            resid = t_meas - r["t_apply_light_s"]
            line += (f"; measured {t_meas*1e3:.0f} ms -> "
                     f"{r['t_apply_light_s']/t_meas:.0%} of roofline, "
                     f"residual {resid/r['bond_visits']*1e3:.2f} ms/bond")
        print(line)
