"""Pallas fused two-site projected-operator apply.

The chi^3 sweep kernel ``theta' = L . Wl . Wr . theta . R`` becomes a
chain of XLA einsums whose (chi, d, d, chi, w) intermediates round-trip
HBM at production chi. This kernel fuses the whole contraction per
(x, B) output tile with all intermediates in VMEM.

Mosaic constraints shaped the formulation: no in-kernel transposes, no
multi-dim contractions, and the minor-most two dims of every block must
be the large (lane-aligned) ones. So the MPO cores are pre-fused into
the environments once per environment update (amortized over all Krylov
iterations at a bond) with the SMALL dims leading:

    LW[i, (m p), x, a] = sum_l L[a, l, x] Wl[l, p, i, m]
    RW[(m j q), b, B]  = sum_r Wr[m, q, j, r] R[b, r, B]
    TH[i, j, a, b]     = theta transposed

and the kernel runs per (x, B) tile, accumulating over (a, b) tiles:

    T1_j[(m p x), b]  = sum_i LW[i] @ TH[i, j]          (2x2 GEMMs)
    out[(p q), x, B] += T1_j[m p rows] @ RW[(m j q)]    (small GEMMs)

— every op an MXU 2-D GEMM with f32 accumulation.

Status (measured, TPU v5e, chi=512 w=8 d=2, K=512 chained):
  - validates against the einsum oracle at bf16 accuracy (3.6e-3);
  - best tiles (tx=128 tB=128 ta=256 tb=128): 23 TF/s effective;
  - the XLA einsum path reaches 76 TF/s on the same contraction, so
    the einsum path (ops/dmrg_chain.py) remains the production path.
    The second stage decomposes into per-(m, p, q) 128x128 GEMMs, too
    small to saturate the MXU; larger tiles trip Mosaic limits.

Hard-won Mosaic notes encoded here (the reason this file stays):
  - kernels traced under `jax_enable_x64=True` (which this library
    turns on globally) crash the remote TPU compile subprocess with an
    opaque "HTTP 500"; `fused_apply` re-traces under
    `jax.enable_x64(False)`. Any future pallas kernel in this repo
    must do the same.
  - multi-dim `dot_general` contractions and in-kernel transposes are
    rejected; formulate as 2-D GEMMs over pre-transposed layouts.
  - blocks whose minor-most two dims are small/unaligned (< 128) fail
    with the same opaque HTTP 500; keep small dims leading.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def fuse_envs(L, Wl, Wr, R):
    """Pre-fuse MPO cores into the environments (once per env update).

    Returns (LW, RW) with layouts [i, (m p), x, a] and [(m j q), b, B].
    """
    nw = Wl.shape[0]
    d = Wl.shape[1]
    chi = L.shape[0]
    LW = jnp.einsum("alx,lpim->impxa", L, Wl).reshape(
        d, nw * d, chi, chi)
    RW = jnp.einsum("mqjr,brB->mjqbB", Wr, R).reshape(
        nw * d * d, chi, chi)
    return LW, RW


def _kernel(lw_ref, th_ref, rw_ref, o_ref, *, nw, d):
    a_blk = pl.program_id(2)
    b_blk = pl.program_id(3)
    lw = lw_ref[...]   # (d, nw*d, tx, ta)      [i, (m p), x, a]
    th = th_ref[...]   # (d, d, ta, tb)         [i, j, a, b]
    rw = rw_ref[...]   # (nw*d*d, tb, tB)       [(m j q), b, B]
    tx = lw.shape[2]
    ta = lw.shape[3]
    tb = th.shape[3]
    tB = rw.shape[2]

    @pl.when((a_blk == 0) & (b_blk == 0))
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    accs = [jnp.zeros((tx, tB), jnp.float32) for _ in range(d * d)]
    for j in range(d):
        t1 = jnp.zeros((nw * d * tx, tb), jnp.float32)
        for i in range(d):
            t1 += jnp.dot(lw[i].reshape(nw * d * tx, ta), th[i, j],
                          preferred_element_type=jnp.float32)
        for m in range(nw):
            for p in range(d):
                rows = t1[(m * d + p) * tx:(m * d + p + 1) * tx, :]
                for q in range(d):
                    accs[p * d + q] += jnp.dot(
                        rows, rw[(m * d + j) * d + q],
                        preferred_element_type=jnp.float32)
    o_ref[...] += jnp.stack(accs)


@functools.partial(
    jax.jit, static_argnames=("tx", "tB", "ta", "tb", "interpret"))
def fused_apply(LW, theta, RW, tx=128, tB=128, ta=256, tb=128,
                interpret=False):
    """Projected two-site apply from pre-fused envs.

    Args:
      LW, RW: from `fuse_envs`.
      theta: (chi, d, d, chi) == (a, i, j, b).
    Returns theta' as (x, p, q, B) == (chi, d, d, chi), f32.
    """
    d, nwd, chi, _ = LW.shape
    nw = nwd // d
    tx = min(tx, chi)
    tB = min(tB, chi)
    ta = min(ta, chi)
    tb = min(tb, chi)
    th = theta.transpose(1, 2, 0, 3)  # (i, j, a, b)
    # Mosaic's remote TPU compiler rejects kernels traced under
    # jax_enable_x64 (64-bit scalars leak into the grid program and the
    # compile subprocess aborts with an opaque HTTP 500). The kernel is
    # pure f32/bf16, so trace it with x64 off.
    with jax.enable_x64(False):
        out = _call(LW, th, RW, tx, tB, ta, tb, nw, d, interpret)
    # [(p q), x, B] -> (x, p, q, B)
    return out.reshape(d, d, chi, chi).transpose(2, 0, 1, 3)


def _call(LW, th, RW, tx, tB, ta, tb, nw, d, interpret=False):
    d_, nwd, chi, _ = LW.shape
    grid = (chi // tx, chi // tB, chi // ta, chi // tb)
    return pl.pallas_call(
        functools.partial(_kernel, nw=nw, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, nwd, tx, ta),
                         lambda x, B, a, b: (0, 0, x, a)),
            pl.BlockSpec((d, d, ta, tb),
                         lambda x, B, a, b: (0, 0, a, b)),
            pl.BlockSpec((nwd * d, tb, tB),
                         lambda x, B, a, b: (0, b, B)),
        ],
        out_specs=pl.BlockSpec((d * d, tx, tB),
                               lambda x, B, a, b: (0, x, B)),
        out_shape=jax.ShapeDtypeStruct((d * d, chi, chi), jnp.float32),
        interpret=interpret,
    )(LW, th, RW)


def two_site_apply(L, Wl, Wr, theta, R, tx=128, tB=128):
    """Convenience: fuse + apply (use `fuse_envs` + `fused_apply`
    directly inside Krylov loops so the fusion amortizes)."""
    LW, RW = fuse_envs(L, Wl, Wr, R)
    return fused_apply(LW, theta, RW, tx=tx, tB=tB)
