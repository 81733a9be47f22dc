"""Pallas fused two-site apply: interpret-mode validation on CPU.

The real-TPU path is exercised manually (see ops/pallas_apply.py
docstring for measured numbers); CI validates the kernel's math via
pallas interpret mode against einsum oracles. The kernel accumulates
in f32 by design, so the large-shape case is checked against an f64
oracle with an f32-roundoff-scaled bound (the plain f32 einsum itself
drifts ~5e-3 from f64 at these shapes).
"""

import jax
import jax.numpy as jnp

from tensor4all_tpu.ops.pallas_apply import fuse_envs, fused_apply


def _rand(chi, w, d, seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    L = jax.random.normal(ks[0], (chi, w, chi), jnp.float32)
    R = jax.random.normal(ks[1], (chi, w, chi), jnp.float32)
    Wl = jax.random.normal(ks[2], (w, d, d, w), jnp.float32)
    Wr = jax.random.normal(ks[3], (w, d, d, w), jnp.float32)
    th = jax.random.normal(ks[4], (chi, d, d, chi), jnp.float32)
    return L, Wl, Wr, th, R


def _oracle(L, Wl, Wr, th, R, dtype):
    return jnp.einsum(
        "alx,lpim,mqjr,aijb,brB->xpqB",
        *[x.astype(dtype) for x in (L, Wl, Wr, th, R)], optimize=True)


def test_fused_apply_exact_small():
    # Small contraction: f32 roundoff is negligible, so the kernel must
    # match the oracle tightly — catches any structural/index bug.
    L, Wl, Wr, th, R = _rand(chi=8, w=2, d=2, seed=0)
    LW, RW = fuse_envs(L, Wl, Wr, R)
    got = fused_apply(LW, th, RW, interpret=True)
    ref = _oracle(L, Wl, Wr, th, R, jnp.float64)
    rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
    assert rel < 1e-5


def test_fused_apply_grid_accumulation():
    # chi > tile sizes so the (a, b) accumulation loop actually runs;
    # f32 accumulation drift vs the f64 oracle bounds the check.
    L, Wl, Wr, th, R = _rand(chi=256, w=4, d=2, seed=1)
    LW, RW = fuse_envs(L, Wl, Wr, R)
    got = fused_apply(LW, th, RW, tx=128, tB=128, ta=128, tb=128,
                      interpret=True)
    ref = _oracle(L, Wl, Wr, th, R, jnp.float64)
    rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
    assert rel < 2e-2
    # and structure: correlation with the oracle must be ~1 (a wrong
    # index permutation would destroy it long before 2e-2 max error).
    g = got.astype(jnp.float64).ravel()
    r = ref.ravel()
    corr = float(jnp.dot(g, r) / (jnp.linalg.norm(g) * jnp.linalg.norm(r)))
    assert corr > 1 - 1e-6
