"""Jitted fixed-shape COMB-tree DMRG engine tests (ops.dmrg_comb).

The comb engine is the first tree-topology engine whose backbone bond
is production-scale (VERDICT r3 missing #1); these tests pin its
variational contract against dense exact diagonalization on every code
path: tooth depths Mt = 0..3, truncating and exact tooth bonds,
gemm2 applies, f32 sweeps, onsite fields, and restart-from-state.

Reference parity: the Rust reference sweeps arbitrary trees through
per-region plans (tensor4all-treetn/src/tdvp/plan.rs:1-379); dense-ED
energy parity on small combs is the same oracle its tree DMRG
benchmarks use (results/2026-06-27-treetn-dmrg-itensornetworks.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor4all_tpu.models.spin import dense_heisenberg
from tensor4all_tpu.ops.dmrg_comb import (
    comb_graph,
    comb_heisenberg_stacks,
    dmrg_comb_run,
    random_comb_state,
)


def exact_ground(Nb, Mt, h=0.0):
    g = comb_graph(Nb, Mt)
    return float(np.linalg.eigvalsh(
        np.asarray(dense_heisenberg(g, list(g.nodes), h=h)))[0])


@pytest.mark.parametrize("Nb,Mt,chi,chit", [
    (3, 1, 16, 4),
    (3, 2, 16, 8),
    (2, 3, 16, 8),
])
def test_comb_heisenberg_vs_dense_ed(key, Nb, Mt, chi, chit):
    wb, wt = comb_heisenberg_stacks(Nb, Mt)
    ab0, at0 = random_comb_state(key, Nb, Mt, chi, chit)
    e, _, _ = dmrg_comb_run(wb, wt, ab0, at0, n_sweeps=6)
    assert abs(float(e) - exact_ground(Nb, Mt)) < 1e-11


def test_comb_mt0_reduces_to_chain(key):
    """Mt = 0 is a pure backbone chain (zero-sized tooth stacks)."""
    wb, wt = comb_heisenberg_stacks(4, 0)
    assert wt.shape[1] == 0
    ab0, at0 = random_comb_state(key, 4, 0, 16, 1)
    assert at0.shape[1] == 0
    e, _, _ = dmrg_comb_run(wb, wt, ab0, at0, n_sweeps=5)
    assert abs(float(e) - exact_ground(4, 0)) < 1e-11


def test_comb_gemm2_apply_parity(key):
    wb, wt = comb_heisenberg_stacks(3, 2)
    ab0, at0 = random_comb_state(key, 3, 2, 16, 8)
    e, _, _ = dmrg_comb_run(wb, wt, ab0, at0, n_sweeps=6,
                            gemm2_apply=True)
    assert abs(float(e) - exact_ground(3, 2)) < 1e-11


def test_comb_truncating_tooth_bond(key):
    """chit below the exact Schmidt rank still converges variationally
    (and the truncated energy upper-bounds the exact one)."""
    wb, wt = comb_heisenberg_stacks(3, 2)
    ab0, at0 = random_comb_state(key, 3, 2, 8, 4)
    e, _, _ = dmrg_comb_run(wb, wt, ab0, at0, n_sweeps=6)
    e0 = exact_ground(3, 2)
    assert e0 - 1e-12 < float(e) < e0 + 1e-6


def test_comb_f32_sweeps(key):
    """f32 sweeps with the f64 Rayleigh-quotient epilogue: the
    equilibrated subspace-QR split must hold f32-grade state quality
    (this pins the sigma-vs-sigma^2 column-scaling fix; the
    unequilibrated split plateaued at a deterministic 7.3e-4 bias)."""
    wb, wt = comb_heisenberg_stacks(3, 2)
    ab0, at0 = random_comb_state(key, 3, 2, 16, 8)
    e, _, _ = dmrg_comb_run(wb, wt, ab0, at0, n_sweeps=6,
                            sweep_dtype=jnp.float32)
    assert abs(float(e) - exact_ground(3, 2)) < 1e-7


def test_comb_onsite_field(key):
    wb, wt = comb_heisenberg_stacks(3, 1, h=0.3)
    ab0, at0 = random_comb_state(key, 3, 1, 16, 4)
    e, _, _ = dmrg_comb_run(wb, wt, ab0, at0, n_sweeps=6)
    assert abs(float(e) - exact_ground(3, 1, h=0.3)) < 1e-11


def test_comb_restart_from_state(key):
    """The returned (Ab, At) stacks restart cleanly: one more sweep
    from a converged state stays at the optimum."""
    wb, wt = comb_heisenberg_stacks(3, 2)
    ab0, at0 = random_comb_state(key, 3, 2, 16, 8)
    e1, ab, at = dmrg_comb_run(wb, wt, ab0, at0, n_sweeps=6)
    e2, _, _ = dmrg_comb_run(wb, wt, ab, at, n_sweeps=1)
    assert abs(float(e2) - float(e1)) < 1e-12
