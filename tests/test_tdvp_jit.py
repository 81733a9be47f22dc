"""Jitted fixed-shape TDVP chain engine tests (ops.tdvp_chain)."""

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np
from scipy.linalg import expm

from tensor4all_tpu.models.spin import dense_heisenberg, heisenberg
from tensor4all_tpu.ops.dmrg_chain import treeoperator_to_mpo_cores
from tensor4all_tpu.ops.tdvp_chain import tdvp_chain
from tensor4all_tpu.treetn.network import random_treetn
from tensor4all_tpu.tt.tensortrain import TensorTrain


def _setup(N, chi):
    g = nx.Graph()
    for i in range(N - 1):
        g.add_edge(i, i + 1)
    _, si = random_treetn(jax.random.PRNGKey(0), g,
                          {n: [2] for n in g.nodes}, bond_dim=2)
    op = heisenberg(g, {n: si[n][0] for n in g.nodes})
    h_cores = treeoperator_to_mpo_cores(op, list(range(N)))
    H = dense_heisenberg(g, list(g.nodes))
    tt = TensorTrain.random(jax.random.PRNGKey(1), [2] * N, rank=chi)
    psi0 = np.array(np.asarray(tt.full_tensor())).reshape(-1)
    psi0 = psi0 / np.linalg.norm(psi0)
    return h_cores, list(tt.cores), H, psi0


def _densify(mps, N):
    arrs = [np.asarray(mps[k]) for k in range(N)]
    cores = [arrs[0][:1]] + arrs[1:-1] + [arrs[-1][..., :1]]
    return np.asarray(TensorTrain(
        [jnp.asarray(c) for c in cores]).full_tensor()).reshape(-1)


def test_tdvp_chain_real_time():
    N, chi = 8, 32
    h_cores, cores0, H, psi0 = _setup(N, chi)
    T = 0.08
    mps = tdvp_chain(h_cores, cores0, -1j * T, chi, nsteps=4, order=2,
                     engine="jit")
    got = _densify(mps, N)
    expect = expm(-1j * T * H) @ psi0
    assert np.linalg.norm(got - expect) < 5e-5
    assert abs(np.linalg.norm(got) - 1.0) < 1e-8


def test_tdvp_chain_imaginary_time_real_dtype():
    """Real sweep dtype (the TPU path on chips without complex
    kernels): imaginary-time evolution matches dense expm direction."""
    N, chi = 8, 32
    h_cores, cores0, H, psi0 = _setup(N, chi)
    tau = 0.3
    mps = tdvp_chain(h_cores, cores0, -tau, chi, nsteps=4, order=2,
                     sweep_dtype=jnp.float64, engine="jit")
    got = _densify(mps, N)
    expect = expm(-tau * H) @ psi0
    dev = np.linalg.norm(got / np.linalg.norm(got)
                         - expect / np.linalg.norm(expect))
    assert dev < 1e-4


def test_tdvp_chain_order1_converges_first_order():
    N, chi = 6, 16
    h_cores, cores0, H, psi0 = _setup(N, chi)
    T = 0.02
    expect = expm(-1j * T * H) @ psi0
    errs = []
    for nsteps in (4, 8):
        mps = tdvp_chain(h_cores, cores0, -1j * T, chi, nsteps=nsteps,
                         order=1, engine="jit")
        errs.append(np.linalg.norm(_densify(mps, N) - expect))
    # chi >= full rank: the projected evolution is exact here, so the
    # only error left is roundoff (the order-1 gauge bug this test
    # guards against produced 1e-3-level bias)
    assert max(errs) < 1e-10, errs


def test_tdvp_chain_purely_imaginary_cores():
    """Regression (VERDICT r2 weak #3): the per-core norm guard used
    norm(astype(float64)) which DROPS the imaginary part — a purely
    imaginary core divided by ~0 and NaN'd the whole evolution."""
    N, chi = 6, 16
    h_cores, cores0, H, psi0 = _setup(N, chi)
    # rotate the state by a global i: physics identical up to phase
    cores_im = [1j * np.asarray(cores0[0])] + [np.asarray(c)
                                               for c in cores0[1:]]
    T = 0.05
    mps = tdvp_chain(h_cores, cores_im, -1j * T, chi, nsteps=2, order=2,
                     engine="jit")
    got = _densify(mps, N)
    assert np.all(np.isfinite(got))
    expect = expm(-1j * T * H) @ psi0
    # compare up to the global phase the engine's normalization dropped
    ph = np.vdot(expect, got)
    ph = ph / abs(ph)
    assert np.linalg.norm(got / ph - expect) < 5e-4


def test_expm_tridiag_e0_matches_eigh():
    """GEMM-only scaling-and-squaring exp(c T) e0 vs dense expm via
    eigendecomposition, real and complex coefficients, incl. dead
    (zero) slots and large ||cT|| (many squarings)."""
    from tensor4all_tpu.ops.tdvp_chain import _expm_tridiag_e0

    rng = np.random.default_rng(3)
    for trial in range(30):
        m = int(rng.integers(3, 17))
        a = rng.standard_normal(m) * (10.0 if trial % 4 == 0 else 1.0)
        b = rng.standard_normal(m)
        b[m - 1] = 0.0
        if trial % 3 == 0:  # dead slots decouple
            k = int(rng.integers(1, m))
            b[k - 1:] = 0.0
            a[k:] = 0.0
        T = np.diag(a) + np.diag(b[:-1], 1) + np.diag(b[:-1], -1)
        for c in (-0.37, -0.05 + 0.0j, -1j * 0.31, 0.2 - 0.7j):
            ev, U = np.linalg.eigh(T)
            want = (U @ (np.exp(c * ev) * U[0, :].conj()))
            got = np.asarray(_expm_tridiag_e0(jnp.asarray(a),
                                              jnp.asarray(b), c))
            np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_expm_tridiag_pair_e0_matches_complex():
    """Pair-arithmetic variant (complex-less TPUs) matches the complex
    reference for real-time and mixed coefficients."""
    from tensor4all_tpu.ops.tdvp_chain_split import _expm_tridiag_pair_e0

    rng = np.random.default_rng(4)
    for _ in range(10):
        m = int(rng.integers(3, 14))
        a = rng.standard_normal(m) * 3.0
        b = rng.standard_normal(m)
        b[m - 1] = 0.0
        T = np.diag(a) + np.diag(b[:-1], 1) + np.diag(b[:-1], -1)
        for cr, ci in ((0.0, -0.4), (-0.12, 0.3), (0.05, 0.0)):
            ev, U = np.linalg.eigh(T)
            want = U @ (np.exp((cr + 1j * ci) * ev) * U[0, :])
            gr, gi = _expm_tridiag_pair_e0(jnp.asarray(a), jnp.asarray(b),
                                           cr, ci)
            np.testing.assert_allclose(np.asarray(gr), want.real,
                                       rtol=1e-11, atol=1e-11)
            np.testing.assert_allclose(np.asarray(gi), want.imag,
                                       rtol=1e-11, atol=1e-11)


def test_tdvp_fast_knobs_match_default():
    """gemm2_apply + reortho=False + precision='high' keep the
    trajectory within the step-error contract (the TPU production
    knobs; the FLOP model mirrors them)."""
    from tensor4all_tpu.ops.dmrg_chain import pad_mpo, pad_mps
    from tensor4all_tpu.ops.tdvp_chain import tdvp_run

    N, chi = 8, 32
    h_cores, cores0, H, psi0 = _setup(N, chi)
    T = 0.08
    h = pad_mpo([jnp.asarray(c, jnp.complex128) for c in h_cores])
    mps0 = pad_mps([jnp.asarray(c, jnp.complex128) for c in cores0], chi)
    mps = tdvp_run(h, mps0, -1j * T, nsteps=4, order=2, krylov_m=12,
                   orthogonalize=True, precision="high", reortho=False,
                   gemm2_apply=True)
    got = _densify(mps, N)
    expect = expm(-1j * T * H) @ psi0
    assert np.linalg.norm(got - expect) < 5e-5
    assert abs(np.linalg.norm(got) - 1.0) < 1e-8
