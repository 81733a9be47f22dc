"""Jitted fixed-shape DMRG engine tests (ops.dmrg_chain)."""

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np
import pytest

from tensor4all_tpu.models.spin import (
    dense_heisenberg,
    dense_tfi,
    heisenberg,
    transverse_field_ising,
)
from tensor4all_tpu.ops.dmrg_chain import (
    dmrg_chain,
    pad_mpo,
    pad_mps,
    treeoperator_to_mpo_cores,
)
from tensor4all_tpu.treetn.network import random_treetn


def chain(n):
    g = nx.Graph()
    for i in range(n - 1):
        g.add_edge(i, i + 1)
    return g


def hamiltonian_cores(g, model, **kw):
    dims = {n: [2] for n in g.nodes}
    _, site_inds = random_treetn(jax.random.PRNGKey(0), g, dims, bond_dim=2)
    sites = {n: site_inds[n][0] for n in g.nodes}
    op = model(g, sites, **kw)
    return treeoperator_to_mpo_cores(op, list(g.nodes))


def test_pad_roundtrip():
    cores = [np.random.default_rng(0).standard_normal(s)
             for s in [(1, 2, 3), (3, 2, 4), (4, 2, 1)]]
    p = pad_mps(cores, 4)
    assert p.shape == (3, 4, 2, 4)
    np.testing.assert_allclose(np.asarray(p[0][:1, :, :3]), cores[0])
    with pytest.raises(ValueError):
        pad_mps(cores, 2)


def test_dmrg_jit_heisenberg_chain8():
    g = chain(8)
    h_cores = hamiltonian_cores(g, heisenberg)
    e, mps = dmrg_chain(h_cores, chi=32, n_sweeps=4, lanczos_iters=16)
    e0 = np.linalg.eigvalsh(dense_heisenberg(g, list(g.nodes)))[0]
    assert abs(float(e) - e0) < 1e-12


def test_dmrg_jit_tfi():
    g = chain(6)
    h_cores = hamiltonian_cores(g, transverse_field_ising, J=1.0, h=0.9)
    e, _ = dmrg_chain(h_cores, chi=16, n_sweeps=4, lanczos_iters=16)
    e0 = np.linalg.eigvalsh(dense_tfi(g, list(g.nodes), J=1.0, h=0.9))[0]
    assert abs(float(e) - e0) < 1e-11


def test_dmrg_jit_matches_treetn_dmrg():
    """Jitted engine agrees with the flexible TreeTN DMRG."""
    from tensor4all_tpu.treetn.dmrg import DmrgOptions, dmrg

    g = chain(6)
    dims = {n: [2] for n in g.nodes}
    tn, site_inds = random_treetn(jax.random.PRNGKey(1), g, dims,
                                  bond_dim=8)
    sites = {n: site_inds[n][0] for n in g.nodes}
    op = heisenberg(g, sites)
    res = dmrg(op, tn, options=DmrgOptions(nsweeps=5, maxdim=16))
    h_cores = treeoperator_to_mpo_cores(op, list(g.nodes))
    e, _ = dmrg_chain(h_cores, chi=16, n_sweeps=5, lanczos_iters=16)
    assert abs(float(e) - res.energy) < 1e-11


def test_dmrg_f32_large_chain_regression():
    """N=32, chi=64, f32 sweeps: a right-canonical random init holds the
    full state norm (~1e-19) in core 0, whose f32 sum-of-squares
    underflowed and silently zeroed the first theta — garbage energies
    on CPU, NaN on TPU. The engine now normalizes cores before the
    precision cast (scale-invariant for DMRG)."""
    import networkx as nx

    from tensor4all_tpu.models.spin import heisenberg
    from tensor4all_tpu.ops.dmrg_chain import (
        dmrg_run,
        pad_mpo,
        pad_mps,
        treeoperator_to_mpo_cores,
    )
    from tensor4all_tpu.treetn.network import random_treetn
    from tensor4all_tpu.tt.compression import right_orthogonalize
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    N, chi = 32, 64
    g = nx.path_graph(N)
    tn, site_inds = random_treetn(jax.random.PRNGKey(0), g,
                                  {n: [2] for n in g.nodes}, bond_dim=2)
    sites = {n: site_inds[n][0] for n in g.nodes}
    op = heisenberg(g, sites)
    h = pad_mpo([jnp.asarray(c)
                 for c in treeoperator_to_mpo_cores(op, list(range(N)))])
    tt = right_orthogonalize(
        TensorTrain.random(jax.random.PRNGKey(0), [2] * N, rank=chi))
    mps0 = pad_mps(list(tt.cores), chi)
    e = float(dmrg_run(h, mps0, n_sweeps=1, lanczos_iters=8,
                       sweep_dtype=jnp.float32)[0])
    # one sweep already reaches the right ballpark (-0.4368/site);
    # the underflow bug produced ~0 or positive energies
    assert e / N < -0.42, e / N


def test_dmrg_run_coarse_schedule_energy_parity(key):
    """Coarse/fine precision schedule (bf16-pass early sweeps + one
    subspace iteration per split) must reach the same energy as the
    all-fine run — DMRG's variational self-correction."""
    import jax.numpy as jnp
    import networkx as nx

    from tensor4all_tpu.models.spin import dense_heisenberg, heisenberg
    from tensor4all_tpu.ops.dmrg_chain import (
        dmrg_run,
        pad_mpo,
        pad_mps,
        treeoperator_to_mpo_cores,
    )
    from tensor4all_tpu.treetn.network import random_treetn
    from tensor4all_tpu.tt.compression import right_orthogonalize
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    N, chi = 8, 32
    g = nx.path_graph(N)
    tn, si = random_treetn(key, g, {n: [2] for n in g.nodes}, bond_dim=2)
    sites = {n: si[n][0] for n in g.nodes}
    op = heisenberg(g, sites)
    h = pad_mpo([jnp.asarray(c) for c in
                 treeoperator_to_mpo_cores(op, list(range(N)))])
    tt = right_orthogonalize(TensorTrain.random(key, [2] * N, rank=chi))
    mps0 = pad_mps(list(tt.cores), chi)
    e_exact = float(np.linalg.eigvalsh(
        np.asarray(dense_heisenberg(g, list(g.nodes))))[0])
    e_fine, _ = dmrg_run(h, mps0, n_sweeps=4, lanczos_iters=12,
                         sweep_dtype=jnp.float32)
    e_coarse, _ = dmrg_run(h, mps0, n_sweeps=4, lanczos_iters=12,
                           sweep_dtype=jnp.float32, coarse_sweeps=2)
    assert abs(float(e_fine) - e_exact) < 1e-10
    assert abs(float(e_coarse) - e_exact) < 1e-10


def test_dmrg_run_sharded_matches_single_device(key):
    """VERDICT r2 #6: the flagship jitted engine runs chi-partitioned
    over an 8-device mesh (shard_map, explicit psum_scatter/all_gather)
    and matches the single-device engine AND dense exact diagonalization
    to 1e-10 at full-rank chi."""
    import networkx as nx

    from jax.sharding import Mesh
    from tensor4all_tpu.ops.dmrg_chain import (
        dmrg_run,
        dmrg_run_sharded,
        pad_mpo,
        pad_mps,
        treeoperator_to_mpo_cores,
    )
    from tensor4all_tpu.treetn.network import random_treetn
    from tensor4all_tpu.tt.compression import right_orthogonalize
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    N, chi = 8, 16  # chi = 2^(N/2): exact-capacity, deterministic optimum
    g = nx.path_graph(N)
    tn, si = random_treetn(key, g, {n: [2] for n in g.nodes}, bond_dim=2)
    sites = {n: si[n][0] for n in g.nodes}
    op = heisenberg(g, sites)
    h = pad_mpo([jnp.asarray(c) for c in
                 treeoperator_to_mpo_cores(op, list(range(N)))])
    tt0 = right_orthogonalize(
        TensorTrain.random(key, [2] * N, rank=chi, dtype=jnp.float64))
    c0 = list(tt0.cores)
    c0[0] = c0[0] / jnp.sqrt(jnp.sum(c0[0] ** 2))
    mps0 = pad_mps(c0, chi)

    e1, _ = dmrg_run(h, mps0, n_sweeps=4, lanczos_iters=20)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
    e2, mps2 = dmrg_run_sharded(h, mps0, mesh, n_sweeps=4,
                                lanczos_iters=20)
    assert abs(float(e1) - float(e2)) < 1e-10
    # the returned MPS is genuinely sharded over the mesh
    assert len(mps2.sharding.device_set) == 8


def test_dmrg_run_sharded_program_has_collectives(key):
    """The sharded engine's HLO must contain the explicit collective ops
    (reduce-scatter/all-reduce/all-gather) — proof the intermediates
    live sharded rather than GSPMD replicating everything."""
    import networkx as nx

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tensor4all_tpu.ops.dmrg_chain import pad_mpo, pad_mps

    # lower just the shard_map'd sweep body via the public entry
    from tensor4all_tpu.ops import dmrg_chain as dc

    N, chi = 6, 8
    W = np.zeros((3, 2, 2, 3))
    sz = np.diag([0.5, -0.5])
    W[0, :, :, 0] = np.eye(2)
    W[2, :, :, 2] = np.eye(2)
    W[0, :, :, 1] = sz
    W[1, :, :, 2] = sz
    cores = [jnp.asarray(c) for c in [W[0:1]] + [W] * (N - 2)
             + [W[:, :, :, 2:3]]]
    h = dc.pad_mpo(cores)
    key = jax.random.PRNGKey(1)
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    tt = TensorTrain.random(key, [2] * N, rank=chi, dtype=jnp.float64)
    mps0 = dc.pad_mps(tt.cores, chi)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
    lowered = jax.jit(
        lambda: dc.dmrg_run_sharded(h, mps0, mesh, n_sweeps=1,
                                    lanczos_iters=4)
    ).lower()
    txt = lowered.compile().as_text()
    assert ("reduce-scatter" in txt or "all-reduce" in txt)
    assert "all-gather" in txt


def test_tridiag_ground_matches_eigh():
    """Sturm-bisection + inverse-iteration ground pair vs LAPACK eigh,
    incl. sentinel-padded dead slots and near-degenerate ghost clusters
    (the fixed-iteration Lanczos regimes the engine produces)."""
    from tensor4all_tpu.ops.dmrg_chain import _tridiag_ground

    rng = np.random.default_rng(7)
    for trial in range(40):
        m = int(rng.integers(4, 21))
        a = rng.standard_normal(m)
        b = rng.standard_normal(m)
        b[m - 1] = 0.0
        if trial % 3 == 0:  # dead-slot sentinel block
            k = int(rng.integers(1, m))
            b[k - 1:] = 0.0
            a[k:] = a[:k].max() + 2.0 + 4.0 * np.abs(b).max()
        if trial % 5 == 0:  # ghost near-degeneracy
            a[:2] = a[0]
            b[0] = 1e-9
        T = np.diag(a) + np.diag(b[:-1], 1) + np.diag(b[:-1], -1)
        ev = np.linalg.eigvalsh(T)
        lam, v = _tridiag_ground(jnp.asarray(a), jnp.asarray(b))
        lam, v = float(lam), np.asarray(v)
        scale = max(abs(ev[0]), abs(ev[-1]), 1.0)
        assert abs(lam - ev[0]) / scale < 1e-8
        # residual check is degeneracy-safe (any cluster vector passes)
        assert np.linalg.norm(T @ v - lam * v) / scale < 1e-8
        assert abs(np.linalg.norm(v) - 1.0) < 1e-12


def test_dmrg_ritz_bisect_matches_eigh_run():
    """Full N=8 runs with ritz_solver='bisect' vs 'eigh' agree to 1e-12
    (the reference energy-parity bar)."""
    from tensor4all_tpu.ops.dmrg_chain import dmrg_run

    g = chain(8)
    cores = hamiltonian_cores(g, heisenberg)
    h = pad_mpo([jnp.asarray(c) for c in cores])
    from tensor4all_tpu.tt.compression import right_orthogonalize
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    tt = right_orthogonalize(TensorTrain.random(
        jax.random.PRNGKey(0), [2] * 8, rank=16, dtype=jnp.float64))
    c0 = list(tt.cores)
    c0[0] = c0[0] / jnp.sqrt(jnp.sum(c0[0] ** 2))
    mps0 = pad_mps(c0, 16)
    e_b, _ = dmrg_run(h, mps0, n_sweeps=4, lanczos_iters=12,
                      ritz_solver="bisect")
    e_e, _ = dmrg_run(h, mps0, n_sweeps=4, lanczos_iters=12,
                      ritz_solver="eigh")
    assert abs(float(e_b) - float(e_e)) < 1e-12


def test_dmrg_energy_precision_mixed():
    """energy_precision='mixed' evaluates the final Rayleigh quotient in
    f32-'highest' — same optimized state, energy within ~1e-6 relative of
    the f64 evaluation (the documented evaluation-error grade)."""
    from tensor4all_tpu.ops.dmrg_chain import dmrg_run

    g = chain(8)
    cores = hamiltonian_cores(g, heisenberg)
    h = pad_mpo([jnp.asarray(c) for c in cores])
    from tensor4all_tpu.tt.compression import right_orthogonalize
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    tt = right_orthogonalize(TensorTrain.random(
        jax.random.PRNGKey(0), [2] * 8, rank=16, dtype=jnp.float64))
    c0 = list(tt.cores)
    c0[0] = c0[0] / jnp.sqrt(jnp.sum(c0[0] ** 2))
    mps0 = pad_mps(c0, 16)
    e_f64, mps_a = dmrg_run(h, mps0, n_sweeps=4, lanczos_iters=12)
    e_mix, mps_b = dmrg_run(h, mps0, n_sweeps=4, lanczos_iters=12,
                            energy_precision="mixed")
    # identical state (the knob only changes the energy EVALUATION)
    np.testing.assert_array_equal(np.asarray(mps_a), np.asarray(mps_b))
    assert abs(float(e_mix) - float(e_f64)) < 1e-5 * abs(float(e_f64))


def test_dmrg_star_engine_matches_exact():
    """Jitted one-program STAR engine (ops/dmrg_star.py) vs dense exact
    diagonalization on the reference's flagship star shapes, with and
    without fields."""
    import networkx as nx

    from tensor4all_tpu.models.spin import dense_heisenberg
    from tensor4all_tpu.ops.dmrg_star import dmrg_star_heisenberg

    for K, h in ((7, 0.0), (4, 0.3)):
        g = nx.star_graph(K)
        e, hub, leaves = dmrg_star_heisenberg(K, h=h, n_sweeps=6,
                                              lanczos_iters=12)
        e_exact = np.linalg.eigvalsh(
            np.asarray(dense_heisenberg(g, list(g.nodes), h=h)))[0]
        assert abs(float(e) - e_exact) < 1e-10, (K, h, float(e), e_exact)
        # leaves come out right-canonical toward the hub
        lv = np.asarray(leaves)
        for k in range(K):
            np.testing.assert_allclose(lv[k] @ lv[k].T, np.eye(2),
                                       atol=1e-10)


def test_dmrg_star_engine_general_terms():
    """star engine with per-edge GENERAL two-site terms (TFI-style ZZ +
    transverse field folded into the edge terms) vs dense oracle."""
    import jax.numpy as jnp
    import networkx as nx

    from tensor4all_tpu.ops.dmrg_star import dmrg_star_run, star_pair_terms

    K = 5
    Z = np.diag([1.0, -1.0])
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    A, B, h_hub = star_pair_terms(
        pass_ops=[Z], complete_ops=[-Z], K=K,
        onsite_hub=-0.7 * X, onsite_leaf=-0.7 * X)
    rng = np.random.default_rng(1)
    hub0 = jnp.asarray(rng.standard_normal((2,) * (K + 1)))
    leaves0 = jnp.asarray(rng.standard_normal((K, 2, 2)))
    e, _, _ = dmrg_star_run(A, B, h_hub, hub0, leaves0, n_sweeps=8,
                            lanczos_iters=12)
    # dense oracle: -sum_k Z_hub Z_k - 0.7 sum_v X_v on the star
    N = K + 1
    H = np.zeros((2 ** N, 2 ** N))

    def kron_at(ops):
        out = np.eye(1)
        for v in range(N):
            out = np.kron(out, ops.get(v, np.eye(2)))
        return out

    for k in range(1, N):
        H -= kron_at({0: Z, k: Z})
    for v in range(N):
        H -= 0.7 * kron_at({v: X})
    e_exact = np.linalg.eigvalsh(H)[0]
    assert abs(float(e) - e_exact) < 1e-10, (float(e), e_exact)


def test_star_terms_from_treeoperator_roundtrip():
    """TreeOperator -> (A, B, h_hub) extraction (Hilbert-Schmidt
    projection with exactness assert) feeds the star engine: energy
    matches dense ED; non-star operators are rejected."""
    import networkx as nx

    from tensor4all_tpu.models.spin import dense_heisenberg, heisenberg
    from tensor4all_tpu.ops.dmrg_star import (
        dmrg_star_run,
        star_terms_from_dense,
        star_terms_from_treeoperator,
    )
    from tensor4all_tpu.treetn.network import random_treetn

    K = 5
    g = nx.star_graph(K)
    _, si = random_treetn(jax.random.PRNGKey(0), g,
                          {n: [2] for n in g.nodes}, bond_dim=2)
    op = heisenberg(g, {n: si[n][0] for n in g.nodes}, h=0.3)
    A, B, h_hub = star_terms_from_treeoperator(
        op, hub=0, leaves=list(range(1, K + 1)))
    rng = np.random.default_rng(0)
    hub0 = jnp.asarray(rng.standard_normal((2,) * (K + 1)))
    leaves0 = jnp.asarray(rng.standard_normal((K, 2, 2)))
    e, _, _ = dmrg_star_run(A, B, h_hub, hub0, leaves0, n_sweeps=8,
                            lanczos_iters=12)
    e0 = np.linalg.eigvalsh(
        np.asarray(dense_heisenberg(g, list(g.nodes), h=0.3)))[0]
    assert abs(float(e) - e0) < 1e-10

    # a CHAIN operator mislabeled as a star must be rejected (it has a
    # leaf-leaf term)
    g2 = nx.path_graph(4)
    _, si2 = random_treetn(jax.random.PRNGKey(1), g2,
                           {n: [2] for n in g2.nodes}, bond_dim=2)
    op2 = heisenberg(g2, {n: si2[n][0] for n in g2.nodes})
    H2 = np.asarray(op2.to_dense_matrix(order=[1, 0, 2, 3]))
    with pytest.raises(ValueError, match="not star-local"):
        star_terms_from_dense(H2, K=3)


def test_dmrg_star_engine_qutrit_random_star_local():
    """General d (qutrit) star: random star-local Hermitian terms,
    extraction + engine vs dense ED — exercises the general-d operator
    basis and the d-bond exact splits beyond spin-1/2."""
    from tensor4all_tpu.ops.dmrg_star import (
        dmrg_star_run,
        star_terms_from_dense,
    )

    rng = np.random.default_rng(0)
    K, d = 3, 3
    N = K + 1

    def kron_at(ops):
        out = np.eye(1)
        for v in range(N):
            out = np.kron(out, ops.get(v, np.eye(d)))
        return out

    def rand_herm():
        X = rng.standard_normal((d, d))
        return (X + X.T) / 2

    H = kron_at({0: rand_herm()})
    for k in range(1, N):
        for _ in range(2):
            H += kron_at({0: rand_herm(), k: rand_herm()})
        H += kron_at({k: rand_herm()})
    H += 0.37 * np.eye(d ** N)

    A, B, h_hub = star_terms_from_dense(H, K=K, d=d)
    hub0 = jnp.asarray(rng.standard_normal((d,) * (K + 1)))
    leaves0 = jnp.asarray(rng.standard_normal((K, d, d)))
    e, _, _ = dmrg_star_run(A, B, h_hub, hub0, leaves0, n_sweeps=10,
                            lanczos_iters=16)
    e0 = np.linalg.eigvalsh(H)[0]
    assert abs(float(e) - e0) < 1e-10


def test_dmrg_fwd_half_sweep_is_identity_on_converged_state():
    """Regression for the right-environment off-by-one (2026-08-18): the
    forward half-sweep optimized against an H_eff with site k+1
    double-counted (a dense probe showed that operator has spurious
    states BELOW the true constrained optimum — a forward half-sweep on
    a CONVERGED state moved the energy by 2e-3). With correct envs a
    half-sweep on a converged state is the identity, which also makes
    fine_half_sweep a valid production schedule."""
    from tensor4all_tpu.ops.dmrg_chain import dmrg_run

    g = nx.path_graph(8)
    _, si = random_treetn(jax.random.PRNGKey(0), g,
                          {n: [2] for n in g.nodes}, bond_dim=2)
    op = heisenberg(g, {n: si[n][0] for n in g.nodes})
    from tensor4all_tpu.ops.dmrg_chain import pad_mpo, pad_mps
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    h = pad_mpo([jnp.asarray(c) for c in
                 treeoperator_to_mpo_cores(op, list(range(8)))])
    tt = TensorTrain.random(jax.random.PRNGKey(1), [2] * 8, rank=32,
                            dtype=jnp.float64)
    mps0 = pad_mps(tt.cores, 32)
    e0 = np.linalg.eigvalsh(
        np.asarray(dense_heisenberg(g, list(g.nodes))))[0]
    _, mps = dmrg_run(h, mps0, n_sweeps=4, lanczos_iters=16)
    for m in (2, 16):
        e_h, _ = dmrg_run(h, mps, n_sweeps=1, lanczos_iters=m,
                          fine_half_sweep=True)
        assert abs(float(e_h) - e0) < 1e-10, (m, float(e_h), e0)


def test_dmrg_star_chain_legs_matches_exact():
    """Chain-leg star DMRG (exact dressed-leaf reduction,
    star_chain_legs_terms) vs dense ED: K legs of length L >= 2,
    with and without fields; the unfolded leg cores must reproduce
    the composite leaf exactly."""
    import networkx as nx

    from tensor4all_tpu.models.spin import dense_heisenberg
    from tensor4all_tpu.ops.dmrg_star import (
        dmrg_star_heisenberg_legs,
        unfold_composite_leaf,
    )

    for K, L, h in ((3, 2, 0.0), (2, 3, 0.0), (2, 2, 0.3)):
        g = nx.Graph()
        order = ["hub"]
        for k in range(K):
            prev = "hub"
            for j in range(L):
                v = (k, j)
                g.add_edge(prev, v)
                order.append(v)
                prev = v
        e, hub, leaves = dmrg_star_heisenberg_legs(
            K, L, h=h, n_sweeps=8, lanczos_iters=14)
        e_exact = np.linalg.eigvalsh(
            np.asarray(dense_heisenberg(g, order, h=h)))[0]
        assert abs(float(e) - e_exact) < 1e-9, \
            (K, L, h, float(e), e_exact)
        # composite leaves are right-canonical toward the hub, and the
        # sequential-SVD unfolding reconstructs them exactly
        D = 2 ** L
        lv = np.asarray(leaves)
        for k in range(K):
            np.testing.assert_allclose(lv[k] @ lv[k].T, np.eye(D),
                                       atol=1e-9)
            cores = unfold_composite_leaf(lv[k], 2, L)
            rec = cores[0]
            for c in cores[1:]:
                rec = np.tensordot(rec, c, axes=([rec.ndim - 1], [0]))
            rec = rec.reshape(D, D)
            np.testing.assert_allclose(rec, lv[k], atol=1e-10)


def test_dmrg_star_chain_legs_reduces_to_single_site():
    """L=1 chain-leg spec must agree with the native single-site-leaf
    builder (star_pair_terms) bit-for-bit."""
    from tensor4all_tpu.models.spin import SM, SP, SZ
    from tensor4all_tpu.ops.dmrg_star import (
        star_chain_legs_terms,
        star_pair_terms,
    )

    kw = dict(pass_ops=[SZ, SP, SM],
              complete_ops=[SZ, 0.5 * SM, 0.5 * SP], K=4,
              onsite_leaf=0.2 * SZ)
    A1, B1, h1 = star_pair_terms(**kw)
    A2, B2, h2 = star_chain_legs_terms(L=1, **kw)
    np.testing.assert_array_equal(np.asarray(A1), np.asarray(A2))
    np.testing.assert_array_equal(np.asarray(B1), np.asarray(B2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_dmrg_fine_cholqr_and_split_iters_energy_parity():
    """r4 fine-sweep knobs (shifted-CholeskyQR splits; one warm-started
    subspace iteration per split — the production chi>=512 schedule)
    reach the same ground-state energy as the default QR/2-iteration
    path."""
    from tensor4all_tpu.ops.dmrg_chain import dmrg_run

    g = chain(8)
    h_cores = hamiltonian_cores(g, heisenberg)
    h = pad_mpo([jnp.asarray(c) for c in h_cores])
    from tensor4all_tpu.tt.compression import right_orthogonalize
    from tensor4all_tpu.tt.tensortrain import TensorTrain

    tt = right_orthogonalize(TensorTrain.random(
        jax.random.PRNGKey(0), [2] * 8, rank=32))
    mps0 = pad_mps(list(tt.cores), 32)
    e0 = np.linalg.eigvalsh(dense_heisenberg(g, list(g.nodes)))[0]
    for knobs in (dict(fine_cholqr=True),
                  dict(fine_split_iters=1),
                  dict(fine_cholqr=True, fine_split_iters=1)):
        e, _ = dmrg_run(h, mps0, n_sweeps=4, lanczos_iters=16, **knobs)
        assert abs(float(e) - e0) < 1e-11, knobs
