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
