"""Differentiability of the public compute paths (SURVEY §7 design
stance: Tensor/TT are pytrees; jit+grad must flow through contraction,
evaluation and inner products untouched by the host fast paths)."""

import jax
import jax.numpy as jnp
import numpy as np

from tensor4all_tpu import Index, Tensor, contract
from tensor4all_tpu.tt.tensortrain import TensorTrain


def test_grad_through_contract_chain():
    i, j, k = Index(3), Index(4), Index(5)
    B = Tensor.random(jax.random.PRNGKey(1), [j, k])

    def loss(data):
        A = Tensor([i, j], data)
        C = contract([A, B])
        return jnp.sum(C.data ** 2)

    data = jax.random.normal(jax.random.PRNGKey(0), (3, 4))
    g = jax.grad(loss)(data)
    # finite-difference oracle on one entry
    eps = 1e-6
    d2 = data.at[1, 2].add(eps)
    fd = (loss(d2) - loss(data)) / eps
    assert abs(float(g[1, 2]) - float(fd)) < 1e-4


def test_grad_through_tt_evaluation():
    """d/d(core) of a TT entry — optimization-over-cores use case."""
    tt = TensorTrain.random(jax.random.PRNGKey(0), [2, 2, 2], rank=2)
    cores = [jnp.asarray(c) for c in tt.cores]
    idx = [1, 0, 1]

    def value(c0):
        t = TensorTrain([c0] + cores[1:])
        return t.evaluate(idx)

    g = jax.grad(value)(cores[0])
    eps = 1e-6
    c0p = cores[0].at[0, 1, 1].add(eps)
    fd = (value(c0p) - value(cores[0])) / eps
    assert abs(float(g[0, 1, 1]) - float(fd)) < 1e-4


def test_jit_grad_through_inner():
    tt = TensorTrain.random(jax.random.PRNGKey(2), [2, 2, 2, 2], rank=3)
    cores = [jnp.asarray(c) for c in tt.cores]

    @jax.jit
    def norm2(c0):
        t = TensorTrain([c0] + cores[1:])
        return jnp.real(t.inner(t))

    g = jax.jit(jax.grad(norm2))(cores[0])
    assert g.shape == cores[0].shape
    # <t|t> is quadratic in c0: grad . c0 == 2 <t|t>
    lhs = float(jnp.sum(g * cores[0]))
    rhs = 2.0 * float(norm2(cores[0]))
    assert abs(lhs - rhs) < 1e-8 * max(1.0, abs(rhs))


def test_svd_rejects_tracing_with_clear_error():
    """Truncated SVD picks a data-dependent rank: tracing it must fail
    with a clear TypeError, not a cryptic tracer leak."""
    from tensor4all_tpu import svd

    i, j = Index(4), Index(5)

    def nuclear(data):
        t = Tensor([i, j], data)
        _, S, _, _ = svd(t, left_inds=[i])
        return jnp.sum(S.data)

    data = jax.random.normal(jax.random.PRNGKey(3), (4, 5))
    try:
        jax.grad(nuclear)(data)
        raise AssertionError("expected TypeError under tracing")
    except TypeError as e:
        assert "data-dependent rank" in str(e)
