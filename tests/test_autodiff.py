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
    """Truncated SVD with a tolerance-based policy picks a data-dependent
    rank: tracing it must fail with a clear TypeError, not a cryptic
    tracer leak."""
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


def _fd_grad(f, x, eps=1e-6):
    """Central finite-difference gradient of scalar f at real array x."""
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        m = it.multi_index
        xp, xm = x.copy(), x.copy()
        xp[m] += eps
        xm[m] -= eps
        g[m] = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) \
            / (2 * eps)
        it.iternext()
    return g


def test_grad_through_full_svd_singular_sum():
    """Ref ad_integration.rs:15-31: d(sum of singular values)/dA matches
    finite differences."""
    from tensor4all_tpu.core.decomp import svd_truncated_fixed_rank

    a0 = np.array([[2.0, 0.5], [1.0, 3.0]])

    def loss(a):
        _, s, _ = svd_truncated_fixed_rank(a, 2)
        return jnp.sum(s)

    g = jax.grad(loss)(jnp.asarray(a0))
    fd = _fd_grad(loss, a0)
    np.testing.assert_allclose(np.asarray(g), fd, atol=1e-6)


def test_grad_through_truncated_svd_reconstruction():
    """Gradient of a TRUNCATED reconstruction loss (rank 2 of a 4x5)
    matches finite differences to 1e-6 (VERDICT r1 item 3 'done'
    criterion), including jit."""
    from tensor4all_tpu.core.decomp import svd_truncated_fixed_rank

    rng = np.random.default_rng(5)
    a0 = rng.standard_normal((4, 5))
    b = rng.standard_normal((4, 5))

    def loss(a):
        u, s, vh = svd_truncated_fixed_rank(a, 2)
        rec = (u * s[None, :]) @ vh
        return jnp.sum(rec * b)

    g = jax.grad(loss)(jnp.asarray(a0))
    fd = _fd_grad(loss, a0)
    np.testing.assert_allclose(np.asarray(g), fd, atol=1e-6)
    gj = jax.jit(jax.grad(loss))(jnp.asarray(a0))
    np.testing.assert_allclose(np.asarray(gj), np.asarray(g), atol=1e-10)


def test_grad_truncated_svd_rank_deficient_no_nan():
    """Exactly-repeated zero singular values in the discarded block must
    yield finite gradients (the builtin rule NaNs on 0/0)."""
    from tensor4all_tpu.core.decomp import svd_truncated_fixed_rank

    # rank-1 matrix: three exactly-zero singular values
    a0 = jnp.asarray(np.outer([1.0, 2.0, 3.0, 4.0], [1.0, 0.5, -1.0]))

    def loss(a):
        u, s, vh = svd_truncated_fixed_rank(a, 1)
        return jnp.sum((u * s[None, :]) @ vh)

    g = jax.grad(loss)(a0)
    assert np.all(np.isfinite(np.asarray(g)))
    fd = _fd_grad(loss, np.asarray(a0))
    np.testing.assert_allclose(np.asarray(g), fd, atol=1e-5)


def test_grad_through_traced_tensor_svd_static_policy():
    """Tensor-level svd with a tol=0+maxdim (static-rank) policy is
    differentiable under jax.grad."""
    from tensor4all_tpu import svd
    from tensor4all_tpu.config import SvdTruncationPolicy

    i, j = Index(4), Index(6)
    rng = np.random.default_rng(7)
    a0 = rng.standard_normal((4, 6))
    pol = SvdTruncationPolicy(tol=0.0, maxdim=3)

    def loss(data):
        t = Tensor([i, j], data)
        U, S, Vh, spec = svd(t, left_inds=[i], policy=pol)
        assert spec.rank == 3
        rec = contract([U, S, Vh])
        return jnp.sum(rec.data ** 2)

    g = jax.grad(loss)(jnp.asarray(a0))
    fd = _fd_grad(loss, a0)
    np.testing.assert_allclose(np.asarray(g), fd, atol=1e-5)


def test_grad_through_complex_truncated_svd():
    """Complex-128 truncated SVD adjoint (incl. the gauge term) vs FD on
    real/imag parts."""
    from tensor4all_tpu.core.decomp import svd_truncated_fixed_rank

    rng = np.random.default_rng(11)
    ar = rng.standard_normal((3, 4))
    ai = rng.standard_normal((3, 4))
    w = jnp.asarray(rng.standard_normal((3, 4))
                    + 1j * rng.standard_normal((3, 4)))

    def loss_c(re, im):
        a = re + 1j * im
        u, s, vh = svd_truncated_fixed_rank(a, 2)
        rec = (u * s[None, :].astype(u.dtype)) @ vh
        return jnp.real(jnp.sum(w * rec))

    gr = jax.grad(loss_c, argnums=0)(jnp.asarray(ar), jnp.asarray(ai))
    fd = _fd_grad(lambda re: loss_c(re, jnp.asarray(ai)), ar)
    np.testing.assert_allclose(np.asarray(gr), fd, atol=1e-6)
    gi = jax.grad(loss_c, argnums=1)(jnp.asarray(ar), jnp.asarray(ai))
    fdi = _fd_grad(lambda im: loss_c(jnp.asarray(ar), im), ai)
    np.testing.assert_allclose(np.asarray(gi), fdi, atol=1e-6)


def test_grad_through_qr_factorize():
    """Ref ad_integration.rs:63-71 (factorize QR reconstruction gradient):
    grad of sum(Q@R) w.r.t. the input is all-ones."""
    from tensor4all_tpu.core.decomp import FactorizeAlg, factorize

    i, j = Index(2), Index(2)

    def loss(data):
        t = Tensor([i, j], data)
        Q, R, _ = factorize(t, [i], alg=FactorizeAlg.QR)
        rec = contract([Q, R])
        return jnp.sum(rec.data)

    a0 = jnp.asarray([[2.0, 0.5], [1.0, 3.0]])
    g = jax.grad(loss)(a0)
    np.testing.assert_allclose(np.asarray(g), np.ones((2, 2)), atol=1e-8)


def test_grad_through_tt_compression_pipeline():
    """VERDICT r1 item 3 'done' criterion: grad of a truncated-compression
    pipeline (core -> two-site merge -> rank-2 re-split -> evaluate)
    matches FD to 1e-6."""
    from tensor4all_tpu.core.decomp import svd_truncated_fixed_rank

    rng = np.random.default_rng(13)
    c0 = rng.standard_normal((1, 2, 3))
    c1 = rng.standard_normal((3, 2, 1))

    def loss(c0v):
        theta = jnp.einsum("aib,bjc->aijc", c0v, jnp.asarray(c1))
        m = theta.reshape(2, 2)
        u, s, vh = svd_truncated_fixed_rank(m, 2)
        left = (u * s[None, :]).reshape(1, 2, 2)
        right = vh.reshape(2, 2, 1)
        tt = TensorTrain([left, right])
        return tt.evaluate([1, 0]) ** 2

    g = jax.grad(loss)(jnp.asarray(c0))
    fd = _fd_grad(loss, c0)
    np.testing.assert_allclose(np.asarray(g), fd, atol=1e-6)
