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


# ----------------------------------------------------------------------
# AD through TreeTN operations (VERDICT r2 missing #3; ref
# crates/tensor4all-treetn/tests/ad_treetn.rs)
# ----------------------------------------------------------------------
def _three_site_treetn(d0, d1, d2, inds):
    """Build the reference's 3-site MPS TreeTN from raw core arrays."""
    from tensor4all_tpu.treetn.network import TreeTN

    s0, s1, s2, b01, b12 = inds
    tn = TreeTN()
    tn.add_node(0, Tensor([s0, b01], d0))
    tn.add_node(1, Tensor([b01, s1, b12], d1))
    tn.add_node(2, Tensor([b12, s2], d2))
    tn.connect(0, 1, b01)
    tn.connect(1, 2, b12)
    return tn


def _mk_inds():
    return (Index(2), Index(2), Index(2), Index(2), Index(2))


def _mk_data():
    d0 = jnp.asarray([[1.0, 0.5], [0.3, 2.0]])
    d1 = jnp.asarray([3.0, 0.0, 0.0, 1.0, 0.5, 0.0, 0.0, 2.0]
                     ).reshape(2, 2, 2)
    d2 = jnp.asarray([[1.5, 0.2], [0.4, 1.0]])
    return d0, d1, d2


def test_grad_through_treetn_to_dense(  # ref ad_treetn.rs:29,63
):
    inds = _mk_inds()
    d0, d1, d2 = _mk_data()

    def loss(d0):
        tn = _three_site_treetn(d0, d1, d2, inds)
        return jnp.sum(tn.contract_to_tensor().data)

    g = jax.grad(loss)(d0)
    assert g.shape == d0.shape
    eps = 1e-6
    for i in range(2):
        for j in range(2):
            fd = (loss(d0.at[i, j].add(eps))
                  - loss(d0.at[i, j].add(-eps))) / (2 * eps)
            assert abs(float(g[i, j]) - float(fd)) < 1e-6, (i, j)


def test_grad_through_treetn_inner():
    """grad of <a|b> w.r.t. a node of `a` (FD-checked)."""
    inds = _mk_inds()
    d0, d1, d2 = _mk_data()
    e0 = d0 * 0.7 + 0.1
    e1 = d1 * 1.1 - 0.2
    e2 = d2 * 0.9 + 0.3

    def loss(d1v):
        a = _three_site_treetn(d0, d1v, d2, inds)
        b = _three_site_treetn(e0, e1, e2, inds)
        return jnp.real(a.inner(b))

    g = jax.grad(loss)(d1)
    eps = 1e-6
    fd = (loss(d1.at[1, 0, 1].add(eps))
          - loss(d1.at[1, 0, 1].add(-eps))) / (2 * eps)
    assert abs(float(g[1, 0, 1]) - float(fd)) < 1e-6


def test_grad_through_treetn_norm_and_canonicalize():
    """grad through canonicalize -> contract_to_tensor (exercises the
    QR custom_vjp inside the gauge moves) and through .norm()."""
    inds = _mk_inds()
    d0, d1, d2 = _mk_data()

    def loss_canon(d0v):
        tn = _three_site_treetn(d0v, d1, d2, inds)
        tn = tn.canonicalize(centers=[1])
        t = tn.contract_to_tensor()
        return jnp.sum(t.data ** 2)

    def loss_norm(d0v):
        tn = _three_site_treetn(d0v, d1, d2, inds)
        return tn.norm()

    for loss in (loss_canon, loss_norm):
        g = jax.grad(loss)(d0)
        eps = 1e-6
        fd = (loss(d0.at[0, 1].add(eps))
              - loss(d0.at[0, 1].add(-eps))) / (2 * eps)
        assert abs(float(g[0, 1]) - float(fd)) < 2e-5, loss.__name__


def test_grad_through_treetn_contract_networks():
    """grad through the zipup contraction of two TreeTNs (operator-style
    pipeline: build -> zipup -> densify -> scalar)."""
    import networkx as nx

    from tensor4all_tpu.treetn.contraction import contract_networks
    from tensor4all_tpu.treetn.network import TreeTN, random_treetn

    g = nx.path_graph(3)
    tn_b, sites_b = random_treetn(jax.random.PRNGKey(5), g,
                                  {n: [2] for n in g.nodes}, bond_dim=2)
    inds = _mk_inds()
    d0, d1, d2 = _mk_data()
    # pair a's sites with b's (diagonal link via shared Index objects):
    # rebuild a on b's site indices so zipup contracts site-wise
    s = [sites_b[n][0] for n in g.nodes]

    def loss(d1v):
        b01, b12 = Index(2), Index(2)
        tn = TreeTN()
        tn.add_node(0, Tensor([s[0], b01], d0))
        tn.add_node(1, Tensor([b01, s[1], b12], d1v))
        tn.add_node(2, Tensor([b12, s[2]], d2))
        tn.connect(0, 1, b01)
        tn.connect(1, 2, b12)
        out = contract_networks(tn, tn_b, center=0, method="zipup")
        return jnp.sum(out.contract_to_tensor().data ** 2)

    g_ = jax.grad(loss)(d1)
    eps = 1e-6
    fd = (loss(d1.at[0, 1, 0].add(eps))
          - loss(d1.at[0, 1, 0].add(-eps))) / (2 * eps)
    assert abs(float(g_[0, 1, 0]) - float(fd)) < 2e-5
