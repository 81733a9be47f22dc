"""Quantics layer tests: grids, QTT interpolation (BASELINE config 3:
R=30 oscillatory 1-D + derivative/shift MPOs), transform operators."""

import numpy as np
import pytest

from tensor4all_tpu.quantics import (
    DiscretizedGrid,
    InherentDiscreteGrid,
    UnfoldingScheme,
    affine_operator,
    cumsum_operator,
    difference_kernel_mpo,
    flip_operator,
    phase_rotation_operator,
    quantics_fourier_operator,
    quantics_from_array,
    quanticscrossinterpolate,
    quanticscrossinterpolate_discrete,
    shift_operator,
    shift_operator_multivar,
    triangle_operator,
)
from tensor4all_tpu.tci.tensorci2 import TCI2Options


# ----------------------------------------------------------------------
# grids
# ----------------------------------------------------------------------
def test_discrete_grid_roundtrip():
    for unf in UnfoldingScheme:
        g = InherentDiscreteGrid(R=5, d=3, unfolding=unf)
        rng = np.random.default_rng(0)
        m = rng.integers(0, 32, size=(50, 3))
        q = g.index_to_quantics(m)
        assert q.shape == (50, g.n_sites)
        back = g.quantics_to_index(q)
        np.testing.assert_array_equal(back, m)


def test_discrete_grid_msb_first():
    g = InherentDiscreteGrid(R=3, d=1)
    q = g.index_to_quantics(np.array([[4]]))
    np.testing.assert_array_equal(q[0], [1, 0, 0])  # MSB first


def test_discretized_grid_coords():
    g = DiscretizedGrid.create(R=4, lower=-1.0, upper=1.0)
    x = g.index_to_coord(np.array([[0], [8]]))
    np.testing.assert_allclose(x[:, 0], [-1.0, 0.0])
    m = g.coord_to_index(np.array([[0.0], [-1.0], [0.9]]))
    assert m[0, 0] == 8 and m[1, 0] == 0


# ----------------------------------------------------------------------
# QTT interpolation
# ----------------------------------------------------------------------
def test_qtci_oscillatory_R30():
    # BASELINE.json config 3: 1-D oscillatory function at R=30 bits
    grid = DiscretizedGrid.create(R=30, lower=0.0, upper=1.0)

    def f(x):
        return np.cos(20 * np.pi * x[:, 0]) * np.exp(-x[:, 0])

    q = quanticscrossinterpolate(f, grid,
                                 options=TCI2Options(tol=1e-10, max_iter=14))
    rng = np.random.default_rng(1)
    xs = rng.uniform(0, 1, size=(500, 1))
    # evaluate at exact grid points
    m = grid.coord_to_index(xs)
    xg = grid.index_to_coord(m)
    got = q.evaluate(xg)
    expect = f(xg)
    assert np.abs(got - expect).max() < 1e-8
    assert max(q.tt.ranks) < 20  # smooth oscillation stays low rank
    # integral vs analytic: int_0^1 cos(20 pi x) e^-x dx
    a = 20 * np.pi
    exact = ((np.exp(-1) * (np.sin(a) * a - np.cos(a)) + 1) / (1 + a * a))
    assert abs(q.integral() - exact) < 1e-8


def test_qtci_discrete():
    grid = InherentDiscreteGrid(R=8, d=2, unfolding=UnfoldingScheme.FUSED)

    def f(m):
        return (m[:, 0] + 2.0 * m[:, 1]) / 256.0

    q = quanticscrossinterpolate_discrete(
        f, grid, options=TCI2Options(tol=1e-10, max_iter=8)
    )
    rng = np.random.default_rng(2)
    m = rng.integers(0, 256, size=(100, 2))
    got = q.evaluate_quantics(grid.index_to_quantics(m))
    np.testing.assert_allclose(got, f(m), atol=1e-8)


def test_quantics_from_array_1d():
    R = 6
    x = np.arange(2 ** R) / 2 ** R
    a = np.exp(-3 * x)
    tt, grid = quantics_from_array(a)
    q = grid.index_to_quantics(np.arange(2 ** R)[:, None])
    vals = np.asarray(tt.evaluate_batch(q))
    np.testing.assert_allclose(vals, a, atol=1e-10)


def test_quantics_from_array_2d_both_unfoldings():
    R = 4
    n = 2 ** R
    x = np.arange(n) / n
    a = np.outer(np.sin(2 * np.pi * x), np.cos(2 * np.pi * x))
    for unf in UnfoldingScheme:
        tt, grid = quantics_from_array(a, unfolding=unf)
        rng = np.random.default_rng(3)
        m = rng.integers(0, n, size=(60, 2))
        q = grid.index_to_quantics(m)
        vals = np.asarray(tt.evaluate_batch(q))
        np.testing.assert_allclose(vals, a[m[:, 0], m[:, 1]], atol=1e-10,
                                   err_msg=str(unf))


# ----------------------------------------------------------------------
# transform operators — dense oracles on small R
# ----------------------------------------------------------------------
def op_matrix(mpo, R):
    return np.asarray(mpo.to_dense_matrix()).reshape(2 ** R, 2 ** R)


def test_shift_operator_periodic():
    R = 5
    N = 2 ** R
    for s in (1, 3, -2, 11):
        O = op_matrix(shift_operator(R, s, bc="periodic"), R)
        expect = np.zeros((N, N))
        for x in range(N):
            expect[x, (x + s) % N] = 1.0
        np.testing.assert_allclose(O, expect, atol=1e-12, err_msg=f"s={s}")


def test_shift_operator_open():
    R = 4
    N = 16
    for s in (2, -3):
        O = op_matrix(shift_operator(R, s, bc="open"), R)
        expect = np.zeros((N, N))
        for x in range(N):
            if 0 <= x + s < N:
                expect[x, x + s] = 1.0
        np.testing.assert_allclose(O, expect, atol=1e-12, err_msg=f"s={s}")


def test_flip_operator():
    R = 4
    N = 16
    O = op_matrix(flip_operator(R), R)
    expect = np.zeros((N, N))
    for x in range(N):
        expect[x, (-x) % N] = 1.0
    np.testing.assert_allclose(O, expect, atol=1e-10)


def test_phase_rotation():
    R = 4
    theta = 0.371
    O = op_matrix(phase_rotation_operator(R, theta), R)
    expect = np.diag(np.exp(1j * theta * np.arange(16)))
    np.testing.assert_allclose(O, expect, atol=1e-12)


def test_cumsum_triangle():
    from tensor4all_tpu.quantics.transforms import TriangleType

    R = 4
    N = 16
    O = op_matrix(cumsum_operator(R), R)
    expect = np.tril(np.ones((N, N)), -1)
    np.testing.assert_allclose(O, expect, atol=1e-12)
    # reference semantics (cumsum.rs:35): triangles are STRICT
    T = op_matrix(triangle_operator(R), R)
    np.testing.assert_allclose(T, np.tril(np.ones((N, N)), -1), atol=1e-12)
    U = op_matrix(triangle_operator(R, TriangleType.UPPER), R)
    np.testing.assert_allclose(U, np.triu(np.ones((N, N)), 1), atol=1e-12)
    Ti = op_matrix(triangle_operator(R, "lower", inclusive=True), R)
    np.testing.assert_allclose(Ti, np.tril(np.ones((N, N))), atol=1e-12)


def test_multivar_embeddings():
    """flip/phase/cumsum on one interleaved variable vs kron oracle
    (ref flip.rs:81, phase_rotation.rs:95)."""
    from tensor4all_tpu.quantics.transforms import (
        cumsum_operator_multivar,
        embed_operator_interleaved,
        flip_operator,
        flip_operator_multivar,
        phase_rotation_operator_multivar,
    )

    R, d = 3, 2
    N = 2 ** R

    def dense_interleaved(mpo):
        """Dense matrix over interleaved (x0, x1) with x0 bits at even
        sites: row/col index = sum_b (x0_b, x1_b) interleaved MSB-first."""
        M = np.asarray(mpo.to_dense_matrix())
        return M

    def kron_oracle(op1, which):
        """Interleaved two-variable operator as a dense matrix in the
        interleaved bit basis."""
        eye = np.eye(N)
        full = np.kron(op1, eye) if which == 0 else np.kron(eye, op1)
        # interleave: basis map from (x0, x1) -> interleaved bits
        perm = np.zeros(N * N, dtype=int)
        for x0 in range(N):
            for x1 in range(N):
                inter = 0
                for b in range(R):
                    inter = (inter << 2) | (((x0 >> (R - 1 - b)) & 1) << 1) \
                        | ((x1 >> (R - 1 - b)) & 1)
                perm[inter] = x0 * N + x1
        return full[np.ix_(perm, perm)]

    F1 = np.asarray(flip_operator(R).to_dense_matrix())
    for k in (0, 1):
        got = dense_interleaved(flip_operator_multivar(R, d, k))
        np.testing.assert_allclose(got, kron_oracle(F1, k), atol=1e-12)
    theta = 0.37
    P1 = np.diag(np.exp(1j * theta * np.arange(N)))
    got = dense_interleaved(phase_rotation_operator_multivar(R, theta, d, 1))
    np.testing.assert_allclose(got, kron_oracle(P1, 1), atol=1e-12)
    C1 = np.tril(np.ones((N, N)), -1)
    got = dense_interleaved(cumsum_operator_multivar(R, d, 0))
    np.testing.assert_allclose(got, kron_oracle(C1, 0), atol=1e-12)
    # embedding respects exact bond structure (no rank growth)
    emb = embed_operator_interleaved(flip_operator(R), d, 0)
    assert max(emb.ranks) == max(flip_operator(R).ranks)


def test_fourier_operator():
    R = 5
    N = 2 ** R
    F = quantics_fourier_operator(R, sign=-1, tol=1e-12)
    assert max(F.ranks) <= 14  # Chen-Lindsey low rank
    M = op_matrix(F, R)
    # output bits reversed: row k of M corresponds to bit-reversed k
    def bitrev(k):
        return int(format(k, f"0{R}b")[::-1], 2)

    dft = np.exp(-2j * np.pi * np.outer(np.arange(N), np.arange(N)) / N)
    dft /= np.sqrt(N)
    perm = np.array([bitrev(k) for k in range(N)])
    np.testing.assert_allclose(M[perm, :], dft, atol=1e-9)


def test_affine_operator():
    R = 4
    N = 16
    O = op_matrix(affine_operator(R, a=3, b=2, bc="periodic"), R)
    expect = np.zeros((N, N))
    for x in range(N):
        expect[x, (3 * x + 2) % N] = 1.0
    np.testing.assert_allclose(O, expect, atol=1e-12)


def test_difference_kernel_derivative():
    # BASELINE config 3: derivative MPO on a quantics TT
    R = 10
    N = 2 ** R
    grid = DiscretizedGrid.create(R=R, lower=0.0, upper=1.0)

    def f(x):
        return np.sin(2 * np.pi * x[:, 0])

    q = quanticscrossinterpolate(f, grid,
                                 options=TCI2Options(tol=1e-12, max_iter=10))
    D = difference_kernel_mpo(R, kind="central", bc="open")
    dtt = D.apply_zipup(q.tt, tol=1e-12)
    h = grid.step[0]
    m = np.arange(1, N - 1)
    qidx = grid.discrete.index_to_quantics(m[:, None])
    got = np.asarray(dtt.evaluate_batch(qidx)) / h
    x = grid.index_to_coord(m[:, None])[:, 0]
    expect = 2 * np.pi * np.cos(2 * np.pi * x)
    # central difference error ~ h^2 * |f'''| ~ (1/1024)^2 * 248
    assert np.abs(got - expect).max() < 1e-3


def test_shift_multivar():
    R, d = 3, 2
    g = InherentDiscreteGrid(R, d, UnfoldingScheme.INTERLEAVED)
    O = shift_operator_multivar(R, d, [1, -2], bc="periodic")
    M = np.asarray(O.to_dense_matrix())
    N = 2 ** (R * d)
    # oracle: act on basis vectors via index math
    rng = np.random.default_rng(4)
    m = rng.integers(0, 8, size=(30, 2))
    q = g.index_to_quantics(m)

    # column index of quantics digit-string (row-major over sites)
    def flat(qrow):
        v = 0
        for digit in qrow:
            v = v * 2 + int(digit)
        return v

    shifted = np.stack([(m[:, 0] + 1) % 8, (m[:, 1] - 2) % 8], axis=1)
    q_shift = g.index_to_quantics(shifted)
    for i in range(30):
        row = flat(q[i])
        col = flat(q_shift[i])
        assert abs(M[row, col] - 1.0) < 1e-10
    assert np.abs(M.sum() - 30 * 0 - N) < 1e-6  # permutation matrix


def test_fourier_deterministic_construction():
    """Direct Chen-Lindsey QFT MPO (ref fourier.rs:202): deterministic,
    rank ~11 at 1e-10 (VERDICT r1 #7 done-criterion)."""
    import time

    quantics_fourier_operator(12, tol=1e-10)  # warm jit
    t0 = time.time()
    F = quantics_fourier_operator(30, tol=1e-10)
    dt = time.time() - t0
    assert max(F.ranks) <= 14
    # two builds are bit-identical (no TCI randomness)
    F2 = quantics_fourier_operator(30, tol=1e-10)
    for a, b in zip(F.cores, F2.cores):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert dt < 5.0  # warm build is ~100 ms; generous CI margin


def test_affine_rational_and_negative():
    """Rational + negative affine maps (ref affine.rs:487)."""
    from fractions import Fraction

    from tensor4all_tpu.quantics.transforms import (
        affine_transform_operator,
    )

    R, N = 4, 16
    # y = x/2 (rational): nonzero only where 2y == x mod N
    F = np.asarray(op_matrix(
        affine_transform_operator(R, [[Fraction(1, 2)]], [0], "periodic"),
        R))
    expect = np.zeros((N, N))
    for x in range(N):
        for y in range(N):
            if (2 * y - x) % N == 0:
                expect[y, x] = 1.0
    np.testing.assert_allclose(F, expect, atol=1e-12)
    # negative b with open boundary
    O = np.asarray(op_matrix(affine_operator(R, a=1, b=-3, bc="open"), R))
    expect = np.zeros((N, N))
    for x in range(N):
        if x >= 3:
            expect[x, x - 3] = 1.0
    np.testing.assert_allclose(O, expect, atol=1e-12)


def test_affine_multivariate_fused():
    """M=N=2 rotation map y0=x0+x1, y1=x0-x1 (ref affine.rs:487)."""
    from tensor4all_tpu.quantics.transforms import (
        affine_transform_operator,
    )

    R, Nn = 3, 8
    F2 = affine_transform_operator(R, [[1, 1], [1, -1]], [0, 0],
                                   "periodic")
    M = np.asarray(F2.to_dense_matrix()).reshape(4 ** R, 4 ** R)

    def fuse(v0, v1):
        out = 0
        for j in range(R):
            b0 = (v0 >> (R - 1 - j)) & 1
            b1 = (v1 >> (R - 1 - j)) & 1
            out = out * 4 + (b0 + 2 * b1)
        return out

    expect = np.zeros((4 ** R, 4 ** R))
    for x0 in range(Nn):
        for x1 in range(Nn):
            expect[fuse((x0 + x1) % Nn, (x0 - x1) % Nn),
                   fuse(x0, x1)] = 1.0
    np.testing.assert_allclose(M, expect, atol=1e-12)


def test_gauss_kronrod_embedded():
    """Computed GK rule matches published K15 values; embedded Gauss
    subrule exact to its degree (ref integration.rs:17)."""
    from tensor4all_tpu.tci.integration import gauss_kronrod_rule

    x, wk, wg = gauss_kronrod_rule(15)
    assert abs(x[-1] - 0.991455371120813) < 1e-12
    assert abs(wk[-1] - 0.022935322010529) < 1e-12
    for deg in (14, 22):
        exact = 2.0 / (deg + 1) if deg % 2 == 0 else 0.0
        assert abs((wk * x ** deg).sum() - exact) < 1e-13
    assert abs((wg * x ** 12).sum() - 2.0 / 13) < 1e-13
    # Gauss nodes embedded: exactly 7 nonzero Gauss weights
    assert (wg != 0).sum() == 7


def test_integration_error_estimate():
    from tensor4all_tpu.tci.integration import integrate_tci
    from math import erf, pi, sqrt

    res = integrate_tci(lambda p: np.exp(-np.sum(p * p, axis=1)), 3,
                        domain=[(-1, 1)] * 3, n_nodes=15)
    exact = (sqrt(pi) * erf(1.0)) ** 3
    assert abs(res.value - exact) < 1e-12
    assert res.error_estimate < 1e-5


def test_batched_qtci():
    """Multi-component interpolation with shared cache
    (ref batched/mod.rs:206)."""
    from tensor4all_tpu.quantics.qtci import (
        quanticscrossinterpolate_batched,
    )

    grid = DiscretizedGrid.create(R=8, lower=0.0, upper=1.0)

    def fb(p):
        return np.stack([np.exp(-p[:, 0]), np.sin(5 * p[:, 0])], axis=1)

    res = quanticscrossinterpolate_batched(fb, grid, [2])
    x = np.random.default_rng(1).random((100, 1))
    xg = np.floor(x * 2 ** 8) / 2 ** 8
    assert np.abs(res.evaluate(xg, [0]) - np.exp(-xg[:, 0])).max() < 1e-6
    assert np.abs(res.evaluate(xg, [1]) - np.sin(5 * xg[:, 0])).max() < 1e-6


def test_interpolative_nd_and_invert():
    """nd fused interpolative QTT + invert_qtt
    (ref interpolation.rs:98,524)."""
    from tensor4all_tpu.quantics.interpolative import (
        chebyshev_nodes,
        interpolative_qtt,
        interpolative_qtt_nd,
        invert_qtt,
    )

    def f2(p):
        return np.exp(-p[:, 0] ** 2 - 0.5 * p[:, 1] * p[:, 0])

    q = interpolative_qtt_nd(f2, [0, 0], [1, 1], R=7, K=9)
    xs = np.random.default_rng(0).random((200, 2))
    m = np.clip((xs * 2 ** 7).astype(int), 0, 2 ** 7 - 1) / 2 ** 7
    assert np.abs(q.evaluate(m) - f2(m)).max() < 1e-8

    def f1(x):
        return np.cos(4 * x) + x ** 2

    q1 = interpolative_qtt(f1, R=8, K=14)
    vals = invert_qtt(q1, max_level=3)
    t = chebyshev_nodes(14)
    for i in range(8):
        pts = (i + t) / 8
        assert np.abs(vals[2][i] - f1(pts)).max() < 1e-8


def test_difference_kernel_from_qtt():
    """Convolution MPO A[x,x'] = f((x-x') mod N) from a kernel QTT
    (ref difference_kernel.rs:24), periodic + antiperiodic."""
    from tensor4all_tpu.quantics import (
        difference_kernel_mpo_from_qtt, quantics_from_array,
    )

    R, N = 5, 32
    z = np.arange(N)
    fvals = np.exp(2 * (np.cos(2 * np.pi * z / N) - 1))
    ftt, _ = quantics_from_array(fvals)

    mpo = difference_kernel_mpo_from_qtt(ftt, bc="periodic")
    M = np.asarray(mpo.to_dense_matrix())
    want = fvals[(z[:, None] - z[None, :]) % N]
    assert np.abs(M - want).max() < 1e-12
    # MPO bonds bounded by 2x the kernel bonds (carry automaton x kernel)
    assert all(r <= 2 * fr for r, fr in zip(mpo.ranks, ftt.ranks))

    Ma = np.asarray(
        difference_kernel_mpo_from_qtt(ftt, bc="antiperiodic")
        .to_dense_matrix())
    sign = np.where(z[:, None] < z[None, :], -1.0, 1.0)
    assert np.abs(Ma - want * sign).max() < 1e-12

    import pytest as _pytest
    with _pytest.raises(ValueError):
        difference_kernel_mpo_from_qtt(ftt, bc="open")


def test_qtci_from_arrays_and_cachedata():
    """Explicit coordinate arrays + cache introspection
    (ref quantics_tci.rs from_arrays/cachedata)."""
    from tensor4all_tpu.quantics import quanticscrossinterpolate_from_arrays
    from tensor4all_tpu.tci import TCI2Options

    xs = np.linspace(-1.0, 1.0, 16)          # non-[0,1) physical grid
    ys = np.geomspace(1.0, 4.0, 16)          # non-uniform!
    f = lambda c: np.exp(-c[:, 0] ** 2) / c[:, 1]
    q = quanticscrossinterpolate_from_arrays(
        f, [xs, ys], options=TCI2Options(tol=1e-10))

    # check against direct values on random grid points
    rs = np.random.RandomState(0)
    m = rs.randint(0, 16, (40, 2))
    grid_vals = f(np.stack([xs[m[:, 0]], ys[m[:, 1]]], axis=1))
    from tensor4all_tpu.quantics import InherentDiscreteGrid
    ig = InherentDiscreteGrid(4, 2)
    got = np.asarray(q.tt.evaluate_batch(ig.index_to_quantics(m)))
    np.testing.assert_allclose(got, grid_vals, atol=1e-8)

    # cachedata decodes the memo; every cached value matches f
    items = q.cachedata()
    assert len(items) == q.n_evals
    qidx = np.array([k for k, _ in items[:16]], dtype=np.int64)
    vals = np.array([v for _, v in items[:16]])
    mm = ig.quantics_to_index(qidx)
    np.testing.assert_allclose(
        vals, f(np.stack([xs[mm[:, 0]], ys[mm[:, 1]]], axis=1)),
        atol=1e-12)


def test_grids_beyond_int64():
    """R >= 63 grids: int64 shifts/casts silently overflowed (the
    reference's quanticsgrids widens to big ints). Integer roundtrips
    must be exact at R=100; the continuous pipeline works at R=80."""
    from tensor4all_tpu.quantics.grids import (
        DiscretizedGrid,
        InherentDiscreteGrid,
        UnfoldingScheme,
    )

    ig = InherentDiscreteGrid(100, d=2)
    m = np.asarray([[(1 << 99) + 12345, 987654321],
                    [0, (1 << 100) - 1]], dtype=object)
    back = ig.quantics_to_index(ig.index_to_quantics(m))
    assert all(int(back[i, j]) == int(m[i, j])
               for i in range(2) for j in range(2))
    igf = InherentDiscreteGrid(70, d=2, unfolding=UnfoldingScheme.FUSED)
    m2 = np.asarray([[(1 << 69) + 7, (1 << 68) + 3]], dtype=object)
    q2 = igf.index_to_quantics(m2)
    assert int(igf.quantics_to_index(q2)[0, 0]) == int(m2[0, 0])
    g = DiscretizedGrid.create(80, 0.0, 1.0)
    x = np.asarray([0.3, 0.725])
    back_x = np.asarray(g.quantics_to_coord(g.coord_to_quantics(x)),
                        float).reshape(-1)
    np.testing.assert_allclose(back_x, x, atol=1e-15)


def test_qtci_at_r80():
    """Continuous QTT interpolation over 80 sites exercises the
    CachedFunction big-int key fallback end to end."""
    from tensor4all_tpu.quantics import (
        DiscretizedGrid,
        quanticscrossinterpolate,
    )
    from tensor4all_tpu.tci.tensorci2 import TCI2Options

    g = DiscretizedGrid.create(80, 0.0, 1.0)

    def f(x):
        x = np.asarray(x, float).reshape(-1)
        return 1.0 / (1.1 + np.cos(7 * x))

    qtt = quanticscrossinterpolate(f, g,
                                   options=TCI2Options(tol=1e-10,
                                                       max_iter=8))
    xs = np.linspace(0.05, 0.95, 13)
    got = np.asarray([float(np.asarray(qtt.evaluate(float(x))).reshape(()))
                      for x in xs])
    assert np.abs(got - f(xs)).max() < 1e-8


def test_bigint_grid_flat_list_input():
    """d=1 grids accept flat lists on both sides of the R=62 threshold
    (code-review regression: the big-int path crashed on them)."""
    from tensor4all_tpu.quantics.grids import InherentDiscreteGrid

    for R in (62, 63, 100):
        g = InherentDiscreteGrid(R, d=1)
        vals = [3, 5, (1 << (R - 1)) + 17]
        q = g.index_to_quantics(vals if R > 62 else np.asarray(vals))
        back = g.quantics_to_index(q)
        assert [int(v) for v in np.asarray(back)[:, 0]] == vals


def test_batched_qtci_int_output_dims():
    """quanticscrossinterpolate_batched accepts a bare component count
    (and the shared point cache serves all components)."""
    from tensor4all_tpu.quantics.qtci import quanticscrossinterpolate_batched

    g = DiscretizedGrid.create(12, 0.0, 1.0)
    K = 3

    def f(x, k):
        x = np.asarray(x).reshape(-1)
        return np.sin((k + 1) * 3.0 * x) * np.exp(-x)

    def batched(x):
        x = np.asarray(x).reshape(-1)
        return np.stack([f(x, k) for k in range(K)], axis=1)

    res = quanticscrossinterpolate_batched(
        batched, g, K, options=TCI2Options(tol=1e-9, max_iter=10))
    xs = np.linspace(0.05, 0.95, 11)
    m = g.coord_to_index(xs)
    xg = np.asarray(g.index_to_coord(m)).reshape(-1)
    for k in range(K):
        got = res.evaluate(xg[:, None], [k]).reshape(-1)
        assert np.abs(got - f(xg, k)).max() < 1e-7
    assert res.n_evals > 0


# ---- tree-unfolded quantics (VERDICT r2 missing #4; ref --------------
# tensor4all-treetci/tests/advanced_quantics.rs) -----------------------
def test_tree_quantics_polynomial_branching_tree_all_points():
    """Port of advanced_quantics.rs
    quantics_grid_polynomial_matches_all_points_on_branching_tree:
    R=2 2-var interleaved grid, branching tree 0-1, 1-2, 1-3, polynomial
    reconstructed at every grid point."""
    import networkx as nx

    from tensor4all_tpu.quantics import (
        DiscretizedGrid,
        quanticscrossinterpolate_tree,
    )
    from tensor4all_tpu.tci.treetci import TreeTciOptions

    grid = DiscretizedGrid.create(2, (-3.0, -17.0), (2.0, 12.0))

    def f(X):
        return (0.1 * X[:, 0] ** 2 + 0.01 * X[:, 1] ** 3
                - np.pi * X[:, 0] * X[:, 1] + 5.0)

    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (1, 3)])
    qt = quanticscrossinterpolate_tree(
        f, grid, topology=g,
        options=TreeTciOptions(tol=1e-10, max_iter=12, maxbonddim=8))
    m = np.array([[i, j] for i in range(4) for j in range(4)])
    X = grid.index_to_coord(m)
    exp = f(X)
    err = np.abs(qt.evaluate(X) - exp).max() / np.abs(exp).max()
    assert err < 1e-8


def test_tree_quantics_gaussian_caterpillar_matches_chain():
    """Default interleaved scale-tree unfolding on a 2-D Gaussian:
    reconstruction to tol with ranks comparable to the chain path, and
    the tree-contracted integral matches the analytic value."""
    from tensor4all_tpu.quantics import (
        DiscretizedGrid,
        quanticscrossinterpolate_tree,
    )
    from tensor4all_tpu.tci.treetci import TreeTciOptions

    grid = DiscretizedGrid.create(6, (-4.0, -4.0), (4.0, 4.0))

    def f(X):
        return np.exp(-(X ** 2).sum(axis=1))

    rng = np.random.default_rng(1)
    piv = ([[0] * grid.n_sites]
           + [list(rng.integers(0, 2, grid.n_sites)) for _ in range(8)])
    qt = quanticscrossinterpolate_tree(
        f, grid, initial_pivots=piv,
        options=TreeTciOptions(tol=1e-10, max_iter=14))
    rng = np.random.default_rng(0)
    m = rng.integers(0, 64, (300, 2))
    X = grid.index_to_coord(m)
    assert np.abs(qt.evaluate(X) - f(X)).max() < 1e-7
    # chain path at the same tol reaches rank ~53 (measured); comparable
    assert max(qt.ranks().values()) <= 64
    assert abs(qt.integral().real - np.pi) < 1e-5


def test_tree_quantics_batch_vs_point_evaluator_equivalence():
    """Port of advanced_quantics.rs
    quantics_grid_batch_evaluator_matches_point_evaluator: a per-point
    python loop wrapped as a batch function must give the same
    interpolant as the vectorized batch evaluator."""
    import networkx as nx

    from tensor4all_tpu.quantics import (
        DiscretizedGrid,
        quanticscrossinterpolate_tree,
    )
    from tensor4all_tpu.tci.treetci import TreeTciOptions

    grid = DiscretizedGrid.create(2, (-3.0, -17.0), (2.0, 12.0))

    def f_vec(X):
        return (0.1 * X[:, 0] ** 2 + 0.01 * X[:, 1] ** 3
                - np.pi * X[:, 0] * X[:, 1] + 5.0)

    def f_point(X):
        return np.array([f_vec(row[None, :])[0] for row in X])

    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (1, 3)])
    opts = TreeTciOptions(tol=1e-10, max_iter=12, maxbonddim=8)
    qa = quanticscrossinterpolate_tree(f_vec, grid, topology=g,
                                       options=opts)
    qb = quanticscrossinterpolate_tree(f_point, grid, topology=g,
                                       options=opts)
    m = np.array([[i, j] for i in range(4) for j in range(4)])
    X = grid.index_to_coord(m)
    assert np.abs(qa.evaluate(X) - qb.evaluate(X)).max() < 1e-10


def test_interleaved_scale_tree_shape():
    from tensor4all_tpu.quantics import interleaved_scale_tree

    g = interleaved_scale_tree(3, 2)
    assert sorted(g.nodes()) == list(range(6))
    assert g.number_of_edges() == 5  # tree
    import networkx as nx

    assert nx.is_tree(g)
