/* Standalone C consumer of libt4a_capi.so: exercises the embedded-Python
 * path the Julia bindings would use. Exits 0 on success. */

#include <math.h>
#include <stdio.h>
#include <string.h>
#include <stdlib.h>

#include "include/t4a_capi.h"

#define CHECK(st)                                                       \
  do {                                                                  \
    if ((st) != T4A_OK) {                                               \
      fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__,           \
              t4a_last_error_message());                                \
      return 1;                                                         \
    }                                                                   \
  } while (0)

static int gauss_batch(const int64_t *idx, size_t batch, size_t len,
                       double *out, void *user_data) {
  (void)user_data;
  for (size_t b = 0; b < batch; ++b) {
    double s = 0.0;
    for (size_t k = 0; k < len; ++k) {
      double x = -1.0 + 2.0 * (double)idx[b * len + k] / 7.0;
      s += x * x;
    }
    out[b] = exp(-s);
  }
  return 0;
}

int main(void) {
  CHECK(t4a_init());

  /* index + tensor + contraction: (2x3) @ (3x4) chain */
  t4a_index *i, *j, *k;
  CHECK(t4a_index_new(2, "i", &i));
  CHECK(t4a_index_new(3, "j", &j));
  CHECK(t4a_index_new(4, "k", &k));
  int64_t dim;
  CHECK(t4a_index_dim(j, &dim));
  if (dim != 3) return 1;
  t4a_index *ip;
  CHECK(t4a_index_prime(i, 1, &ip));
  int eq;
  CHECK(t4a_index_equal(i, ip, &eq));
  if (eq) return 1;

  double a[6], b[12];
  for (int n = 0; n < 6; ++n) a[n] = n + 1;
  for (int n = 0; n < 12; ++n) b[n] = 0.5 * n;
  const t4a_index *ia[2] = {i, j};
  const t4a_index *ib[2] = {j, k};
  t4a_tensor *ta, *tb, *tc;
  CHECK(t4a_tensor_new(ia, 2, a, 6, &ta));
  CHECK(t4a_tensor_new(ib, 2, b, 12, &tb));
  const t4a_tensor *ops[2] = {ta, tb};
  CHECK(t4a_tensor_contract(ops, 2, &tc));
  size_t rank;
  CHECK(t4a_tensor_rank(tc, &rank));
  if (rank != 2) return 1;
  double c[8];
  CHECK(t4a_tensor_data(tc, c, 8));
  /* col-major oracle: C[x,z] = sum_y A[x,y] B[y,z] */
  for (int x = 0; x < 2; ++x)
    for (int z = 0; z < 4; ++z) {
      double expect = 0;
      for (int y = 0; y < 3; ++y)
        expect += a[x + 2 * y] * b[y + 3 * z];
      if (fabs(c[x + 2 * z] - expect) > 1e-10) {
        fprintf(stderr, "contract mismatch at %d,%d\n", x, z);
        return 1;
      }
    }

  /* SVD */
  t4a_tensor *u, *s, *vh;
  CHECK(t4a_tensor_svd(tc, 1, 1e-12, 0, &u, &s, &vh));

  /* SVD with the full typed policy */
  {
    t4a_svd_truncation_policy sp = {1e-12, T4A_THRESHOLD_SCALE_RELATIVE,
                                    T4A_SINGULAR_VALUE_MEASURE_SQUARED_VALUE,
                                    T4A_TRUNCATION_RULE_DISCARDED_TAIL_SUM};
    t4a_tensor *u2, *s2, *vh2;
    CHECK(t4a_tensor_svd_with_policy(tc, 1, &sp, 0, &u2, &s2, &vh2));
    t4a_tensor_free(u2);
    t4a_tensor_free(s2);
    t4a_tensor_free(vh2);
  }

  /* TT + TCI of a separable Gaussian over 6 sites of dim 8 */
  int64_t dims[6] = {8, 8, 8, 8, 8, 8};
  t4a_tt *tt;
  CHECK(t4a_crossinterpolate2(gauss_batch, NULL, dims, 6, 1e-10, 0, 10,
                              &tt));
  int64_t ranks[5];
  CHECK(t4a_tt_ranks(tt, ranks, 5));
  if (ranks[0] > 3) {
    fprintf(stderr, "unexpected TCI rank %lld\n", (long long)ranks[0]);
    return 1;
  }
  int64_t pt[6] = {1, 2, 3, 4, 5, 6};
  double val, expect_val;
  CHECK(t4a_tt_evaluate(tt, pt, 6, &val));
  gauss_batch(pt, 1, 6, &expect_val, NULL);
  if (fabs(val - expect_val) > 1e-8) {
    fprintf(stderr, "TCI eval mismatch: %g vs %g\n", val, expect_val);
    return 1;
  }

  /* constant TT sum */
  t4a_tt *ct;
  int64_t cd[3] = {2, 3, 4};
  CHECK(t4a_tt_constant(cd, 3, 1.5, &ct));
  double ssum;
  CHECK(t4a_tt_sum(ct, &ssum));
  if (fabs(ssum - 1.5 * 24) > 1e-10) return 1;

  /* error path: invalid arg */
  if (t4a_tensor_new(NULL, 1, NULL, 0, &ta) != T4A_INVALID_ARGUMENT)
    return 1;

  /* ---------------- TreeTN round trip (ref capi treetn.rs) --------- */
  {
    t4a_index *s0, *s1, *s2, *b01, *b12;
    CHECK(t4a_index_new(2, "s0", &s0));
    CHECK(t4a_index_new(2, "s1", &s1));
    CHECK(t4a_index_new(2, "s2", &s2));
    CHECK(t4a_index_new(3, "Link", &b01));
    CHECK(t4a_index_new(3, "Link", &b12));
    double d0[6], d1[18], d2[6];
    for (int q = 0; q < 6; ++q) d0[q] = 0.1 * (q + 1);
    for (int q = 0; q < 18; ++q) d1[q] = 0.05 * (q + 1) - 0.3;
    for (int q = 0; q < 6; ++q) d2[q] = 0.2 * (q + 1) - 0.5;
    const t4a_index *i0[2] = {s0, b01};
    const t4a_index *i1[3] = {b01, s1, b12};
    const t4a_index *i2[2] = {b12, s2};
    t4a_tensor *T0, *T1, *T2;
    CHECK(t4a_tensor_new(i0, 2, d0, 6, &T0));
    CHECK(t4a_tensor_new(i1, 3, d1, 18, &T1));
    CHECK(t4a_tensor_new(i2, 2, d2, 6, &T2));
    t4a_treetn *tn;
    CHECK(t4a_treetn_new(&tn));
    CHECK(t4a_treetn_set_tensor(tn, "v0", T0));
    CHECK(t4a_treetn_set_tensor(tn, "v1", T1));
    CHECK(t4a_treetn_set_tensor(tn, "v2", T2));
    size_t nv = 0;
    CHECK(t4a_treetn_num_vertices(tn, &nv));
    if (nv != 3) return 1;
    char buf[256];
    CHECK(t4a_treetn_neighbors(tn, "v1", buf, sizeof buf));
    if (!strstr(buf, "v0") || !strstr(buf, "v2")) return 1;
    /* dense BEFORE gauge ops (reference for later comparisons) */
    const t4a_index *site_order[3] = {s0, s1, s2};
    double dense[8];
    CHECK(t4a_treetn_to_dense(tn, site_order, 3, dense, 8));
    double n0 = 0.0;
    CHECK(t4a_treetn_norm(tn, &n0));
    double acc = 0.0;
    for (int q = 0; q < 8; ++q) acc += dense[q] * dense[q];
    if (fabs(sqrt(acc) - n0) > 1e-10) return 1;
    /* orthogonalize + canonical region */
    CHECK(t4a_treetn_orthogonalize(tn, "v0"));
    CHECK(t4a_treetn_canonical_region(tn, buf, sizeof buf));
    if (!strstr(buf, "v0")) return 1;
    /* clone + inner = norm^2 */
    t4a_treetn *cl;
    CHECK(t4a_treetn_clone(tn, &cl));
    double re = 0.0, im = 0.0;
    CHECK(t4a_treetn_inner(tn, cl, &re, &im));
    if (fabs(re - n0 * n0) > 1e-8 * n0 * n0) return 1;
    /* truncate keeps the (rank<=2) state exact */
    CHECK(t4a_treetn_truncate(tn, 1e-12, 2));
    double dense2[8];
    CHECK(t4a_treetn_to_dense(tn, site_order, 3, dense2, 8));
    for (int q = 0; q < 8; ++q)
      if (fabs(dense2[q] - dense[q]) > 1e-9) return 1;
    /* typed-policy truncate (ref t4a_svd_truncation_policy) is also
     * exact at this rank */
    t4a_svd_truncation_policy pol = {1e-12, T4A_THRESHOLD_SCALE_RELATIVE,
                                     T4A_SINGULAR_VALUE_MEASURE_VALUE,
                                     T4A_TRUNCATION_RULE_PER_VALUE};
    CHECK(t4a_treetn_truncate_with_policy(tn, &pol, 2));
    CHECK(t4a_treetn_to_dense(tn, site_order, 3, dense2, 8));
    for (int q = 0; q < 8; ++q)
      if (fabs(dense2[q] - dense[q]) > 1e-9) return 1;
    /* orthogonalize with an explicit form; repeated call is a no-op,
     * switching forms without force fails, with force succeeds */
    CHECK(t4a_treetn_orthogonalize_form(tn, "v1", T4A_CANONICAL_FORM_UNITARY,
                                        0));
    CHECK(t4a_treetn_orthogonalize_form(tn, "v1", T4A_CANONICAL_FORM_UNITARY,
                                        0));
    if (t4a_treetn_orthogonalize_form(tn, "v1", T4A_CANONICAL_FORM_LU, 0) ==
        T4A_OK)
      return 1;
    CHECK(t4a_treetn_orthogonalize_form(tn, "v1", T4A_CANONICAL_FORM_LU, 1));
    CHECK(t4a_treetn_to_dense(tn, site_order, 3, dense2, 8));
    for (int q = 0; q < 8; ++q)
      if (fabs(dense2[q] - dense[q]) > 1e-9) return 1;
    CHECK(t4a_treetn_orthogonalize_form(tn, "v0", T4A_CANONICAL_FORM_UNITARY,
                                        1));
    /* two-network zipup contraction: <tn|tn'> over fresh link ids gives
     * a scalar network equal to norm^2 */
    t4a_treetn *fresh;
    CHECK(t4a_treetn_sim_linkinds(tn, &fresh));
    t4a_treetn *prod;
    CHECK(t4a_treetn_contract_networks(tn, fresh,
                                       T4A_CONTRACT_METHOD_ZIPUP, &pol, 0,
                                       &prod));
    double nprod = 0.0;
    CHECK(t4a_treetn_norm(prod, &nprod));
    if (fabs(nprod - n0 * n0) > 1e-8 * n0 * n0) return 1;
    t4a_treetn_release(fresh);
    t4a_treetn_release(prod);
    /* evaluate one entry */
    const t4a_index *einds[3] = {s0, s1, s2};
    int64_t evals_idx[3] = {1, 0, 1};
    CHECK(t4a_treetn_evaluate(tn, einds, evals_idx, 3, &re, &im));
    /* dense is column-major over (s0, s1, s2) */
    if (fabs(re - dense[1 + 0 * 2 + 1 * 4]) > 1e-9) return 1;
    /* evaluator batch */
    t4a_treetn_evaluator *ev;
    CHECK(t4a_treetn_evaluator_new(tn, site_order, 3, &ev));
    int64_t bidx[6] = {1, 0, 1, 0, 0, 0};
    double bout[2];
    CHECK(t4a_treetn_evaluator_evaluate(ev, bidx, 2, 3, bout));
    if (fabs(bout[0] - re) > 1e-9) return 1;
    if (fabs(bout[1] - dense[0]) > 1e-9) return 1;
    /* fuse two vertices */
    t4a_treetn *fused;
    CHECK(t4a_treetn_fuse_to(tn, "v0\nv1", &fused));
    CHECK(t4a_treetn_num_vertices(fused, &nv));
    if (nv != 2) return 1;
    /* apply a shift MPO materialized from the quantics layer */
    t4a_qtt_layout *layout;
    CHECK(t4a_qtt_layout_new(3, 1, "interleaved", &layout));
    t4a_tt *shift;
    CHECK(t4a_qtransform_shift_materialize(3, 1, "periodic", &shift));
    size_t slen = 0;
    CHECK(t4a_tt_len(shift, &slen));
    if (slen != 3) return 1;
    /* O[x=0 -> y=1]: fused digit = out*2 + in, bits MSB-first */
    int64_t sdig[3] = {0, 0, 1};
    double sval = 0.0;
    CHECK(t4a_tt_evaluate(shift, sdig, 3, &sval));
    if (fabs(sval - 1.0) > 1e-12) return 1;
    t4a_treetn *applied;
    CHECK(t4a_treetn_apply_operator_chain(tn, shift, "v0\nv1\nv2", 1e-12,
                                          8, &applied));
    CHECK(t4a_treetn_norm(applied, &re));
    if (fabs(re - n0) > 1e-8) return 1; /* permutation preserves norm */
    /* fourier materializer */
    t4a_tt *qft;
    CHECK(t4a_qtransform_fourier_materialize(4, -1, 1e-10, 12, &qft));
    CHECK(t4a_tt_len(qft, &slen));
    if (slen != 4) return 1;
    t4a_tt_release(qft);
    t4a_tt_release(shift);
    t4a_qtt_layout_release(layout);
    t4a_treetn_release(applied);
    t4a_treetn_release(fused);
    t4a_treetn_evaluator_release(ev);
    t4a_treetn_release(cl);
    t4a_treetn_release(tn);
    t4a_tensor_release(T0);
    t4a_tensor_release(T1);
    t4a_tensor_release(T2);
    t4a_index_release(s0);
    t4a_index_release(s1);
    t4a_index_release(s2);
    t4a_index_release(b01);
    t4a_index_release(b12);
  }

  /* ---- Julia binding call-sequence replay ------------------------- *
   * Mirrors the reference's docs/examples/julia/{core,treetn}.jl
   * anchors in order (the sequences Tensor4all.jl drives through the
   * ABI; ref scripts/run_julia_tests.sh runs them against the cdylib):
   * index tags/ids -> MPS create -> accessors -> orthogonalize ->
   * truncate -> add -> MPO x MPO contract -> norm/inner -> linsolve. */
  {
    /* core.jl index_basic: tags, dim, id */
    t4a_index *s1, *s2, *l12;
    CHECK(t4a_index_new(2, "Site,n=1", &s1));
    CHECK(t4a_index_new(2, "Site,n=2", &s2));
    CHECK(t4a_index_new(3, "Link,l=1", &l12));
    int64_t dim = 0;
    CHECK(t4a_index_dim(s1, &dim));
    if (dim != 2) return 1;
    int has = 0;
    CHECK(t4a_index_has_tag(s1, "Site", &has));
    if (!has) return 1;
    CHECK(t4a_index_has_tag(s1, "n=1", &has));
    if (!has) return 1;
    uint64_t id1 = 0, id2 = 0;
    CHECK(t4a_index_id(s1, &id1));
    /* copy(j): same id; sim(j): clone-with-fresh-id is Julia-side via
     * t4a_index_new + tags, so assert clone keeps the id */
    t4a_index *s1c;
    CHECK(t4a_index_clone(s1, &s1c));
    CHECK(t4a_index_id(s1c, &id2));
    if (id1 != id2) return 1;
    t4a_index_release(s1c);

    /* core.jl tensor_basic + tensor_complex: storage/scalar kinds */
    double a6[6];
    for (int q = 0; q < 6; ++q) a6[q] = q + 1.0;
    const t4a_index *i_t[2] = {s1, l12};
    t4a_tensor *t1;
    CHECK(t4a_tensor_new(i_t, 2, a6, 6, &t1));
    size_t trank = 0;
    CHECK(t4a_tensor_rank(t1, &trank));
    if (trank != 2) return 1;
    int kind = -1;
    CHECK(t4a_tensor_scalar_kind(t1, &kind));
    if (kind != T4A_SCALAR_KIND_F64) return 1;
    double re6[6], im6[6];
    for (int q = 0; q < 6; ++q) { re6[q] = q + 1.0; im6[q] = -(q + 1.0); }
    t4a_tensor *tcplx;
    CHECK(t4a_tensor_new_dense_c64(i_t, 2, re6, im6, 6, &tcplx));
    CHECK(t4a_tensor_scalar_kind(tcplx, &kind));
    if (kind != T4A_SCALAR_KIND_C64) return 1;
    t4a_tensor_release(tcplx);

    /* treetn.jl create: mps = MPS([t1, t2]) */
    double b6[6];
    for (int q = 0; q < 6; ++q) b6[q] = 1.0;
    const t4a_index *i_t2[2] = {l12, s2};
    t4a_tensor *t2;
    CHECK(t4a_tensor_new(i_t2, 2, b6, 6, &t2));
    t4a_treetn *mps;
    CHECK(t4a_treetn_new(&mps));
    CHECK(t4a_treetn_set_tensor(mps, "1", t1));
    CHECK(t4a_treetn_set_tensor(mps, "2", t2));
    /* accessors: nv, linkind dim (=linkdims/maxbonddim), siteinds */
    size_t nv = 0;
    CHECK(t4a_treetn_num_vertices(mps, &nv));
    if (nv != 2) return 1;
    t4a_index *lk;
    CHECK(t4a_treetn_linkind(mps, "1", "2", &lk));
    CHECK(t4a_index_dim(lk, &dim));
    if (dim != 3) return 1;
    int same = 0;
    CHECK(t4a_index_equal(lk, l12, &same));
    if (!same) return 1;
    t4a_index_release(lk);
    t4a_index *sout[4];
    size_t nsite = 0;
    CHECK(t4a_treetn_siteinds(mps, "1", sout, 4, &nsite));
    if (nsite != 1) return 1;
    CHECK(t4a_index_equal(sout[0], s1, &same));
    if (!same) return 1;
    t4a_index_release(sout[0]);

    /* orthogonalize!(mps, 1) */
    CHECK(t4a_treetn_orthogonalize(mps, "1"));
    char cbuf[64];
    CHECK(t4a_treetn_canonical_region(mps, cbuf, sizeof cbuf));
    if (!strstr(cbuf, "1")) return 1;

    /* truncate!(mps; maxdim=2): all-ones tensors are rank 1 exactly */
    const t4a_index *sord[2] = {s1, s2};
    double dref[4];
    CHECK(t4a_treetn_to_dense(mps, sord, 2, dref, 4));
    CHECK(t4a_treetn_truncate(mps, 1e-12, 2));
    CHECK(t4a_treetn_linkind(mps, "1", "2", &lk));
    CHECK(t4a_index_dim(lk, &dim));
    if (dim > 2) return 1;
    t4a_index_release(lk);
    double dtr[4];
    CHECK(t4a_treetn_to_dense(mps, sord, 2, dtr, 4));
    for (int q = 0; q < 4; ++q)
      if (fabs(dtr[q] - dref[q]) > 1e-10) return 1;

    /* mps_a + mps_b */
    t4a_treetn *msum;
    CHECK(t4a_treetn_add(mps, mps, &msum));
    double dsum[4];
    CHECK(t4a_treetn_to_dense(msum, sord, 2, dsum, 4));
    for (int q = 0; q < 4; ++q)
      if (fabs(dsum[q] - 2.0 * dref[q]) > 1e-9) return 1;
    t4a_treetn_release(msum);

    /* norm > 0; inner(a, a) == norm^2 */
    double nrm = 0.0;
    CHECK(t4a_treetn_norm(mps, &nrm));
    if (!(nrm > 0)) return 1;
    double ire = 0, iim = 0;
    CHECK(t4a_treetn_inner(mps, mps, &ire, &iim));
    if (fabs(ire - nrm * nrm) > 1e-9 * nrm * nrm || fabs(iim) > 1e-12)
      return 1;

    /* MPO x MPO contract (treetn.jl "operations"): ones tensors over
     * shared mid indices; every dense entry equals sum over 4 paths */
    t4a_index *s1m, *s2m, *la, *s1o, *s2o, *lb;
    CHECK(t4a_index_new(2, "Site,n=1,Mid", &s1m));
    CHECK(t4a_index_new(2, "Site,n=2,Mid", &s2m));
    CHECK(t4a_index_new(2, "Link,a", &la));
    CHECK(t4a_index_new(2, "Site,n=1,Out", &s1o));
    CHECK(t4a_index_new(2, "Site,n=2,Out", &s2o));
    CHECK(t4a_index_new(2, "Link,b", &lb));
    double ones8[8];
    for (int q = 0; q < 8; ++q) ones8[q] = 1.0;
    const t4a_index *ia1[3] = {s1, s1m, la};
    const t4a_index *ia2[3] = {la, s2, s2m};
    const t4a_index *ib1[3] = {s1m, s1o, lb};
    const t4a_index *ib2[3] = {lb, s2m, s2o};
    t4a_tensor *A1, *A2, *B1, *B2;
    CHECK(t4a_tensor_new(ia1, 3, ones8, 8, &A1));
    CHECK(t4a_tensor_new(ia2, 3, ones8, 8, &A2));
    CHECK(t4a_tensor_new(ib1, 3, ones8, 8, &B1));
    CHECK(t4a_tensor_new(ib2, 3, ones8, 8, &B2));
    t4a_treetn *mpoa, *mpob;
    CHECK(t4a_treetn_new(&mpoa));
    CHECK(t4a_treetn_set_tensor(mpoa, "1", A1));
    CHECK(t4a_treetn_set_tensor(mpoa, "2", A2));
    CHECK(t4a_treetn_new(&mpob));
    CHECK(t4a_treetn_set_tensor(mpob, "1", B1));
    CHECK(t4a_treetn_set_tensor(mpob, "2", B2));
    t4a_svd_truncation_policy mpol = {1e-12, T4A_THRESHOLD_SCALE_RELATIVE,
                                      T4A_SINGULAR_VALUE_MEASURE_VALUE,
                                      T4A_TRUNCATION_RULE_PER_VALUE};
    t4a_treetn *mc;
    CHECK(t4a_treetn_contract_networks(mpoa, mpob,
                                       T4A_CONTRACT_METHOD_ZIPUP, &mpol,
                                       0, &mc));
    CHECK(t4a_treetn_num_vertices(mc, &nv));
    if (nv != 2) return 1;
    const t4a_index *cord[4] = {s1, s1o, s2, s2o};
    double dmc[16];
    CHECK(t4a_treetn_to_dense(mc, cord, 4, dmc, 16));
    /* ones x ones: each output entry = sum over j,l,a,b = 2*2*2*2/2...
     * exact oracle: sum_{j,l} A[i,j,k,l] B[j,m,l,n] with A=B=ones
     * (after the la/lb bond sums contribute a factor 2 each) */
    double expect_mc = 2.0 * 2.0 * 2.0 * 2.0; /* j,l sums x bond factors */
    for (int q = 0; q < 16; ++q)
      if (fabs(dmc[q] - expect_mc) > 1e-8) return 1;
    t4a_treetn_release(mc);

    /* treetn.jl linsolve: 1-site identity, rhs [3,4] -> x = [3,4] */
    t4a_index *sv;
    CHECK(t4a_index_new(2, "s", &sv));
    double rhsv[2] = {3.0, 4.0};
    const t4a_index *irhs[1] = {sv};
    t4a_tensor *trhs;
    CHECK(t4a_tensor_new(irhs, 1, rhsv, 2, &trhs));
    t4a_treetn *rhs;
    CHECK(t4a_treetn_new(&rhs));
    CHECK(t4a_treetn_set_tensor(rhs, "1", trhs));
    double eye_core[4] = {1.0, 0.0, 0.0, 1.0}; /* vec(I), core (1,4,1) */
    const double *ccores[1] = {eye_core};
    int64_t cshapes[3] = {1, 4, 1};
    t4a_tt *opmpo;
    CHECK(t4a_tt_new(ccores, cshapes, 1, &opmpo));
    t4a_treetn *x;
    CHECK(t4a_treetn_linsolve(rhs, opmpo, "1", 0.0, 0.0, 1.0, 0.0,
                              1e-10, 10, 4, &x));
    double xv[2];
    const t4a_index *ixo[1] = {sv};
    CHECK(t4a_treetn_to_dense(x, ixo, 1, xv, 2));
    if (fabs(xv[0] - 3.0) > 1e-8 || fabs(xv[1] - 4.0) > 1e-8) return 1;
    t4a_treetn_release(x);
    t4a_tt_release(opmpo);
    t4a_treetn_release(rhs);
    t4a_tensor_release(trhs);
    t4a_index_release(sv);

    t4a_treetn_release(mpoa);
    t4a_treetn_release(mpob);
    t4a_tensor_release(A1);
    t4a_tensor_release(A2);
    t4a_tensor_release(B1);
    t4a_tensor_release(B2);
    t4a_index_release(s1m);
    t4a_index_release(s2m);
    t4a_index_release(la);
    t4a_index_release(s1o);
    t4a_index_release(s2o);
    t4a_index_release(lb);
    t4a_treetn_release(mps);
    t4a_tensor_release(t1);
    t4a_tensor_release(t2);
    t4a_index_release(s1);
    t4a_index_release(s2);
    t4a_index_release(l12);
  }

  /* storage-parity surface: diag constructor, axis classes, retain */
  {
    t4a_index *d0 = NULL, *d1 = NULL;
    CHECK(t4a_index_new(3, "d0", &d0));
    CHECK(t4a_index_new(4, "d1", &d1));
    const t4a_index *dix[2] = {d0, d1};
    double dv[3] = {1.0, 2.0, 3.0};
    t4a_tensor *dt = NULL;
    CHECK(t4a_tensor_new_diag_f64(2, dix, dv, 3, &dt));
    double buf[12];
    CHECK(t4a_tensor_copy_dense_f64(dt, buf, 12));
    /* column-major (3,4): diag entries at 0, 1+3, 2+6 */
    if (buf[0] != 1.0 || buf[4] != 2.0 || buf[8] != 3.0 ||
        buf[1] != 0.0) {
      fprintf(stderr, "diag payload wrong\n");
      return 1;
    }
    size_t classes[2] = {77, 77}, ncls = 0;
    CHECK(t4a_tensor_axis_classes(dt, classes, 2, &ncls));
    if (ncls != 2 || classes[0] != 0 || classes[1] != 0) {
      fprintf(stderr, "axis classes wrong\n");
      return 1;
    }
    /* contract_retain: keep d1 shared across both operands */
    t4a_tensor *dt2 = NULL, *ret = NULL;
    CHECK(t4a_tensor_new_diag_f64(2, dix, dv, 3, &dt2));
    const t4a_index *keep[1] = {d1};
    CHECK(t4a_tensor_contract_retain(dt, dt2, keep, 1, &ret));
    size_t rr = 0;
    CHECK(t4a_tensor_rank(ret, &rr));
    if (rr != 1) {
      fprintf(stderr, "contract_retain rank wrong\n");
      return 1;
    }
    t4a_tensor_release(ret);
    t4a_tensor_release(dt2);
    t4a_tensor_release(dt);
    t4a_index_release(d0);
    t4a_index_release(d1);
  }

  printf("capi OK\n");
  t4a_index_free(i);
  t4a_index_free(j);
  t4a_index_free(k);
  t4a_index_free(ip);
  t4a_tensor_free(ta);
  t4a_tensor_free(tb);
  t4a_tensor_free(tc);
  t4a_tensor_free(u);
  t4a_tensor_free(s);
  t4a_tensor_free(vh);
  t4a_tt_free(tt);
  t4a_tt_free(ct);
  return 0;
}
