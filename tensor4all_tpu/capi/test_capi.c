/* Standalone C consumer of libt4a_capi.so: exercises the embedded-Python
 * path the Julia bindings would use. Exits 0 on success. */

#include <math.h>
#include <stdio.h>
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
