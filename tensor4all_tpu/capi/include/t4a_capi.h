/* C ABI for the tensor4all_tpu framework.
 *
 * Mirrors the surface of the reference C API
 * (tensor4all-capi/include/tensor4all_capi.h: ~77 t4a_* functions over
 * Index / Tensor / TreeTN / quantics transforms, consumed by
 * Tensor4all.jl) re-implemented as a C++ shim over the JAX/XLA-backed
 * Python runtime: opaque handles own Python objects; every call is
 * wrapped in exception-catching and reports through status codes plus a
 * thread-local error message (ref capi/src/lib.rs:31-75).
 *
 * Round-1 surface: index + tensor + contraction + factorization + TT/TCI
 * entry points. The remaining TreeTN surface follows the same pattern.
 */

#ifndef T4A_CAPI_H
#define T4A_CAPI_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum t4a_status_code {
  T4A_OK = 0,
  T4A_INVALID_ARGUMENT = 1,
  T4A_INTERNAL_ERROR = 2,
  T4A_NOT_FOUND = 3,
} t4a_status_code;

/* Thread-local message describing the last error on this thread. */
const char *t4a_last_error_message(void);

/* Runtime lifecycle: initializes the embedded Python runtime (no-op when
 * already inside a Python process). */
t4a_status_code t4a_init(void);
void t4a_shutdown(void);

/* ------------------------------------------------------------------ */
/* Index                                                               */
/* ------------------------------------------------------------------ */
typedef struct t4a_index t4a_index;

t4a_status_code t4a_index_new(int64_t dim, const char *tags,
                              t4a_index **out);
t4a_status_code t4a_index_dim(const t4a_index *idx, int64_t *out);
t4a_status_code t4a_index_id(const t4a_index *idx, uint64_t *out);
t4a_status_code t4a_index_plev(const t4a_index *idx, int64_t *out);
t4a_status_code t4a_index_prime(const t4a_index *idx, int64_t inc,
                                t4a_index **out);
t4a_status_code t4a_index_equal(const t4a_index *a, const t4a_index *b,
                                int *out);
void t4a_index_free(t4a_index *idx);

/* ------------------------------------------------------------------ */
/* Tensor (dense f64)                                                  */
/* ------------------------------------------------------------------ */
typedef struct t4a_tensor t4a_tensor;

/* data is column-major over the given indices (Julia layout). */
t4a_status_code t4a_tensor_new(const t4a_index *const *indices,
                               size_t rank, const double *data,
                               size_t len, t4a_tensor **out);
t4a_status_code t4a_tensor_rank(const t4a_tensor *t, size_t *out);
t4a_status_code t4a_tensor_dims(const t4a_tensor *t, int64_t *dims,
                                size_t cap);
/* copies the payload out, column-major; len must equal the element count */
t4a_status_code t4a_tensor_data(const t4a_tensor *t, double *data,
                                size_t len);
t4a_status_code t4a_tensor_norm(const t4a_tensor *t, double *out);
t4a_status_code t4a_tensor_contract(const t4a_tensor *const *tensors,
                                    size_t n, t4a_tensor **out);
/* SVD over the first n_left indices; rtol relative squared-tail cutoff,
 * maxdim <= 0 means unbounded. Outputs U, S (diag as tensor), Vh. */
t4a_status_code t4a_tensor_svd(const t4a_tensor *t, size_t n_left,
                               double rtol, int64_t maxdim,
                               t4a_tensor **u, t4a_tensor **s,
                               t4a_tensor **vh);
void t4a_tensor_free(t4a_tensor *t);

/* ------------------------------------------------------------------ */
/* Tensor trains + TCI                                                 */
/* ------------------------------------------------------------------ */
typedef struct t4a_tt t4a_tt;

t4a_status_code t4a_tt_constant(const int64_t *local_dims, size_t n,
                                double value, t4a_tt **out);
t4a_status_code t4a_tt_len(const t4a_tt *tt, size_t *out);
t4a_status_code t4a_tt_ranks(const t4a_tt *tt, int64_t *ranks, size_t cap);
t4a_status_code t4a_tt_sum(const t4a_tt *tt, double *out);
t4a_status_code t4a_tt_evaluate(const t4a_tt *tt, const int64_t *idx,
                                size_t n, double *out);
t4a_status_code t4a_tt_compress(const t4a_tt *tt, double tol,
                                int64_t maxdim, t4a_tt **out);
/* TCI2 of a C callback: f(idx (B*L int64 row-major), B, L, out (B),
 * user_data) -> 0 on success. */
typedef int (*t4a_batch_fn)(const int64_t *idx, size_t batch, size_t len,
                            double *out, void *user_data);
t4a_status_code t4a_crossinterpolate2(t4a_batch_fn f, void *user_data,
                                      const int64_t *local_dims, size_t n,
                                      double tol, int64_t maxdim,
                                      int64_t max_iter, t4a_tt **out);
void t4a_tt_free(t4a_tt *tt);

#ifdef __cplusplus
}
#endif

#endif /* T4A_CAPI_H */
