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

/* ------------------------------------------------------------------ */
/* Typed option enums (ref tensor4all_capi.h: t4a_scalar_kind,         */
/* t4a_storage_kind, truncation policy family, canonical form,         */
/* contract method, factorize alg, boundary condition, layout kind).   */
/* Variant values match the reference ABI exactly.                     */
/* ------------------------------------------------------------------ */
typedef enum t4a_scalar_kind {
  T4A_SCALAR_KIND_F64 = 0,
  T4A_SCALAR_KIND_C64 = 1,
} t4a_scalar_kind;

typedef enum t4a_storage_kind {
  T4A_STORAGE_KIND_DENSE = 0,
  T4A_STORAGE_KIND_DIAGONAL = 1,
  T4A_STORAGE_KIND_STRUCTURED = 2,
} t4a_storage_kind;

typedef enum t4a_threshold_scale {
  T4A_THRESHOLD_SCALE_RELATIVE = 0,
  T4A_THRESHOLD_SCALE_ABSOLUTE = 1,
} t4a_threshold_scale;

typedef enum t4a_singular_value_measure {
  T4A_SINGULAR_VALUE_MEASURE_VALUE = 0,
  T4A_SINGULAR_VALUE_MEASURE_SQUARED_VALUE = 1,
} t4a_singular_value_measure;

typedef enum t4a_truncation_rule {
  T4A_TRUNCATION_RULE_PER_VALUE = 0,
  T4A_TRUNCATION_RULE_DISCARDED_TAIL_SUM = 1,
} t4a_truncation_rule;

/* Full SVD truncation policy (ref t4a_svd_truncation_policy). */
typedef struct t4a_svd_truncation_policy {
  double threshold;
  t4a_threshold_scale scale;
  t4a_singular_value_measure measure;
  t4a_truncation_rule rule;
} t4a_svd_truncation_policy;

typedef enum t4a_canonical_form {
  T4A_CANONICAL_FORM_UNITARY = 0,
  T4A_CANONICAL_FORM_LU = 1,
  T4A_CANONICAL_FORM_CI = 2,
} t4a_canonical_form;

typedef enum t4a_contract_method {
  T4A_CONTRACT_METHOD_ZIPUP = 0,
  T4A_CONTRACT_METHOD_FIT = 1,
  T4A_CONTRACT_METHOD_NAIVE = 2,
} t4a_contract_method;

typedef enum t4a_factorize_alg {
  T4A_FACTORIZE_ALG_SVD = 0,
  T4A_FACTORIZE_ALG_QR = 1,
  T4A_FACTORIZE_ALG_LU = 2,
  T4A_FACTORIZE_ALG_CI = 3,
} t4a_factorize_alg;

typedef enum t4a_boundary_condition {
  T4A_BOUNDARY_CONDITION_PERIODIC = 0,
  T4A_BOUNDARY_CONDITION_OPEN = 1,
  T4A_BOUNDARY_CONDITION_ANTI_PERIODIC = 2,
} t4a_boundary_condition;

typedef enum t4a_qtt_layout_kind {
  T4A_QTT_LAYOUT_KIND_INTERLEAVED = 0,
  T4A_QTT_LAYOUT_KIND_FUSED = 1,
} t4a_qtt_layout_kind;

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
/* SVD with the full typed truncation policy (ref t4a_tensor_svd's
 * policy parameter); maxdim == 0 means unbounded. */
t4a_status_code t4a_tensor_svd_with_policy(
    const t4a_tensor *t, size_t n_left,
    const t4a_svd_truncation_policy *policy, size_t maxdim,
    t4a_tensor **u, t4a_tensor **s, t4a_tensor **vh);
void t4a_tensor_free(t4a_tensor *t);

/* ------------------------------------------------------------------ */
/* Tensor trains + TCI                                                 */
/* ------------------------------------------------------------------ */
typedef struct t4a_tt t4a_tt;

/* Build a TT from raw cores. `shapes` is n triples (l, d, r) and each
 * cores[k] is a column-major buffer of l*d*r doubles. Boundary ranks
 * must be 1 (the Julia bindings hand hand-built MPOs across this way). */
t4a_status_code t4a_tt_new(const double *const *cores,
                           const int64_t *shapes, size_t n,
                           t4a_tt **out);
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


/* ------------------------------------------------------------------ */
/* Index (extended)                                                    */
/* ------------------------------------------------------------------ */
t4a_status_code t4a_index_clone(const t4a_index *idx, t4a_index **out);
int t4a_index_is_assigned(const t4a_index *idx);
t4a_status_code t4a_index_noprime(const t4a_index *idx, t4a_index **out);
t4a_status_code t4a_index_set_plev(const t4a_index *idx, int64_t plev,
                                   t4a_index **out);
t4a_status_code t4a_index_tags(const t4a_index *idx, char *buf,
                               size_t cap);
t4a_status_code t4a_index_has_tag(const t4a_index *idx, const char *tag,
                                  int *out);
t4a_status_code t4a_index_hash(const t4a_index *idx, uint64_t *out);
t4a_status_code t4a_index_new_with_id(int64_t dim, const char *tags,
                                      uint64_t id, int64_t plev,
                                      t4a_index **out);
void t4a_index_release(t4a_index *idx); /* alias of t4a_index_free */

/* ------------------------------------------------------------------ */
/* Tensor (extended; storage is dense — diag/structured fast paths are */
/* subsumed by XLA fusion, see SURVEY.md design stance)                */
/* ------------------------------------------------------------------ */
t4a_status_code t4a_tensor_clone(const t4a_tensor *t, t4a_tensor **out);
int t4a_tensor_is_assigned(const t4a_tensor *t);
t4a_status_code t4a_tensor_conj(const t4a_tensor *t, t4a_tensor **out);
t4a_status_code t4a_tensor_add(const t4a_tensor *a, const t4a_tensor *b,
                               t4a_tensor **out);
t4a_status_code t4a_tensor_scale(const t4a_tensor *t, double re,
                                 double im, t4a_tensor **out);
t4a_status_code t4a_tensor_qr(const t4a_tensor *t, size_t n_left,
                              t4a_tensor **q, t4a_tensor **r);
t4a_status_code t4a_tensor_indices(const t4a_tensor *t, t4a_index **out,
                                   size_t cap);
t4a_status_code t4a_tensor_select_indices(const t4a_tensor *t,
                                          const t4a_index *idx,
                                          int64_t value,
                                          t4a_tensor **out);
t4a_status_code t4a_tensor_storage_kind(const t4a_tensor *t, int *out);
t4a_status_code t4a_tensor_scalar_kind(const t4a_tensor *t, int *out);
t4a_status_code t4a_tensor_payload_rank(const t4a_tensor *t, size_t *out);
t4a_status_code t4a_tensor_payload_dims(const t4a_tensor *t,
                                        int64_t *dims, size_t cap);
t4a_status_code t4a_tensor_payload_len(const t4a_tensor *t, size_t *out);
t4a_status_code t4a_tensor_payload_strides(const t4a_tensor *t,
                                           int64_t *strides, size_t cap);
t4a_status_code t4a_tensor_copy_payload_f64(const t4a_tensor *t,
                                            double *data, size_t len);
t4a_status_code t4a_tensor_new_dense_c64(const t4a_index *const *indices,
                                         size_t rank, const double *re,
                                         const double *im, size_t len,
                                         t4a_tensor **out);
/* interleaved (re, im) pairs; len = element count */
t4a_status_code t4a_tensor_copy_payload_c64(const t4a_tensor *t,
                                            double *interleaved,
                                            size_t len);
t4a_status_code t4a_tensor_contract_many_retain(
    const t4a_tensor *const *tensors, size_t n,
    const t4a_index *const *retain, size_t n_retain, t4a_tensor **out);
void t4a_tensor_release(t4a_tensor *t); /* alias of t4a_tensor_free */

t4a_status_code t4a_tt_clone(const t4a_tt *tt, t4a_tt **out);
void t4a_tt_release(t4a_tt *tt); /* alias of t4a_tt_free */

/* ------------------------------------------------------------------ */
/* TreeTN (ref capi treetn.rs:1-2052). Vertices are named by C strings;*/
/* topology is derived from shared index identity (from_tensors).      */
/* String list outputs are newline-separated.                          */
/* ------------------------------------------------------------------ */
typedef struct t4a_treetn t4a_treetn;
typedef struct t4a_treetn_evaluator t4a_treetn_evaluator;

t4a_status_code t4a_treetn_new(t4a_treetn **out);
void t4a_treetn_release(t4a_treetn *tn);
int t4a_treetn_is_assigned(const t4a_treetn *tn);
t4a_status_code t4a_treetn_clone(const t4a_treetn *tn, t4a_treetn **out);
t4a_status_code t4a_treetn_set_tensor(t4a_treetn *tn, const char *vertex,
                                      const t4a_tensor *t);
t4a_status_code t4a_treetn_tensor(const t4a_treetn *tn,
                                  const char *vertex, t4a_tensor **out);
t4a_status_code t4a_treetn_num_vertices(const t4a_treetn *tn,
                                        size_t *out);
t4a_status_code t4a_treetn_node_names(const t4a_treetn *tn, char *buf,
                                      size_t cap);
t4a_status_code t4a_treetn_neighbors(const t4a_treetn *tn,
                                     const char *vertex, char *buf,
                                     size_t cap);
t4a_status_code t4a_treetn_canonical_region(const t4a_treetn *tn,
                                            char *buf, size_t cap);
t4a_status_code t4a_treetn_siteinds(const t4a_treetn *tn,
                                    const char *vertex, t4a_index **out,
                                    size_t cap, size_t *n_out);
t4a_status_code t4a_treetn_linkind(const t4a_treetn *tn, const char *a,
                                   const char *b, t4a_index **out);
t4a_status_code t4a_treetn_orthogonalize(t4a_treetn *tn,
                                         const char *center);
/* Orthogonalize with an explicit canonical form (ref
 * t4a_treetn_orthogonalize(vertex, form, force) semantics: repeated
 * same-form calls are no-ops; switching forms requires nonzero force). */
t4a_status_code t4a_treetn_orthogonalize_form(t4a_treetn *tn,
                                              const char *center,
                                              t4a_canonical_form form,
                                              int force);
t4a_status_code t4a_treetn_truncate(t4a_treetn *tn, double rtol,
                                    int64_t maxdim);
/* Truncate with the full typed policy (ref t4a_treetn_truncate). */
t4a_status_code t4a_treetn_truncate_with_policy(
    t4a_treetn *tn, const t4a_svd_truncation_policy *policy,
    size_t maxdim);
/* Copy with fresh bond-index identities (ref TreeTN::sim_linkinds) —
 * required before contracting a network with a copy of itself. */
t4a_status_code t4a_treetn_sim_linkinds(const t4a_treetn *tn,
                                        t4a_treetn **out);
/* Two-network contraction A . B with an explicit method (ref
 * t4a_treetn_contract(a, b, method, policy, maxdim, ...)). The
 * reference's extra knobs (nfullsweeps, factorize_alg, qr_rtol,
 * max_dense_elements) take their backend defaults here. */
t4a_status_code t4a_treetn_contract_networks(
    const t4a_treetn *a, const t4a_treetn *b, t4a_contract_method method,
    const t4a_svd_truncation_policy *policy, size_t maxdim,
    t4a_treetn **out);
t4a_status_code t4a_treetn_contract(const t4a_treetn *tn,
                                    t4a_tensor **out);
t4a_status_code t4a_treetn_inner(const t4a_treetn *a, const t4a_treetn *b,
                                 double *re, double *im);
t4a_status_code t4a_treetn_norm(const t4a_treetn *tn, double *out);
t4a_status_code t4a_treetn_scale(t4a_treetn *tn, double re, double im);
t4a_status_code t4a_treetn_add(const t4a_treetn *a, const t4a_treetn *b,
                               t4a_treetn **out);
t4a_status_code t4a_treetn_evaluate(const t4a_treetn *tn,
                                    const t4a_index *const *indices,
                                    const int64_t *values, size_t n,
                                    double *re, double *im);
t4a_status_code t4a_treetn_fuse_to(const t4a_treetn *tn,
                                   const char *vertices_nl,
                                   t4a_treetn **out);
t4a_status_code t4a_treetn_split_to(const t4a_treetn *tn,
                                    const char *vertex,
                                    const t4a_index *const *left_inds,
                                    size_t n_left, const char *left_name,
                                    const char *right_name, double rtol,
                                    int64_t maxdim, t4a_treetn **out);
t4a_status_code t4a_treetn_swap_site_indices(const t4a_treetn *tn,
                                             const char *a, const char *b,
                                             double rtol, int64_t maxdim,
                                             t4a_treetn **out);
/* MPO given as a TT whose cores have fused (out*in) site dims, applied
 * along the chain `order_nl` (newline-separated vertex names). */
t4a_status_code t4a_treetn_apply_operator_chain(
    const t4a_treetn *tn, const t4a_tt *mpo, const char *order_nl,
    double rtol, int64_t maxdim, t4a_treetn **out);
/* solve (a0 + a1 A) x = b with A a chain MPO over order_nl */
t4a_status_code t4a_treetn_linsolve(const t4a_treetn *b, const t4a_tt *mpo,
                                    const char *order_nl, double a0_re,
                                    double a0_im, double a1_re,
                                    double a1_im, double rtol,
                                    int64_t maxdim, int64_t nsweeps,
                                    t4a_treetn **out);
t4a_status_code t4a_treetn_to_dense(const t4a_treetn *tn,
                                    const t4a_index *const *order,
                                    size_t n, double *data, size_t len);

t4a_status_code t4a_treetn_evaluator_new(const t4a_treetn *tn,
                                         const t4a_index *const *order,
                                         size_t n,
                                         t4a_treetn_evaluator **out);
int t4a_treetn_evaluator_is_assigned(const t4a_treetn_evaluator *ev);
t4a_status_code t4a_treetn_evaluator_clone(const t4a_treetn_evaluator *ev,
                                           t4a_treetn_evaluator **out);
/* idx is row-major (batch, n_sites) int64 */
t4a_status_code t4a_treetn_evaluator_evaluate(
    const t4a_treetn_evaluator *ev, const int64_t *idx, size_t batch,
    size_t n_sites, double *out);
void t4a_treetn_evaluator_release(t4a_treetn_evaluator *ev);

/* ------------------------------------------------------------------ */
/* QTT layout descriptors + quantics transform materializers           */
/* (ref capi quanticstransform.rs:1-736). Operators materialize as TT  */
/* handles with fused out*in site dims.                                */
/* ------------------------------------------------------------------ */
typedef struct t4a_qtt_layout t4a_qtt_layout;

t4a_status_code t4a_qtt_layout_new(int64_t r, int64_t d,
                                   const char *unfolding,
                                   t4a_qtt_layout **out);
t4a_status_code t4a_qtt_layout_clone(const t4a_qtt_layout *l,
                                     t4a_qtt_layout **out);
int t4a_qtt_layout_is_assigned(const t4a_qtt_layout *l);
void t4a_qtt_layout_release(t4a_qtt_layout *l);

t4a_status_code t4a_qtransform_flip_materialize(int64_t r, t4a_tt **out);
t4a_status_code t4a_qtransform_shift_materialize(int64_t r, int64_t shift,
                                                 const char *bc,
                                                 t4a_tt **out);
t4a_status_code t4a_qtransform_phase_rotation_materialize(int64_t r,
                                                          double theta,
                                                          t4a_tt **out);
t4a_status_code t4a_qtransform_cumsum_materialize(int64_t r, t4a_tt **out);
t4a_status_code t4a_qtransform_fourier_materialize(int64_t r, int sign,
                                                   double rtol,
                                                   int64_t maxdim,
                                                   t4a_tt **out);
t4a_status_code t4a_qtransform_affine_materialize(
    int64_t r, int64_t a_num, int64_t a_den, int64_t b_num, int64_t b_den,
    const char *bc, t4a_tt **out);

/* ------------------------------------------------------------------ */
/* Storage-parity surface (ref capi tensor.rs:491-960). Dense design:  */
/* diag/structured constructors materialize dense payloads; axis       */
/* classes report all-dense (0). Aliases keep name-for-name parity.    */
/* ------------------------------------------------------------------ */
t4a_status_code t4a_tensor_new_dense_f64(const t4a_index *const *indices,
                                         size_t rank, const double *data,
                                         size_t len, t4a_tensor **out);
t4a_status_code t4a_tensor_copy_dense_f64(const t4a_tensor *t,
                                          double *data, size_t len);
t4a_status_code t4a_tensor_copy_dense_c64(const t4a_tensor *t,
                                          double *interleaved,
                                          size_t len);
t4a_status_code t4a_tensor_axis_classes(const t4a_tensor *t, size_t *buf,
                                        size_t buf_len, size_t *out_len);
t4a_status_code t4a_tensor_contract_retain(const t4a_tensor *a,
                                           const t4a_tensor *b,
                                           const t4a_index *const *retain,
                                           size_t n_retain,
                                           t4a_tensor **out);
/* generalized diagonal: value k at position (k, k, ..., k) */
t4a_status_code t4a_tensor_new_diag_f64(size_t rank,
                                        const t4a_index *const *indices,
                                        const double *diag,
                                        size_t diag_len, t4a_tensor **out);
t4a_status_code t4a_tensor_new_diag_c64(size_t rank,
                                        const t4a_index *const *indices,
                                        const double *diag_re,
                                        const double *diag_im,
                                        size_t diag_len, t4a_tensor **out);
/* structured payload: axes sharing a nonzero class id form a
 * generalized-diagonal group backed by one payload axis; payload data
 * is column-major over payload_dims */
t4a_status_code t4a_tensor_new_structured_f64(
    size_t rank, const t4a_index *const *indices, const double *data,
    size_t data_len, const size_t *payload_dims, size_t payload_rank,
    const size_t *axis_classes, size_t axis_classes_len,
    t4a_tensor **out);
t4a_status_code t4a_tensor_new_structured_c64(
    size_t rank, const t4a_index *const *indices, const double *re,
    const double *im, size_t data_len, const size_t *payload_dims,
    size_t payload_rank, const size_t *axis_classes,
    size_t axis_classes_len, t4a_tensor **out);

/* partial contraction of two networks: contract_pairs are summed,
 * diagonal_pairs are pointwise-locked (hadamard-style), everything
 * else stays external (ref capi treetn.rs:1677) */
t4a_status_code t4a_treetn_partial_contract(
    const t4a_treetn *a, const t4a_treetn *b, size_t n_contract_pairs,
    const t4a_index *const *contract_left,
    const t4a_index *const *contract_right, size_t n_diagonal_pairs,
    const t4a_index *const *diagonal_left,
    const t4a_index *const *diagonal_right, t4a_treetn **out);

/* restructure to a target topology: vertices_nl is a newline-separated
 * vertex-name list; site_inds holds the concatenated per-vertex site
 * indices with site_lens giving each vertex's count; edges are given as
 * parallel newline-separated source/target name lists
 * (ref capi treetn.rs:1265) */
t4a_status_code t4a_treetn_restructure_to(
    const t4a_treetn *tn, const char *vertices_nl,
    const t4a_index *const *site_inds, const size_t *site_lens,
    size_t n_vertices, const char *edge_sources_nl,
    const char *edge_targets_nl, double rtol, int64_t maxdim,
    t4a_treetn **out);

#ifdef __cplusplus
}
#endif

#endif /* T4A_CAPI_H */
