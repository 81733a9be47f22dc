// C ABI shim over the tensor4all_tpu Python/XLA runtime.
//
// Native-runtime counterpart of the reference's tensor4all-capi crate
// (capi/src/lib.rs: thread-local error storage, status codes, panic
// catching at the boundary): opaque handles own CPython objects; every
// entry point grabs the GIL, converts C buffers to/from numpy, and maps
// Python exceptions to t4a_status_code + t4a_last_error_message().
//
// Works both embedded in a foreign host (Julia/C: t4a_init() boots the
// interpreter) and loaded into an existing Python process (init is a
// no-op; calls re-enter via PyGILState).

#include "include/t4a_capi.h"

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstring>
#include <string>
#include <vector>

namespace {

thread_local std::string g_last_error;

void set_error(const std::string &msg) { g_last_error = msg; }

void set_error_from_python() {
  PyObject *type = nullptr, *value = nullptr, *tb = nullptr;
  PyErr_Fetch(&type, &value, &tb);
  PyErr_NormalizeException(&type, &value, &tb);
  std::string msg = "python error";
  if (value) {
    PyObject *s = PyObject_Str(value);
    if (s) {
      const char *c = PyUnicode_AsUTF8(s);
      if (c) msg = c;
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
  set_error(msg);
}

struct GilGuard {
  PyGILState_STATE state;
  GilGuard() : state(PyGILState_Ensure()) {}
  ~GilGuard() { PyGILState_Release(state); }
};

bool g_we_initialized = false;

PyObject *t4a_module() {
  static PyObject *mod = nullptr;
  if (!mod) {
    mod = PyImport_ImportModule("tensor4all_tpu");
  }
  return mod;
}

PyObject *np_module() {
  static PyObject *np = nullptr;
  if (!np) np = PyImport_ImportModule("numpy");
  return np;
}

// column-major numpy f64 array from a C buffer + dims
PyObject *array_from_buffer(const double *data, size_t len,
                            const int64_t *dims, size_t rank) {
  PyObject *np = np_module();
  if (!np) return nullptr;
  PyObject *mv = PyMemoryView_FromMemory(
      reinterpret_cast<char *>(const_cast<double *>(data)),
      static_cast<Py_ssize_t>(len * sizeof(double)), PyBUF_READ);
  if (!mv) return nullptr;
  PyObject *flat =
      PyObject_CallMethod(np, "frombuffer", "Os", mv, "float64");
  Py_DECREF(mv);
  if (!flat) return nullptr;
  PyObject *shape = PyTuple_New(static_cast<Py_ssize_t>(rank));
  for (size_t k = 0; k < rank; ++k)
    PyTuple_SetItem(shape, static_cast<Py_ssize_t>(k),
                    PyLong_FromLongLong(dims[k]));
  // np.reshape accepts order positionally (ndarray.reshape does not);
  // copy() afterwards detaches from the borrowed C buffer
  PyObject *reshaped = PyObject_CallMethod(
      np, "reshape", "OOs", flat, shape, "F");
  Py_DECREF(flat);
  Py_DECREF(shape);
  if (!reshaped) return nullptr;
  PyObject *owned = PyObject_CallMethod(reshaped, "copy", nullptr);
  Py_DECREF(reshaped);
  return owned;
}

// flatten a tensor payload column-major into out
bool payload_to_buffer(PyObject *tensor, double *out, size_t len) {
  PyObject *np = np_module();
  PyObject *data = PyObject_GetAttrString(tensor, "data");
  if (!data) return false;
  PyObject *arr = PyObject_CallMethod(np, "asarray", "Os", data, "float64");
  Py_DECREF(data);
  if (!arr) return false;
  PyObject *flat = PyObject_CallMethod(arr, "flatten", "s", "F");
  Py_DECREF(arr);
  if (!flat) return false;
  PyObject *bytes = PyObject_CallMethod(flat, "tobytes", nullptr);
  Py_DECREF(flat);
  if (!bytes) return false;
  char *buf = nullptr;
  Py_ssize_t n = 0;
  if (PyBytes_AsStringAndSize(bytes, &buf, &n) != 0) {
    Py_DECREF(bytes);
    return false;
  }
  if (static_cast<size_t>(n) != len * sizeof(double)) {
    Py_DECREF(bytes);
    set_error("payload length mismatch");
    return false;
  }
  std::memcpy(out, buf, static_cast<size_t>(n));
  Py_DECREF(bytes);
  return true;
}

}  // namespace

struct t4a_index {
  PyObject *obj;
};
struct t4a_tensor {
  PyObject *obj;
};
struct t4a_tt {
  PyObject *obj;
};

extern "C" {

const char *t4a_last_error_message(void) { return g_last_error.c_str(); }

t4a_status_code t4a_init(void) {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    g_we_initialized = true;
    // release the GIL acquired by initialization so GilGuard can take it
    PyEval_SaveThread();
  }
  GilGuard gil;
  if (!t4a_module()) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  return T4A_OK;
}

void t4a_shutdown(void) {
  // Leave the interpreter alive: JAX runtimes do not survive
  // re-initialization (matches long-lived host processes like Julia).
}

/* ------------------------------ Index ----------------------------- */

t4a_status_code t4a_index_new(int64_t dim, const char *tags,
                              t4a_index **out) {
  if (!out || dim < 0) {
    set_error("invalid argument");
    return T4A_INVALID_ARGUMENT;
  }
  GilGuard gil;
  PyObject *mod = t4a_module();
  if (!mod) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  PyObject *obj = PyObject_CallMethod(mod, "Index", "Ls", (long long)dim,
                                      tags ? tags : "");
  if (!obj) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = new t4a_index{obj};
  return T4A_OK;
}

static t4a_status_code index_int_attr(const t4a_index *idx,
                                      const char *name, int64_t *out) {
  if (!idx || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *v = PyObject_GetAttrString(idx->obj, name);
  if (!v) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = PyLong_AsLongLong(v);
  Py_DECREF(v);
  if (PyErr_Occurred()) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  return T4A_OK;
}

t4a_status_code t4a_index_dim(const t4a_index *idx, int64_t *out) {
  return index_int_attr(idx, "dim", out);
}

t4a_status_code t4a_index_plev(const t4a_index *idx, int64_t *out) {
  return index_int_attr(idx, "plev", out);
}

t4a_status_code t4a_index_id(const t4a_index *idx, uint64_t *out) {
  int64_t v = 0;
  t4a_status_code st = index_int_attr(idx, "id", &v);
  if (st == T4A_OK) *out = static_cast<uint64_t>(v);
  return st;
}

t4a_status_code t4a_index_prime(const t4a_index *idx, int64_t inc,
                                t4a_index **out) {
  if (!idx || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *obj = PyObject_CallMethod(idx->obj, "prime", "L",
                                      (long long)inc);
  if (!obj) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = new t4a_index{obj};
  return T4A_OK;
}

t4a_status_code t4a_index_equal(const t4a_index *a, const t4a_index *b,
                                int *out) {
  if (!a || !b || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  int r = PyObject_RichCompareBool(a->obj, b->obj, Py_EQ);
  if (r < 0) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = r;
  return T4A_OK;
}

void t4a_index_free(t4a_index *idx) {
  if (!idx) return;
  GilGuard gil;
  Py_XDECREF(idx->obj);
  delete idx;
}

/* ------------------------------ Tensor ---------------------------- */

t4a_status_code t4a_tensor_new(const t4a_index *const *indices,
                               size_t rank, const double *data,
                               size_t len, t4a_tensor **out) {
  if (!out || (rank && !indices) || (len && !data)) {
    set_error("invalid argument");
    return T4A_INVALID_ARGUMENT;
  }
  GilGuard gil;
  PyObject *mod = t4a_module();
  if (!mod) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  std::vector<int64_t> dims(rank);
  size_t expect = 1;
  PyObject *inds = PyTuple_New(static_cast<Py_ssize_t>(rank));
  for (size_t k = 0; k < rank; ++k) {
    PyObject *dimv = PyObject_GetAttrString(indices[k]->obj, "dim");
    dims[k] = PyLong_AsLongLong(dimv);
    Py_DECREF(dimv);
    expect *= static_cast<size_t>(dims[k]);
    Py_INCREF(indices[k]->obj);
    PyTuple_SetItem(inds, static_cast<Py_ssize_t>(k), indices[k]->obj);
  }
  if (expect != len) {
    Py_DECREF(inds);
    set_error("data length does not match index dims");
    return T4A_INVALID_ARGUMENT;
  }
  PyObject *arr = array_from_buffer(data, len, dims.data(), rank);
  if (!arr) {
    Py_DECREF(inds);
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  PyObject *obj = PyObject_CallMethod(mod, "Tensor", "OO", inds, arr);
  Py_DECREF(inds);
  Py_DECREF(arr);
  if (!obj) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = new t4a_tensor{obj};
  return T4A_OK;
}

t4a_status_code t4a_tensor_rank(const t4a_tensor *t, size_t *out) {
  if (!t || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *v = PyObject_GetAttrString(t->obj, "ndim");
  if (!v) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = static_cast<size_t>(PyLong_AsLongLong(v));
  Py_DECREF(v);
  return T4A_OK;
}

t4a_status_code t4a_tensor_dims(const t4a_tensor *t, int64_t *dims,
                                size_t cap) {
  if (!t || !dims) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *shape = PyObject_GetAttrString(t->obj, "shape");
  if (!shape) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  Py_ssize_t n = PyTuple_Size(shape);
  if (static_cast<size_t>(n) > cap) {
    Py_DECREF(shape);
    set_error("dims buffer too small");
    return T4A_INVALID_ARGUMENT;
  }
  for (Py_ssize_t k = 0; k < n; ++k)
    dims[k] = PyLong_AsLongLong(PyTuple_GetItem(shape, k));
  Py_DECREF(shape);
  return T4A_OK;
}

t4a_status_code t4a_tensor_data(const t4a_tensor *t, double *data,
                                size_t len) {
  if (!t || !data) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  if (!payload_to_buffer(t->obj, data, len)) {
    if (PyErr_Occurred()) set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  return T4A_OK;
}

t4a_status_code t4a_tensor_norm(const t4a_tensor *t, double *out) {
  if (!t || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *v = PyObject_CallMethod(t->obj, "norm", nullptr);
  if (!v) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  PyObject *f = PyNumber_Float(v);
  Py_DECREF(v);
  if (!f) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = PyFloat_AsDouble(f);
  Py_DECREF(f);
  return T4A_OK;
}

t4a_status_code t4a_tensor_contract(const t4a_tensor *const *tensors,
                                    size_t n, t4a_tensor **out) {
  if (!tensors || !n || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *mod = t4a_module();
  PyObject *list = PyList_New(static_cast<Py_ssize_t>(n));
  for (size_t k = 0; k < n; ++k) {
    Py_INCREF(tensors[k]->obj);
    PyList_SetItem(list, static_cast<Py_ssize_t>(k), tensors[k]->obj);
  }
  PyObject *obj = PyObject_CallMethod(mod, "contract", "O", list);
  Py_DECREF(list);
  if (!obj) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = new t4a_tensor{obj};
  return T4A_OK;
}

t4a_status_code t4a_tensor_svd(const t4a_tensor *t, size_t n_left,
                               double rtol, int64_t maxdim,
                               t4a_tensor **u, t4a_tensor **s,
                               t4a_tensor **vh) {
  if (!t || !u || !s || !vh) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *mod = t4a_module();
  PyObject *helpers = PyImport_ImportModule("tensor4all_tpu.capi.helpers");
  if (!helpers) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  PyObject *res = PyObject_CallMethod(
      helpers, "svd_first_n", "OndL", t->obj, (Py_ssize_t)n_left, rtol,
      (long long)maxdim);
  Py_DECREF(helpers);
  if (!res) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  PyObject *pu = PyTuple_GetItem(res, 0);
  PyObject *ps = PyTuple_GetItem(res, 1);
  PyObject *pv = PyTuple_GetItem(res, 2);
  Py_INCREF(pu);
  Py_INCREF(ps);
  Py_INCREF(pv);
  Py_DECREF(res);
  *u = new t4a_tensor{pu};
  *s = new t4a_tensor{ps};
  *vh = new t4a_tensor{pv};
  return T4A_OK;
}

void t4a_tensor_free(t4a_tensor *t) {
  if (!t) return;
  GilGuard gil;
  Py_XDECREF(t->obj);
  delete t;
}

/* ------------------------------ TT + TCI -------------------------- */

t4a_status_code t4a_tt_constant(const int64_t *local_dims, size_t n,
                                double value, t4a_tt **out) {
  if (!local_dims || !n || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *ttmod = PyImport_ImportModule("tensor4all_tpu.tt");
  if (!ttmod) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  PyObject *cls = PyObject_GetAttrString(ttmod, "TensorTrain");
  Py_DECREF(ttmod);
  PyObject *dims = PyList_New(static_cast<Py_ssize_t>(n));
  for (size_t k = 0; k < n; ++k)
    PyList_SetItem(dims, static_cast<Py_ssize_t>(k),
                   PyLong_FromLongLong(local_dims[k]));
  PyObject *obj = PyObject_CallMethod(cls, "constant", "Od", dims, value);
  Py_DECREF(cls);
  Py_DECREF(dims);
  if (!obj) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = new t4a_tt{obj};
  return T4A_OK;
}

t4a_status_code t4a_tt_len(const t4a_tt *tt, size_t *out) {
  if (!tt || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  Py_ssize_t n = PyObject_Length(tt->obj);
  if (n < 0) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = static_cast<size_t>(n);
  return T4A_OK;
}

t4a_status_code t4a_tt_ranks(const t4a_tt *tt, int64_t *ranks,
                             size_t cap) {
  if (!tt || !ranks) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *r = PyObject_GetAttrString(tt->obj, "ranks");
  if (!r) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  Py_ssize_t n = PyList_Size(r);
  if (static_cast<size_t>(n) > cap) {
    Py_DECREF(r);
    set_error("ranks buffer too small");
    return T4A_INVALID_ARGUMENT;
  }
  for (Py_ssize_t k = 0; k < n; ++k)
    ranks[k] = PyLong_AsLongLong(PyList_GetItem(r, k));
  Py_DECREF(r);
  return T4A_OK;
}

t4a_status_code t4a_tt_sum(const t4a_tt *tt, double *out) {
  if (!tt || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *v = PyObject_CallMethod(tt->obj, "sum", nullptr);
  if (!v) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  PyObject *f = PyNumber_Float(v);
  Py_DECREF(v);
  if (!f) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = PyFloat_AsDouble(f);
  Py_DECREF(f);
  return T4A_OK;
}

t4a_status_code t4a_tt_evaluate(const t4a_tt *tt, const int64_t *idx,
                                size_t n, double *out) {
  if (!tt || !idx || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *lst = PyList_New(static_cast<Py_ssize_t>(n));
  for (size_t k = 0; k < n; ++k)
    PyList_SetItem(lst, static_cast<Py_ssize_t>(k),
                   PyLong_FromLongLong(idx[k]));
  PyObject *v = PyObject_CallMethod(tt->obj, "evaluate", "O", lst);
  Py_DECREF(lst);
  if (!v) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  PyObject *f = PyNumber_Float(v);
  Py_DECREF(v);
  if (!f) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = PyFloat_AsDouble(f);
  Py_DECREF(f);
  return T4A_OK;
}

t4a_status_code t4a_tt_compress(const t4a_tt *tt, double tol,
                                int64_t maxdim, t4a_tt **out) {
  if (!tt || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *md = maxdim > 0 ? PyLong_FromLongLong(maxdim) : Py_None;
  if (md == Py_None) Py_INCREF(Py_None);
  PyObject *obj =
      PyObject_CallMethod(tt->obj, "compress", "dO", tol, md);
  Py_DECREF(md);
  if (!obj) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = new t4a_tt{obj};
  return T4A_OK;
}

namespace {

// Python-callable wrapping the C batch callback via a capsule.
struct CallbackBox {
  t4a_batch_fn fn;
  void *user_data;
};

PyObject *callback_trampoline(PyObject *self, PyObject *args) {
  PyObject *idx_obj = nullptr;
  if (!PyArg_ParseTuple(args, "O", &idx_obj)) return nullptr;
  CallbackBox *box =
      static_cast<CallbackBox *>(PyCapsule_GetPointer(self, "t4a.cb"));
  if (!box) return nullptr;
  PyObject *np = np_module();
  PyObject *arr = PyObject_CallMethod(np, "ascontiguousarray", "Os",
                                      idx_obj, "int64");
  if (!arr) return nullptr;
  PyObject *shape = PyObject_GetAttrString(arr, "shape");
  Py_ssize_t B = PyLong_AsLongLong(PyTuple_GetItem(shape, 0));
  Py_ssize_t L = PyLong_AsLongLong(PyTuple_GetItem(shape, 1));
  Py_DECREF(shape);
  PyObject *bytes = PyObject_CallMethod(arr, "tobytes", nullptr);
  Py_DECREF(arr);
  if (!bytes) return nullptr;
  const int64_t *idx =
      reinterpret_cast<const int64_t *>(PyBytes_AsString(bytes));
  std::vector<double> out(static_cast<size_t>(B));
  int rc = box->fn(idx, static_cast<size_t>(B), static_cast<size_t>(L),
                   out.data(), box->user_data);
  Py_DECREF(bytes);
  if (rc != 0) {
    PyErr_SetString(PyExc_RuntimeError, "t4a batch callback failed");
    return nullptr;
  }
  int64_t dims[1] = {static_cast<int64_t>(B)};
  return array_from_buffer(out.data(), static_cast<size_t>(B), dims, 1);
}

PyMethodDef callback_def = {"t4a_callback", callback_trampoline,
                            METH_VARARGS, nullptr};

void capsule_destructor(PyObject *cap) {
  delete static_cast<CallbackBox *>(PyCapsule_GetPointer(cap, "t4a.cb"));
}

}  // namespace

t4a_status_code t4a_crossinterpolate2(t4a_batch_fn f, void *user_data,
                                      const int64_t *local_dims, size_t n,
                                      double tol, int64_t maxdim,
                                      int64_t max_iter, t4a_tt **out) {
  if (!f || !local_dims || !n || !out) return T4A_INVALID_ARGUMENT;
  GilGuard gil;
  PyObject *helpers = PyImport_ImportModule("tensor4all_tpu.capi.helpers");
  if (!helpers) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  CallbackBox *box = new CallbackBox{f, user_data};
  PyObject *cap = PyCapsule_New(box, "t4a.cb", capsule_destructor);
  PyObject *pyfn = PyCFunction_New(&callback_def, cap);
  Py_DECREF(cap);
  PyObject *dims = PyList_New(static_cast<Py_ssize_t>(n));
  for (size_t k = 0; k < n; ++k)
    PyList_SetItem(dims, static_cast<Py_ssize_t>(k),
                   PyLong_FromLongLong(local_dims[k]));
  PyObject *res = PyObject_CallMethod(
      helpers, "crossinterpolate2_c", "OOdLL", pyfn, dims, tol,
      (long long)maxdim, (long long)max_iter);
  Py_DECREF(pyfn);
  Py_DECREF(dims);
  Py_DECREF(helpers);
  if (!res) {
    set_error_from_python();
    return T4A_INTERNAL_ERROR;
  }
  *out = new t4a_tt{res};
  return T4A_OK;
}

void t4a_tt_free(t4a_tt *tt) {
  if (!tt) return;
  GilGuard gil;
  Py_XDECREF(tt->obj);
  delete tt;
}

}  // extern "C"
