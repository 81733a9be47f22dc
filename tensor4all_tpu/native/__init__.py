"""ctypes loader for the native host kernels (libt4a_kernels.so).

The library is optional: callers fall back to the numpy twins when it
is absent. `scripts/ci.sh` builds it; a missing toolchain never breaks
the package. Ref: the reference keeps these loops in compiled Rust
(tensor4all-tcicore matrixlu.rs); here the compiled path is C++ and the
portable path is numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libt4a_kernels.so")


def _try_build() -> None:
    """One silent best-effort build (g++ is in the image; if not, the
    numpy fallback carries on)."""
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            timeout=120,
        )
    except Exception:  # noqa: BLE001 — fall back to numpy
        pass


def load() -> Optional[ctypes.CDLL]:
    """Return the kernels library, building it on first use if needed."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        if not os.path.exists(_SO) and os.environ.get(
                "T4A_DISABLE_NATIVE", "0") != "1":
            _try_build()
        _TRIED = True
        if os.environ.get("T4A_DISABLE_NATIVE", "0") == "1":
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        c_i64 = ctypes.c_int64
        c_f64 = ctypes.c_double
        p = ctypes.c_void_p
        sig = [p, c_i64, c_i64, c_f64, c_f64, c_i64, p, p, p, p, p, p]
        lib.t4a_rrlu_f64.restype = c_i64
        lib.t4a_rrlu_f64.argtypes = sig
        lib.t4a_rrlu_c128.restype = c_i64
        lib.t4a_rrlu_c128.argtypes = sig
        svd_sig = [p, c_i64, c_i64, p, p, p]
        lib.t4a_jacobi_svd_f64.restype = None
        lib.t4a_jacobi_svd_f64.argtypes = svd_sig
        lib.t4a_jacobi_svd_c128.restype = None
        lib.t4a_jacobi_svd_c128.argtypes = svd_sig
        _LIB = lib
        return _LIB


def jacobi_svd(a):
    """Full SVD (u, s, vh) of a small 2-D float64/complex128 numpy
    matrix via the native one-sided Jacobi kernel; None when the
    library or dtype is unavailable. High relative accuracy. A
    LAPACK-free fallback, not the default host SVD (gesdd wins above
    ~16x32 on the target hosts). Matches np.linalg.svd(...,
    full_matrices=False): reduced shapes U (r,k), Vh (k,c) with
    k=min(r,c); exactly-zero singular values get an orthonormal
    completion of vh/u rather than zero rows (near-zero values keep
    whatever the Jacobi rotation produced)."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    if a.dtype == np.float64:
        fn = lib.t4a_jacobi_svd_f64
    elif a.dtype == np.complex128:
        fn = lib.t4a_jacobi_svd_c128
    else:
        return None
    r, c = a.shape
    if r == 0 or c == 0:
        k = min(r, c)
        return (np.zeros((r, k), a.dtype), np.zeros(k),
                np.zeros((k, c), a.dtype))
    flip = r > c
    X = np.ascontiguousarray(a.T if flip else a)
    p, q = X.shape
    U = np.empty((p, p), a.dtype)
    s = np.empty(p, np.float64)
    Vh = np.empty((p, q), a.dtype)

    def ptr(x):
        return x.ctypes.data_as(ctypes.c_void_p)

    fn(ptr(X), p, q, ptr(U), ptr(s), ptr(Vh))
    if np.any(s == 0.0):
        # kernel leaves zero rows in Vh for vanished singular values;
        # complete them to an orthonormal set (complement columns of a
        # complete QR), keeping the nonzero rows untouched — U needs no
        # fix (it comes from the accumulated rotations, always unitary)
        nz = s > 0.0
        k = int(nz.sum())
        qfull, _ = np.linalg.qr(Vh[nz].conj().T, mode="complete")
        Vh[~nz] = qfull[:, k:p].conj().T
    if flip:
        # a = X^T = (U S Vh)^T = Vh^T S U^T
        return Vh.T, s, U.T
    return U, s, Vh
