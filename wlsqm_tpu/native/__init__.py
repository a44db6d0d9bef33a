"""Native (C++) host runtime pieces, loaded via ctypes.

The compute path of wlsqm_tpu is JAX/XLA on the accelerator; this package
holds the host-side native runtime — currently a multithreaded k-d tree for
neighbor search (the role scipy's cKDTree plays for the reference,
reference: wlsqm/fitter/expert.pyx:38,679).  The shared library is compiled
on demand with the system toolchain and cached next to the sources; if no
compiler is available, callers fall back to SciPy transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kdtree.cpp")
_LIB = os.path.join(_HERE, "_kdtree.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _compile() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
        "-pthread", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (compiling if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _compile()
            lib = ctypes.CDLL(_LIB)
        except Exception:
            _load_failed = True
            return None
        lib.wlsqm_kdtree_build.restype = ctypes.c_void_p
        lib.wlsqm_kdtree_build.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int]
        lib.wlsqm_kdtree_free.argtypes = [ctypes.c_void_p]
        lib.wlsqm_kdtree_knn.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int]
        lib.wlsqm_kdtree_radius.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


class KDTree:
    """Native k-d tree over an (N, dim) float64 cloud.

    API mirrors the slice of scipy.spatial.cKDTree the framework uses:
    ``query(x, k)`` and ``query_ball_point(x, r)``.
    """

    def __init__(self, data, nthreads: int | None = None):
        lib = load()
        if lib is None:
            raise RuntimeError("native kdtree unavailable (no compiler?)")
        self._lib = lib
        data = np.ascontiguousarray(np.atleast_2d(data), dtype=np.float64)
        self.n, self.dim = data.shape
        self._data = data  # keep alive
        self._handle = lib.wlsqm_kdtree_build(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.n, self.dim)
        self._nthreads = nthreads or (os.cpu_count() or 1)

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.wlsqm_kdtree_free(handle)
            self._handle = None

    def query(self, x, k: int = 1):
        """k nearest neighbors. Returns (distances (m,k), indices (m,k));
        squeezed to (m,) when k == 1, matching scipy."""
        x = np.ascontiguousarray(np.atleast_2d(x), dtype=np.float64)
        m = x.shape[0]
        idx = np.empty((m, k), dtype=np.int64)
        d2 = np.empty((m, k), dtype=np.float64)
        self._lib.wlsqm_kdtree_knn(
            self._handle,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m, k,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            d2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self._nthreads)
        d = np.sqrt(d2)
        if k == 1:
            return d[:, 0], idx[:, 0]
        return d, idx

    def query_ball_point(self, x, r: float):
        """All indices within radius r of each query; list of index lists.

        Mirrors scipy.spatial.cKDTree: a single (dim,) query returns one
        flat index list, an (m, dim) batch returns a list of m lists.
        """
        single = np.ndim(x) == 1
        x = np.ascontiguousarray(np.atleast_2d(x), dtype=np.float64)
        m = x.shape[0]
        counts = np.zeros(m, dtype=np.int64)
        self._lib.wlsqm_kdtree_radius(
            self._handle,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
            float(r),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            None, self._nthreads)
        total = int(counts.sum())
        flat = np.empty(total, dtype=np.int64)
        self._lib.wlsqm_kdtree_radius(
            self._handle,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
            float(r),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._nthreads)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        out = [flat[offsets[i]:offsets[i + 1]].tolist() for i in range(m)]
        return out[0] if single else out
