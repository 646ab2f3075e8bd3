"""Native (C++) acceleration layer: build-on-first-use, ctypes-bound.

The shared library is compiled once per machine into a cache directory and
loaded with ctypes (which releases the GIL around calls, so the threaded
reader actually runs in parallel).  Everything here degrades gracefully:
if no compiler is available the callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

import numpy as np

__all__ = ["get_lib", "read_block", "write_block", "available", "build_capi"]

_SRC = os.path.join(os.path.dirname(__file__), "chaseio.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    d = os.environ.get("CHASE_NATIVE_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache",
                                    "chase_tpu"))
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"chaseio_{tag}.so")


def get_lib():
    """Compile (if needed) and load the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CHASE_DISABLE_NATIVE"):
            return None
        so = _cache_path()
        if not os.path.exists(so):
            cxx = os.environ.get("CXX", "g++")
            cmd = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                   _SRC, "-o", so + ".tmp"]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
                os.replace(so + ".tmp", so)
            except Exception as e:  # no compiler / failed build → fallback
                print(f"[chase_tpu] native build unavailable ({e}); "
                      f"using numpy I/O fallback", file=sys.stderr)
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.chase_read_block.restype = ctypes.c_int
        lib.chase_read_block.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int]
        lib.chase_write_block.restype = ctypes.c_int
        lib.chase_write_block.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def build_capi(out: str | None = None) -> str:
    """Build libchase_tpu.so — the reference-compatible C ABI
    ({s,d,c,z}chase_* symbols, chase_capi.cpp) for linking C/Fortran
    applications against this framework.  Returns the library path."""
    src = os.path.join(os.path.dirname(__file__), "chase_capi.cpp")
    if out is None:
        d = os.environ.get("CHASE_NATIVE_CACHE",
                           os.path.join(os.path.expanduser("~"), ".cache",
                                        "chase_tpu"))
        os.makedirs(d, exist_ok=True)
        out = os.path.join(d, "libchase_tpu.so")
    pyconf = sys.executable + "-config"
    if not os.path.exists(pyconf):
        pyconf = "python3-config"
    inc = subprocess.run([pyconf, "--includes"], check=True,
                         capture_output=True, text=True).stdout.split()
    ld = subprocess.run([pyconf, "--ldflags", "--embed"], check=True,
                        capture_output=True, text=True).stdout.split()
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", src,
           *inc, *ld, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    return out


def read_block(path: str, rows_total: int, dtype, row_start: int,
               row_count: int, col_start: int, col_count: int,
               nthreads: int = 0) -> np.ndarray:
    """Read a sub-block of a column-major matrix file → (row_count,
    col_count) numpy array (C-order)."""
    lib = get_lib()
    dtype = np.dtype(dtype)
    if nthreads <= 0:
        nthreads = min(8, os.cpu_count() or 1)
    if lib is None:
        mm = np.memmap(path, dtype=dtype, mode="r",
                       shape=(rows_total,), offset=0)
        del mm  # just to validate; use full fallback below
        full = np.memmap(path, dtype=dtype, mode="r")
        full = full.reshape(-1, rows_total)  # (cols_total, rows) col-major
        return np.ascontiguousarray(
            full[col_start:col_start + col_count,
                 row_start:row_start + row_count].T)
    out = np.empty((col_count, row_count), dtype=dtype)   # col-major block
    rc = lib.chase_read_block(
        path.encode(), rows_total, dtype.itemsize, row_start, row_count,
        col_start, col_count, out.ctypes.data_as(ctypes.c_void_p), nthreads)
    if rc != 0:
        raise OSError(rc, f"chase_read_block failed ({rc}) on {path}")
    return out.T


def write_block(path: str, rows_total: int, arr: np.ndarray, row_start: int,
                col_start: int):
    """Write a (rows, cols) block into a column-major matrix file."""
    lib = get_lib()
    arr = np.asarray(arr)
    if lib is None:
        raise RuntimeError("native writer unavailable; use io.save_matrix")
    colmaj = np.ascontiguousarray(arr.T)     # (cols, rows) = col-major stream
    rc = lib.chase_write_block(
        path.encode(), rows_total, arr.dtype.itemsize, row_start,
        arr.shape[0], col_start, arr.shape[1],
        colmaj.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise OSError(rc, f"chase_write_block failed ({rc}) on {path}")
