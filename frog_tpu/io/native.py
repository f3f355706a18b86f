"""ctypes bindings to the native IO library (native/frogio.cpp).

The library is built on demand with g++ (cached as native/libfrogio.so);
callers fall back to pure-Python paths when unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libfrogio.so"))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "frogio.cpp"))
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        built = False
        for extra in (["-DHAVE_LIBDEFLATE", "-ldeflate"], []):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, src]
                    + extra + ["-lz"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                built = True
                break
            except Exception:
                continue
        if not built:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.frogio_read_csv.restype = ctypes.c_int
    lib.frogio_read_csv.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.frogio_write_csv.restype = ctypes.c_int
    lib.frogio_write_csv.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.frogio_read_file.restype = ctypes.c_void_p
    lib.frogio_read_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.frogio_write_file.restype = ctypes.c_int
    lib.frogio_write_file.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    lib.frogio_free.restype = None
    lib.frogio_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def read_csv_matrix(path: str, cols: int, max_rows: int = 1 << 22):
    """Parse a float CSV(.gz) into an (n, cols) float32 array, or None if
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((max_rows, cols), np.float32)
    n = lib.frogio_read_csv(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows,
        cols,
    )
    if n < 0:
        raise FileNotFoundError(path)
    return np.ascontiguousarray(out[:n])


def read_file_bytes(path: str):
    """Whole-file read with transparent gunzip for .gz paths via the
    native codec (libdeflate ~3x python gzip on volume payloads), or
    None when the library is unavailable (callers fall back to gzip)."""
    lib = _load()
    if lib is None:
        return None
    size = ctypes.c_size_t(0)
    ptr = lib.frogio_read_file(str(path).encode(), ctypes.byref(size))
    if not ptr:
        return None
    try:
        return ctypes.string_at(ptr, size.value)
    finally:
        lib.frogio_free(ptr)


def write_file_bytes(path: str, data: bytes) -> bool:
    """Whole-file write, gzip-compressing .gz paths (level 1 — volume IO
    is latency-bound; ~20x faster than python gzip's default level 9).
    Returns False when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    rc = lib.frogio_write_file(str(path).encode(), data, len(data))
    if rc != 0:
        raise OSError(f"native file write failed: {path}")
    return True


def write_csv_matrix(path: str, mat: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    mat = np.ascontiguousarray(mat, np.float32)
    rc = lib.frogio_write_csv(
        str(path).encode(),
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mat.shape[0],
        mat.shape[1],
    )
    if rc != 0:
        raise OSError(f"native CSV write failed: {path}")
    return True
