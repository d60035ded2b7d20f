"""Native host-pipeline library: build-on-first-use + ctypes bindings.

``load()`` returns the bound library or None (fallback to numpy). The
shared object is compiled with g++ -O3 into this directory and cached;
a rebuild happens whenever batcher.cpp is newer than the .so.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "batcher.cpp"
_LIB = _DIR / "libapvbatcher.so"

_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load() -> ctypes.CDLL | None:
    """Bound library or None; builds (once) if needed."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i64 = ctypes.c_int64
    lib.apv_gather_rows.argtypes = [u8p, i64p, i64, i64, u8p]
    lib.apv_gather_rows_f32.argtypes = [f32p, i64p, i64, i64, f32p]
    lib.apv_binarize_u8.argtypes = [u8p, i64, ctypes.c_uint64, f32p]
    lib.apv_gather_rows_u8_to_unit_f32.argtypes = [u8p, i64p, i64, i64, f32p]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray | None:
    """dst[i] = src[idx[i]] via the native library; None if unavailable.

    Supports uint8 and float32 arrays of any row shape (contiguous).
    """
    lib = load()
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        return None
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((len(idx),) + src.shape[1:], src.dtype)
    row_elems = int(np.prod(src.shape[1:], dtype=np.int64))
    if src.dtype == np.uint8:
        lib.apv_gather_rows(_ptr(src, ctypes.c_uint8),
                            _ptr(idx, ctypes.c_int64), len(idx),
                            row_elems, _ptr(out, ctypes.c_uint8))
    elif src.dtype == np.float32:
        lib.apv_gather_rows_f32(_ptr(src, ctypes.c_float),
                                _ptr(idx, ctypes.c_int64), len(idx),
                                row_elems, _ptr(out, ctypes.c_float))
    else:
        return None
    return out


def binarize_u8(src: np.ndarray, seed: int) -> np.ndarray | None:
    """Native static Bernoulli binarization; None if unavailable."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    out = np.empty(src.shape, np.float32)
    lib.apv_binarize_u8(_ptr(src, ctypes.c_uint8), src.size,
                        ctypes.c_uint64(seed), _ptr(out, ctypes.c_float))
    return out
