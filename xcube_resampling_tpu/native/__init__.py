"""Native host runtime: C++ kernels bound via ctypes.

The reference's host-side native tier is numba JIT (LLVM-compiled loops);
this package supplies the equivalent as ahead-of-time-compiled C++ shared
libraries.  The library builds itself on first use (g++, no pybind11) and
everything falls back transparently to the vectorized numpy implementations
when no compiler is available.  Set ``XRTPU_NO_NATIVE=1`` to disable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libxrtpu_native.so"
_SOURCES = [_HERE / "phase_a.cpp"]

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    base = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17"]
    tail = ["-o", str(_LIB_PATH), *[str(s) for s in _SOURCES]]
    # OpenMP first (multi-threaded Phase A); plain build as fallback
    for flags in (["-fopenmp"], []):
        try:
            res = subprocess.run(
                base + flags + tail,
                capture_output=True, timeout=120, cwd=str(_HERE),
            )
            if res.returncode == 0 and _LIB_PATH.is_file():
                return True
        except (OSError, subprocess.SubprocessError):
            return False
    return False


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("XRTPU_NO_NATIVE"):
            return None
        newest_src = max(s.stat().st_mtime for s in _SOURCES)
        if not _LIB_PATH.is_file() or _LIB_PATH.stat().st_mtime < newest_src:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.inverse_ij_map_f64.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.inverse_ij_map_f64.restype = None
        lib.inverse_ij_map_f64_mt.argtypes = (
            lib.inverse_ij_map_f64.argtypes + [ctypes.c_int32]
        )
        lib.inverse_ij_map_f64_mt.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def inverse_ij_map_native(
    src_x: np.ndarray,
    src_y: np.ndarray,
    src_i_min: int,
    src_j_min: int,
    dst_shape: tuple[int, int],
    dst_x_offset: float,
    dst_y_offset: float,
    dst_x_scale: float,
    dst_y_scale: float,
    uv_delta: float,
) -> np.ndarray | None:
    """C++ Phase A; returns None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src_x = np.ascontiguousarray(src_x, dtype=np.float64)
    src_y = np.ascontiguousarray(src_y, dtype=np.float64)
    dst_h, dst_w = dst_shape
    out = np.full((2, dst_h, dst_w), np.nan, dtype=np.float64)
    dbl_p = ctypes.POINTER(ctypes.c_double)
    # thread count: XRTPU_NATIVE_THREADS wins, else all cores; the
    # multi-threaded kernel is bit-identical to the sequential one
    # (min-quad-rank merge of contiguous row-block claims)
    try:
        n_threads = int(os.environ.get("XRTPU_NATIVE_THREADS", "0"))
    except ValueError:
        n_threads = 0
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    lib.inverse_ij_map_f64_mt(
        src_x.ctypes.data_as(dbl_p),
        src_y.ctypes.data_as(dbl_p),
        src_x.shape[0],
        src_x.shape[1],
        int(src_i_min),
        int(src_j_min),
        dst_h,
        dst_w,
        float(dst_x_offset),
        float(dst_y_offset),
        float(dst_x_scale),
        float(dst_y_scale),
        float(uv_delta),
        out.ctypes.data_as(dbl_p),
        int(n_threads),
    )
    return out
