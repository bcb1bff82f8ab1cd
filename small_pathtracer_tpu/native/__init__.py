"""Native (C++) host utilities, loaded via ctypes.

Lazy-built from sptnative.cpp with g++ -O3 on first use (cached next to the
source). Every caller has a pure-Python fallback, so the package works
without a toolchain; with one, the hot host paths (PPM encode, tonemap,
rand48) run at native speed. See sptnative.cpp for what and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sptnative.cpp")
_LIB = os.path.join(_HERE, "libsptnative.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_LIB):
        # A prebuilt .so without sources (e.g. a binary wheel) is valid:
        # only rebuild when the source exists AND is newer.
        if not os.path.exists(_SRC) or (
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
        ):
            return _LIB
    if not os.path.exists(_SRC):
        return None
    try:
        # Build to a temp file then rename (atomic wrt concurrent builders).
        fd, tmp = tempfile.mkstemp(dir=_HERE, suffix=".so.tmp")
        os.close(fd)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True,
        )
        os.replace(tmp, _LIB)
        return _LIB
    except (OSError, subprocess.CalledProcessError):
        return None


def load() -> ctypes.CDLL | None:
    """The native library, or None if unavailable (no g++)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.ppm_encode.restype = ctypes.c_int64
        lib.ppm_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_char_p,
        ]
        lib.tonemap_u8.restype = None
        lib.tonemap_u8.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.erand48_fill.restype = None
        lib.erand48_fill.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return _lib


def ppm_body(vals_u8: np.ndarray) -> bytes | None:
    """The reference's PPM body bytes ("%d %d %d " stream) or None."""
    lib = load()
    if lib is None:
        return None
    v = np.ascontiguousarray(vals_u8.reshape(-1), dtype=np.uint8)
    out = ctypes.create_string_buffer(4 * v.size)
    n = lib.ppm_encode(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), v.size, out
    )
    return out.raw[:n]


def tonemap_u8(linear_f32: np.ndarray) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(linear_f32, dtype=np.float32)
    out = np.empty(x.shape, np.uint8)
    lib.tonemap_u8(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def erand48(state: int, n: int) -> tuple[np.ndarray, int] | None:
    """n POSIX erand48 draws from 48-bit state; returns (draws, new_state)."""
    lib = load()
    if lib is None:
        return None
    st = ctypes.c_uint64(state)
    out = np.empty(n, np.float64)
    lib.erand48_fill(
        ctypes.byref(st), n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    )
    return out, st.value
