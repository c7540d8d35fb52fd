"""Native (C++) runtime pieces with lazy build + Python fallbacks.

Currently: the fast .stfs.covars parser (stfs_parser.cpp). The shared library
is built on first use with the in-tree Makefile (g++ -O3 -march=native); if
the toolchain or build is unavailable, callers fall back to the numpy text
parser in io/stfs.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "build", "libstfs_parser.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        # always invoke make: it is a no-op when the .so is newer than the
        # source, and rebuilds stale libraries after source changes
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True,
                capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            if not os.path.exists(_SO):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.parse_stfs_covars.restype = ctypes.c_int64
        lib.parse_stfs_covars.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.count_lines.restype = ctypes.c_int64
        lib.count_lines.argtypes = [ctypes.c_char_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_stfs_file(path: str):
    """Parse with the native library. Returns (map_name, timestamp,
    rows [N, 16] float64) or None if the native path is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pathb = path.encode()
    max_rows = int(lib.count_lines(pathb))
    if max_rows <= 0:
        return None
    out = np.empty((max_rows, 16), np.float64)
    name = ctypes.create_string_buffer(256)
    ts = ctypes.c_double()
    n = lib.parse_stfs_covars(
        pathb, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_rows, name, 256, ctypes.byref(ts),
    )
    if n < 0:
        return None
    return name.value.decode(), float(ts.value), out[:n]
