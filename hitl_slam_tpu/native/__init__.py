"""Native (C++) runtime pieces with lazy build + Python fallbacks.

Currently: the fast .stfs.covars parser (stfs_parser.cpp) and the ROS-bag
record scanner (bag_scanner.cpp — the data-loader hot path, mirroring the
reference's C++ rosbag ingestion at vector_mapping_main.cpp:1320). Shared
libraries are built on first use with the in-tree Makefile (g++ -O3
-march=native); if the toolchain or build is unavailable, callers fall back
to the pure-Python paths (io/stfs.py text parser, io/rosbag.py framing).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_lock = threading.Lock()
_libs: dict[str, object] = {}       # name -> CDLL | None (None = failed)


def _load_lib(name: str):
    """Build (make is a no-op when fresh) + dlopen build/lib<name>.so.
    Returns the CDLL or None; failures are cached."""
    with _lock:
        if name in _libs:
            return _libs[name]
        so = os.path.join(_DIR, "build", f"lib{name}.so")
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True,
                capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            if not os.path.exists(so):
                _libs[name] = None
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            lib = None
        _libs[name] = lib
        return lib


def _load():
    lib = _load_lib("stfs_parser")
    if lib is not None and not getattr(lib, "_configured", False):
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
        lib._configured = True
    return lib


def available() -> bool:
    return _load() is not None


def _load_bag():
    lib = _load_lib("bag_scanner")
    if lib is not None and not getattr(lib, "_configured", False):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.bag_count_records.restype = ctypes.c_int64
        lib.bag_count_records.argtypes = [u8p, ctypes.c_int64,
                                          ctypes.c_int64]
        lib.bag_scan_records.restype = ctypes.c_int64
        lib.bag_scan_records.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), i64p,
            ctypes.POINTER(ctypes.c_double), i64p, i64p, i64p, i64p, i64p,
        ]
        if hasattr(lib, "bag_xxh32"):   # absent in a stale pre-lz4 build
            lib.bag_xxh32.restype = ctypes.c_uint32
            lib.bag_xxh32.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                      ctypes.c_uint32]
        lib._configured = True
    return lib


def xxh32(data: bytes, seed: int = 0):
    """xxHash32 via the native kernel; None if the library is unavailable
    (callers fall back to io/lz4frame.py's pure-Python mirror)."""
    lib = _load_bag()
    if lib is None or not hasattr(lib, "bag_xxh32"):
        return None
    return int(lib.bag_xxh32(data, len(data), seed & 0xFFFFFFFF))


def bag_available() -> bool:
    return _load_bag() is not None


def scan_bag_records(buf, off: int = 0):
    """Scan a v2.0 record stream (whole bag after the version line, or one
    decompressed chunk payload) in C. Returns None if the native library is
    unavailable, else a dict of per-record numpy columns:

      op [N] i32        first byte of the record's (last) "op" field; -1
      conn [N] i64      (last) "conn" field as u32; -1 if missing/short
      time [N] f64      (last) "time" field secs+1e-9*nsecs; NaN if missing
      header_off/header_len, data_off/data_len [N] i64 into `buf`
      stop (status, record_start, consumed):
          status 0 = clean end, 1 = 1-3 trailing bytes,
          2 = truncated record header, 3 = truncated record data

    Field semantics are bit-compatible with io/rosbag.py::_parse_header /
    _iter_records (equivalence-tested in tests/test_rosbag.py)."""
    lib = _load_bag()
    if lib is None:
        return None
    arr = np.frombuffer(buf, np.uint8)     # zero-copy view of the bytes
    n = arr.size
    if n == 0:
        arr = np.zeros(1, np.uint8)
    bufp = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    count = int(lib.bag_count_records(bufp, n, off))
    cols = dict(
        op=np.empty(count, np.int32), conn=np.empty(count, np.int64),
        time=np.empty(count, np.float64),
        header_off=np.empty(count, np.int64),
        header_len=np.empty(count, np.int64),
        data_off=np.empty(count, np.int64),
        data_len=np.empty(count, np.int64),
    )
    stop = np.zeros(3, np.int64)
    got = int(lib.bag_scan_records(
        bufp, n, off, count,
        cols["op"].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols["conn"].ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols["time"].ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cols["header_off"].ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols["header_len"].ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols["data_off"].ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols["data_len"].ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        stop.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))))
    if got != count:   # can only happen on a mid-scan inconsistency
        cols = {k: v[:got] for k, v in cols.items()}
    cols["stop"] = (int(stop[0]), int(stop[1]), int(stop[2]))
    return cols


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
