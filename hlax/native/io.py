"""ctypes bindings for the native CSV parser (hlax/native/fastcsv.cpp).

Builds libfastcsv.so on first use (g++ is in the image); falls back to a
numpy-based parser when the toolchain or binary is unavailable, so the
framework stays pure-Python-capable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfastcsv.so")
_SRC = os.path.join(_DIR, "fastcsv.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.isfile(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.fastcsv_parse.restype = ctypes.c_int
            lib.fastcsv_parse.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except OSError:
            _build_failed = True
    return _lib


def read_csv_matrix(path: str) -> np.ndarray:
    """CSV -> float64 matrix; empty/'nan' fields -> NaN; header row skipped.

    Native two-pass (probe + fill) mmap'd parse; numpy fallback otherwise.
    """
    lib = _load()
    if lib is not None:
        rows = ctypes.c_int64(0)
        cols = ctypes.c_int64(0)
        rc = lib.fastcsv_parse(path.encode(), None,
                               ctypes.byref(rows), ctypes.byref(cols))
        if rc == 0 and rows.value > 0:
            out = np.empty((rows.value, cols.value), dtype=np.float64)
            rc = lib.fastcsv_parse(
                path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                ctypes.byref(rows), ctypes.byref(cols))
            if rc == 0:
                return out
    # fallback (also used for malformed files the fast path rejects)
    return _numpy_fallback(path)


def _numpy_fallback(path: str) -> np.ndarray:
    import csv
    rows = []
    with open(path, "r") as f:
        for rec in csv.reader(f):
            try:
                rows.append([float(x) if x not in (None, "") else np.nan
                             for x in rec])
            except ValueError:
                if not rows:
                    continue   # header
                raise
    return np.asarray(rows, dtype=np.float64)
