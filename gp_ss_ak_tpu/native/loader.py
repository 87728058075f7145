"""ctypes binding + lazy build of the native C++ data parser.

`parse_file` returns the full (rows, cols) float64 table or None when
the shared library is unavailable (data/io.py then falls back to the
NumPy parser). The .so is built on first use with g++ -O3 and cached
next to this file; set GP_SS_AK_NO_NATIVE=1 to disable entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_SO = os.path.join(_HERE, "_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("GP_SS_AK_NO_NATIVE") == "1":
            return None
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.gp_loader_size.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.gp_loader_size.restype = ctypes.c_int
            lib.gp_loader_parse.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.gp_loader_parse.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def parse_file(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    rows = ctypes.c_int64(0)
    cols = ctypes.c_int64(0)
    rc = lib.gp_loader_size(path.encode(), ctypes.byref(rows),
                            ctypes.byref(cols))
    if rc != 0:
        return None
    out = np.zeros((rows.value, cols.value), np.float64)
    rc = lib.gp_loader_parse(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows.value, cols.value)
    if rc != 0:
        return None
    return out
