"""ctypes wrapper + lazy build for the native text-table parser."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "txt_loader.cpp")
_LIB = os.path.join(_DIR, "_txt_loader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        needs_build = (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        )
        if needs_build and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.ptxt_dims.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.ptxt_dims.restype = ctypes.c_int
            lib.ptxt_parse.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_long,
                ctypes.c_long,
            ]
            lib.ptxt_parse.restype = ctypes.c_long
            _lib = lib
            return _lib
        except OSError:
            _build_failed = True
            return None


def available() -> bool:
    return _get_lib() is not None


def load(path: str) -> np.ndarray:
    """Parse a whitespace-delimited numeric table -> (rows, cols) float64."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native txt loader unavailable")
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    if lib.ptxt_dims(path.encode(), ctypes.byref(rows), ctypes.byref(cols)) != 0:
        raise RuntimeError(f"failed to read dims of {path}")
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    got = lib.ptxt_parse(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows.value,
        cols.value,
    )
    if got != rows.value:
        raise RuntimeError(f"parse mismatch in {path}: {got} != {rows.value}")
    return out
