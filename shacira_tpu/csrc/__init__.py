"""Native (C++) runtime components, built on demand with the system toolchain.

The compiled library is cached next to the sources; loading falls back
gracefully (callers use the pure-Python implementations when unavailable).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
                        src, '-o', out], check=True, capture_output=True)
        return True
    except Exception:
        return False


def load_range_coder():
    """ctypes handle to the native range coder, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        here = os.path.dirname(__file__)
        src = os.path.join(here, 'range_coder.cpp')
        out = os.path.join(here, '_range_coder.so')
        if not os.path.exists(out) or (os.path.getmtime(out) < os.path.getmtime(src)):
            if not _build(src, out):
                return None
        try:
            lib = ctypes.CDLL(out)
            lib.rc_encode.restype = ctypes.c_int64
            lib.rc_encode.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
            lib.rc_decode.restype = ctypes.c_int
            lib.rc_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32)]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB
