"""ctypes binding to the native range coder (csrc/rangecoder.cpp).

Same build-on-first-use pattern as data/native.py: g++, no external deps,
cached .so. The Python classes in entropy_coding.py define the bitstream
format; this backend is bit-identical (pinned by tests/test_entropy_coding
cross-checks) and removes the per-symbol Python loop from the serving
path. Falls back to None when g++ or the source is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "rangecoder.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        src = os.path.abspath(_SRC)
        if not os.path.exists(src):
            _FAILED = True
            return None
        cache = os.environ.get("HILCODEC_TPU_CACHE",
                               os.path.expanduser("~/.cache/hilcodec_tpu"))
        os.makedirs(cache, exist_ok=True)
        lib_path = os.path.join(cache, "librangecoder.so")
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     src, "-o", lib_path + ".tmp"],
                    check=True, capture_output=True)
                os.replace(lib_path + ".tmp", lib_path)
            except Exception:
                _FAILED = True
                return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError:
            _FAILED = True
            return None
        lib.rc_encode.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.rc_encode.restype = ctypes.c_int64
        lib.rc_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
        lib.rc_decode.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def encode(symbols: np.ndarray, cdfs: np.ndarray) -> Optional[bytes]:
    """symbols [n] int, cdfs [n, card+1] int64 -> bitstream, or None if
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    sym = np.ascontiguousarray(np.asarray(symbols).ravel(), np.int32)
    cd = np.ascontiguousarray(cdfs, np.int64)
    n, stride = cd.shape
    assert len(sym) == n, (len(sym), n)
    # worst case ~precision bits/symbol + renorm slack; grow on overflow
    cap = 4 * n + 1024
    while True:
        out = np.empty(cap, np.uint8)
        nbytes = lib.rc_encode(
            sym.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
            cd.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), stride - 1,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        if nbytes >= 0:
            return out[:nbytes].tobytes()
        cap *= 2


def decode(data: bytes, cdfs: np.ndarray) -> Optional[np.ndarray]:
    """bitstream + cdfs [n, card+1] int64 -> symbols [n] int64, or None."""
    lib = _load()
    if lib is None:
        return None
    cd = np.ascontiguousarray(cdfs, np.int64)
    n, stride = cd.shape
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.int32)
    rc = lib.rc_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        cd.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), stride - 1, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return out.astype(np.int64)
