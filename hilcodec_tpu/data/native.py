"""ctypes binding to the native WAV reader (csrc/wavio.cpp).

Builds the shared library on first use (g++, no external deps) and exposes
`wav_info` / `read_segment` / `read_batch`. The data pipeline uses it when
available and falls back to the stdlib `wave` path otherwise — decode is
GIL-free so the thread-pool loader scales with cores.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "wavio.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
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
        lib_path = os.path.join(cache, "libwavio.so")
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", src, "-o", lib_path + ".tmp"],
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
        lib.wav_info.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int64),
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.POINTER(ctypes.c_int32)]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_read_segment.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                         ctypes.c_int64,
                                         ctypes.POINTER(ctypes.c_float)]
        lib.wav_read_segment.restype = ctypes.c_int64
        lib.wav_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.wav_read_batch.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def wav_info(path: str) -> Tuple[int, int, int]:
    """(num_frames, sample_rate, channels)."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    frames = ctypes.c_int64()
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    if lib.wav_info(path.encode(), ctypes.byref(frames), ctypes.byref(sr),
                    ctypes.byref(ch)) != 0:
        raise IOError(f"cannot parse {path}")
    return frames.value, sr.value, ch.value


def read_segment(path: str, start: int = 0,
                 frames: int = -1) -> np.ndarray:
    """float32 mono segment [frames]; frames=-1 reads to EOF."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    if frames < 0:
        total, _sr, _ch = wav_info(path)
        frames = total - start
    out = np.zeros(max(frames, 0), np.float32)
    got = lib.wav_read_segment(
        path.encode(), start, frames,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got < 0:
        raise IOError(f"cannot read {path}")
    return out[:got] if got < frames else out


def read_batch(paths: Sequence[str], starts: Sequence[int], frames: int,
               threads: int = 8) -> np.ndarray:
    """[len(paths), frames] float32, zero-padded short reads, parallel
    GIL-free decode."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    n = len(paths)
    out = np.zeros((n, frames), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_starts = (ctypes.c_int64 * n)(*[int(s) for s in starts])
    good = lib.wav_read_batch(
        c_paths, c_starts, frames, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads)
    if good != n:
        raise IOError(f"{n - good} of {n} segment reads failed")
    return out
