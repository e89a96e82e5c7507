"""MDCT / STDCT transforms (DCT-family, conv-formulated like the reference).

Reference: functional/audio_functional.py:18-125 — DCT-II short-time
transform (`stdct`/`istdct`) with windowed filterbank + fold-based NOLA
normalization, and the MDCT/IMDCT pair with the cos((pi/N)(n+0.5+N/2)(k+0.5))
basis. Filterbanks are numpy constants; transforms are framed matmuls.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stft import frame, hann_window


@lru_cache(maxsize=None)
def dct_filter(N: int, win_size: Optional[int] = None,
               win_type: Optional[str] = "hann") -> Tuple[np.ndarray,
                                                          np.ndarray]:
    """([N, N] windowed DCT-II basis, [N] window). Matches
    get_dct_filter (audio_functional.py:18-46)."""
    if win_size is None:
        win_size = N
    if win_type is None:
        window = np.ones(N, np.float32)
    else:
        window = np.asarray(hann_window(win_size))
        pad = N - win_size
        window = np.pad(window, (pad // 2, pad - pad // 2))
    n = np.arange(N)[None, :]
    k = np.arange(N)[:, None]
    basis = np.cos(math.pi / N * k * (n + 0.5)) * math.sqrt(2.0 / N)
    basis[0] /= math.sqrt(2)
    return (basis * window[None, :]).astype(np.float32), \
        window.astype(np.float32)


def stdct(y: jnp.ndarray, N: int, hop_size: int,
          win_size: Optional[int] = None, center: bool = False,
          win_type: Optional[str] = "hann") -> jnp.ndarray:
    """Short-time DCT-II: [B, 1, hop*T] (or [B, hop*T]) -> [B, N, T]."""
    if y.ndim == 3:
        y = y.squeeze(1)
    basis, _ = dct_filter(N, win_size, win_type)
    pad = N // 2 if center else (N - hop_size) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)))
    frames = frame(y, N, hop_size)                       # [B, T, N]
    out = jnp.einsum("btn,kn->bkt", frames.astype(jnp.float32),
                     jnp.asarray(basis))
    return out.astype(y.dtype)


def istdct(y: jnp.ndarray, N: int, hop_size: int,
           win_size: Optional[int] = None, center: bool = False,
           win_type: Optional[str] = "hann") -> jnp.ndarray:
    """Inverse STDCT with NOLA window-square normalization
    (audio_functional.py:64-90). y: [B, N, T] -> [B, 1, hop*T']."""
    basis, window = dct_filter(N, win_size, win_type)
    pad = N // 2 if center else (N - hop_size) // 2
    B, _, T = y.shape
    frames = jnp.einsum("bkt,kn->btn", y.astype(jnp.float32),
                        jnp.asarray(basis))              # [B, T, N]
    out_len = hop_size * T + (N - hop_size)
    idx = (np.arange(T)[:, None] * hop_size + np.arange(N)[None, :]).ravel()
    sig = jax.vmap(
        lambda fr: jnp.zeros(out_len).at[idx].add(fr.ravel()))(frames)
    wsq = np.zeros(out_len, np.float64)
    np.add.at(wsq, idx, np.tile(window.astype(np.float64) ** 2, T))
    sig = sig[:, pad:out_len - pad]
    wsq = wsq[pad:out_len - pad]
    assert (wsq != 0).all(), "NOLA violated (audio_functional.py:89)"
    return (sig / jnp.asarray(wsq, jnp.float32))[:, None, :]


@lru_cache(maxsize=None)
def mdct_filter(N: int) -> np.ndarray:
    """[N, 2N] MDCT basis cos(pi/N (n+0.5+N/2)(k+0.5))."""
    k = np.arange(N)[:, None]
    n = np.arange(2 * N)[None, :]
    return np.cos(math.pi / N * (n + 0.5 + N / 2) * (k + 0.5)).astype(
        np.float32)


def mdct(y: jnp.ndarray, N: int, normalize: bool = False) -> jnp.ndarray:
    """[B, 1, N*T] -> [B, N, T+1] (pad N both sides, stride N)."""
    if y.ndim == 3:
        y = y.squeeze(1)
    basis = mdct_filter(N)
    if normalize:
        basis = basis / math.sqrt(N)
    y = jnp.pad(y, ((0, 0), (N, N)))
    frames = frame(y, 2 * N, N)
    out = jnp.einsum("btn,kn->bkt", frames.astype(jnp.float32),
                     jnp.asarray(basis))
    return out.astype(y.dtype)


def imdct(y: jnp.ndarray, N: int, normalize: bool = False) -> jnp.ndarray:
    """[B, N, T+1] -> [B, 1, N*T] via transposed overlap-add, matching the
    reference conv_transpose1d(stride=N, padding=N)."""
    basis = mdct_filter(N)
    basis = basis / math.sqrt(N) if normalize else basis / N
    B, _, T = y.shape
    frames = jnp.einsum("bkt,kn->btn", y.astype(jnp.float32),
                        jnp.asarray(basis))              # [B, T, 2N]
    out_len = N * (T - 1) + 2 * N
    idx = (np.arange(T)[:, None] * N + np.arange(2 * N)[None, :]).ravel()
    sig = jax.vmap(
        lambda fr: jnp.zeros(out_len).at[idx].add(fr.ravel()))(frames)
    return sig[:, N:out_len - N][:, None, :]
