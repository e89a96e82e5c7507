"""Pseudo-QMF cosine-modulated filterbank.

Kaiser-window prototype design + analysis/synthesis as strided conv /
transposed conv, matching the reference PQMF
(functional/audio_modules.py:240-300). Used by the MFBD/SBD/CoMBD
discriminators and by Avocodo's multi-scale supervision targets.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax
from scipy.signal.windows import kaiser

from .conv import _DIMS


def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.142,
                            beta: float = 9.0) -> np.ndarray:
    """Kaiser-window lowpass prototype (taps+1 coefficients)."""
    assert taps % 2 == 0
    assert 0.0 < cutoff_ratio < 1.0
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio
    return h_i * kaiser(taps + 1, beta)


@lru_cache(maxsize=None)
def pqmf_filter(subbands: int, taps: int = 62, cutoff_ratio: float = 0.142,
                beta: float = 9.0, orthonormal: bool = True) -> np.ndarray:
    """[subbands, 1, taps+1] cosine-modulated analysis bank.

    orthonormal=True multiplies by sqrt(subbands) — the hilcodec
    functional/audio_modules.py:240-300 convention (MFBD/hilcodec-SBD).
    orthonormal=False is the ParallelWaveGAN bank the avocodo family uses
    (models/avocodo/avocodo/pqmf.py:71-96: no sqrt factor) for CoMBD
    multi-scale inputs, avocodo-SBD and the wrapper's PQMF targets."""
    h = design_prototype_filter(taps, cutoff_ratio, beta)[None, :]
    k = np.arange(subbands, dtype=np.float64)[:, None]
    n = np.arange(taps + 1, dtype=np.float64)[None, :]
    bank = (2.0 * h * np.cos(
        (2 * k + 1) * np.pi / (2 * subbands) * (n - taps / 2)
        + (-1.0) ** k * np.pi / 4))
    if orthonormal:
        bank = bank * subbands ** 0.5
    return bank[:, None, :].astype(np.float32)


def analysis(x: jnp.ndarray, subbands: int, taps: int = 62,
             cutoff_ratio: float = 0.142, beta: float = 9.0,
             orthonormal: bool = True) -> jnp.ndarray:
    """x: [B, 1, T] (or [B, T]) -> [B, subbands, T // subbands]."""
    if x.ndim == 2:
        x = x[:, None, :]
    w = jnp.asarray(pqmf_filter(subbands, taps, cutoff_ratio, beta,
                                orthonormal))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(subbands,),
        padding=[(taps // 2, taps // 2)], dimension_numbers=_DIMS)


def synthesis(x: jnp.ndarray, subbands: int, taps: int = 62,
              cutoff_ratio: float = 0.142, beta: float = 9.0) -> jnp.ndarray:
    """x: [B, subbands, T'] -> [B, 1, T'*subbands]; torch conv_transpose1d
    with padding=taps//2, output_padding=subbands-1."""
    w = jnp.asarray(pqmf_filter(subbands, taps, cutoff_ratio, beta))
    # conv_transpose == lhs-dilated conv with flipped weights; weight
    # [subbands, 1, K] acts as [in=subbands, out=1, K]
    K = w.shape[-1]
    wc = jnp.flip(w, axis=-1).transpose(1, 0, 2)   # [1, subbands, K]
    p = taps // 2
    op = subbands - 1
    return lax.conv_general_dilated(
        x, wc.astype(x.dtype), window_strides=(1,),
        padding=[(K - 1 - p, K - 1 - p + op)], lhs_dilation=(subbands,),
        dimension_numbers=_DIMS)
