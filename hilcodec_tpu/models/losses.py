"""Training losses: multi-resolution mel (3 variants), GAN, feature matching.

Reference: models/hilcodec/losses.py. Loss functions operate on dicts of
per-discriminator logits/feature-map lists, returning the reference's loss
dictionary keyed `freq`, `{name}_g`, `{name}_fm` for the Balancer.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mel as M
from ..ops import stft as S

DiscOutput = Dict[str, List[jnp.ndarray]]
LossOutput = Dict[str, jnp.ndarray]


def mel_scale_htk(f: float) -> float:
    return 2595.0 * math.log10(1.0 + f / 700.0)


def _mel_spec_power(x: jnp.ndarray, n_fft: int, hop: int,
                    basis: jnp.ndarray) -> jnp.ndarray:
    """torchaudio.MelSpectrogram(center=False, power=2) semantics:
    no padding, hann(n_fft), power spectrum, mel matmul.
    x: [B, 1, T] or [B, T] -> [B, n_mels, L]."""
    if x.ndim == 3:
        x = x.squeeze(1)
    window = S.hann_window(n_fft).astype(x.dtype)
    frames = S.frame(x, n_fft, hop) * window
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).swapaxes(-1, -2)  # [B, F, L]
    return jnp.einsum("mf,bfl->bml", basis.astype(power.dtype), power)


@dataclasses.dataclass(frozen=True)
class MelLoss:
    """Multi-resolution L1+MSE log-mel loss (losses.py:20-54).

    Resolutions n_fft = 2^5..2^10, hop = n_fft/4, htk mel scale with slaney
    norm (torchaudio MelSpectrogram defaults), power-2 spectrogram. The
    generated side uses the straight-through clamp: values below clip_val
    are clipped but gradients pass through (losses.py:46-50).
    """
    sampling_rate: int
    clip_val: float = 1.0e-5
    no_zero: bool = True
    n_mels_max: int = 80

    def __post_init__(self):
        transforms = []
        for i in range(5, 11):
            s = 2 ** i
            if self.no_zero:
                n_mels = int(min(
                    self.n_mels_max,
                    2 * mel_scale_htk(self.sampling_rate / 2)
                    / mel_scale_htk(self.sampling_rate / s) - 1,
                    s // 4))
            else:
                n_mels = min(self.n_mels_max, s // 4)
            basis = M.mel_filterbank(self.sampling_rate, s, n_mels,
                                     norm="slaney", htk=True)
            transforms.append((s, s // 4, jnp.asarray(basis)))
        object.__setattr__(self, "transforms", tuple(transforms))

    def __call__(self, wav_g: jnp.ndarray, wav_r: jnp.ndarray) -> LossOutput:
        loss = jnp.zeros((), jnp.float32)
        for (n_fft, hop, basis) in self.transforms:
            mel_g = _mel_spec_power(wav_g, n_fft, hop, basis)
            # straight-through clamp for the generated side
            mel_g = jnp.where(
                mel_g >= self.clip_val, mel_g,
                mel_g - jax.lax.stop_gradient(mel_g) + self.clip_val)
            mel_g = jnp.log(mel_g)
            mel_r = jnp.log(jnp.maximum(
                _mel_spec_power(wav_r, n_fft, hop, basis), self.clip_val))
            diff = mel_g - jax.lax.stop_gradient(mel_r)
            loss = loss + jnp.mean(jnp.square(diff)) + jnp.mean(jnp.abs(diff))
        return {"freq": loss}


@dataclasses.dataclass(frozen=True)
class MelGradLoss:
    """MelGradFunction (losses.py:86-118): memory-lean variant — same value
    as L1+MSE of log-mels, but gradient defined directly on the *linear* mel
    as (log_mel_g - log_mel_r)/numel. Slaney mel scale (librosa), norm
    configurable, magnitude (power-1) spectrogram."""
    sampling_rate: int
    clip_val: float = 1.0e-5
    n_mels_max: int = 80
    mel_norm: Optional[str] = None

    def __post_init__(self):
        transforms = []
        for i in range(5, 11):
            s = 2 ** i
            n_mels = int(min(
                self.n_mels_max,
                2 * mel_scale_htk(self.sampling_rate / 2)
                / mel_scale_htk(self.sampling_rate / s) - 1,
                s // 4))
            basis = M.mel_filterbank(self.sampling_rate, s, n_mels,
                                     norm=self.mel_norm, htk=False)
            transforms.append((s, s // 4, jnp.asarray(basis)))
        object.__setattr__(self, "transforms", tuple(transforms))

    def _mel(self, x: jnp.ndarray, n_fft: int, hop: int,
             basis: jnp.ndarray) -> jnp.ndarray:
        """CustomMelSpectrogram (losses.py:158-168): reflect-pad
        (n_fft-hop)/2, magnitude STFT, mel matmul."""
        mag = S.stft(x, n_fft, hop, n_fft, center=False, magnitude=True)
        return jnp.einsum("mf,bfl->bml", basis.astype(mag.dtype), mag)

    def __call__(self, wav_g: jnp.ndarray, wav_r: jnp.ndarray) -> LossOutput:
        loss = jnp.zeros((), jnp.float32)
        for (n_fft, hop, basis) in self.transforms:

            @jax.custom_vjp
            def term(mel_g, mel_r):
                lg = jnp.log(jnp.maximum(mel_g, self.clip_val))
                lr = jnp.log(jnp.maximum(mel_r, self.clip_val))
                return jnp.mean(jnp.abs(lg - lr)) + jnp.mean(
                    jnp.square(lg - lr))

            def term_fwd(mel_g, mel_r):
                lg = jnp.log(jnp.maximum(mel_g, self.clip_val))
                lr = jnp.log(jnp.maximum(mel_r, self.clip_val))
                val = jnp.mean(jnp.abs(lg - lr)) + jnp.mean(
                    jnp.square(lg - lr))
                grad = (lg - lr) / lg.size
                return val, grad

            def term_bwd(grad, g):
                return (grad * g, None)

            term.defvjp(term_fwd, term_bwd)
            mel_g = self._mel(wav_g, n_fft, hop, basis)
            mel_r = jax.lax.stop_gradient(
                self._mel(wav_r, n_fft, hop, basis))
            loss = loss + term(mel_g, mel_r)
        return {"freq": loss}


@dataclasses.dataclass(frozen=True)
class HifiGANMelLoss:
    """Single-resolution L1 log-mel loss (losses.py:125-155)."""
    sampling_rate: int
    clip_val: float
    n_fft: int
    num_mels: int
    hop_size: int
    win_size: int
    fmin: float = 0.0
    fmax: Optional[float] = None

    def __post_init__(self):
        basis = M.mel_filterbank(self.sampling_rate, self.n_fft,
                                 self.num_mels, self.fmin, self.fmax,
                                 norm="slaney", htk=False)
        object.__setattr__(self, "basis", jnp.asarray(basis))

    def _logmel(self, x: jnp.ndarray) -> jnp.ndarray:
        mag = S.stft(x, self.n_fft, self.hop_size, self.win_size,
                     center=False, magnitude=True)
        mel = jnp.einsum("mf,bfl->bml", self.basis.astype(mag.dtype), mag)
        return jnp.log(jnp.maximum(mel, self.clip_val))

    def __call__(self, wav_g: jnp.ndarray, wav_r: jnp.ndarray) -> LossOutput:
        return {"freq": jnp.mean(jnp.abs(self._logmel(wav_g)
                                         - self._logmel(wav_r)))}


# ---------------------------------------------------------------------------
# adversarial losses (losses.py:171-234)
#
# `normalize` pins a deliberate divergence between the reference's two
# losses.py copies: the hilcodec copy divides by the number of logit/fmap
# tensors (models/hilcodec/losses.py:180,189,222), while the avocodo copy
# ships with those divisions commented out — plain sums — so the paper's
# weights (freq 45, fm 2, ...) apply to unnormalized totals
# (models/avocodo/losses.py:91,100,133 `#/ n_logits`). The avocodo trainer
# passes normalize=False.
# ---------------------------------------------------------------------------

def discriminator_loss(logits_g: DiscOutput, logits_r: DiscOutput,
                       normalize: bool = True) -> jnp.ndarray:
    """Hinge loss over all logit tensors (mean if normalize, else sum)."""
    loss = jnp.zeros((), jnp.float32)
    n = 0
    for name in logits_g:
        for lg, lr in zip(logits_g[name], logits_r[name]):
            loss = loss + jnp.mean(jax.nn.relu(1.0 - lr)) \
                + jnp.mean(jax.nn.relu(1.0 + lg))
            n += 1
    return loss / n if normalize else loss


def discriminator_loss_lsgan(logits_g: DiscOutput, logits_r: DiscOutput,
                             normalize: bool = True) -> jnp.ndarray:
    loss = jnp.zeros((), jnp.float32)
    n = 0
    for name in logits_g:
        for lg, lr in zip(logits_g[name], logits_r[name]):
            loss = loss + jnp.mean(jnp.square(1.0 - lr)) \
                + jnp.mean(jnp.square(lg))
            n += 1
    return loss / n if normalize else loss


def generator_loss(logits: DiscOutput,
                   normalize: bool = True) -> LossOutput:
    out: LossOutput = {}
    for name, lgs in logits.items():
        loss = jnp.zeros((), jnp.float32)
        for lg in lgs:
            loss = loss + jnp.mean(jax.nn.relu(1.0 - lg))
        out[f"{name}_g"] = loss / len(lgs) if normalize else loss
    return out


def generator_loss_lsgan(logits: DiscOutput,
                         normalize: bool = True) -> LossOutput:
    out: LossOutput = {}
    for name, lgs in logits.items():
        loss = jnp.zeros((), jnp.float32)
        for lg in lgs:
            loss = loss + jnp.mean(jnp.square(1.0 - lg))
        out[f"{name}_g"] = loss / len(lgs) if normalize else loss
    return out


def feature_loss(fmaps_g: DiscOutput, fmaps_r: DiscOutput,
                 normalize: bool = True) -> LossOutput:
    out: LossOutput = {}
    for name in fmaps_g:
        loss = jnp.zeros((), jnp.float32)
        for g, r in zip(fmaps_g[name], fmaps_r[name]):
            r = jax.lax.stop_gradient(r)
            loss = loss + jnp.mean(jnp.abs(g - r))
        out[f"{name}_fm"] = loss / len(fmaps_g[name]) if normalize else loss
    return out


def feature_loss_normalized(fmaps_g: DiscOutput, fmaps_r: DiscOutput,
                            normalize: bool = True) -> LossOutput:
    """L1 feature matching normalized by the real activations' mean |.|
    (losses.py:226-234)."""
    out: LossOutput = {}
    for name in fmaps_g:
        loss = jnp.zeros((), jnp.float32)
        for g, r in zip(fmaps_g[name], fmaps_r[name]):
            r = jax.lax.stop_gradient(r)
            denom = jnp.maximum(jnp.mean(jnp.abs(r)), 1e-12)
            loss = loss + jnp.mean(jnp.abs(g - r)) / denom
        out[f"{name}_fm"] = loss / len(fmaps_g[name]) if normalize else loss
    return out
