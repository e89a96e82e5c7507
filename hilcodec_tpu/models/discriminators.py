"""GAN discriminator suite: MFBD, MSTFTD, MPD, MSD, SBD.

Reference: models/hilcodec/discriminators.py and models/hilcodec/avocodo.py.
All discriminators are train-only (no streaming mode): plain functional
modules returning (logits_list, fmap_list), aggregated by `Discriminators`
into the `{name: [tensors]}` dicts the losses/balancer consume.

Initialization matches torch's default conv init (kaiming_uniform with
a=sqrt(5) + uniform bias), since the reference leaves its explicit init
lines commented out (discriminators.py:206-215).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv as C
from ..ops import pqmf as P
from ..ops import reparam as R
from ..ops import stft as S

Params = Dict[str, Any]
LRELU_SLOPE = 0.1

# FilterBankDiscriminator execution: "conv2d" (default, the reference
# shape) or "bands1d" (fold the kh=1 `period` axis into batch and run the
# stack as conv1d — identical math, prepared for an on-chip train-step A/B;
# `train.fbd_lowering: bands1d` selects it from configs via build_trainer).
_FBD_LOWERING = "conv2d"


def set_fbd_lowering(mode: str) -> None:
    """Select the FilterBank disc lowering for later traces."""
    global _FBD_LOWERING
    if mode not in ("conv2d", "bands1d"):
        raise ValueError(f"unknown fbd lowering {mode!r}")
    _FBD_LOWERING = mode


def _lrelu(x, slope=LRELU_SLOPE):
    return jax.nn.leaky_relu(x, slope)


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size - 1) * dilation // 2


def torch_default_conv_init(key: jax.Array, shape: Tuple[int, ...],
                            with_bias: bool = True
                            ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """torch Conv{1,2}d default: kaiming_uniform(a=sqrt(5)) + uniform bias."""
    fan_in = int(np.prod(shape[1:]))
    k_w, k_b = jax.random.split(key)
    bound = math.sqrt(1.0 / fan_in)
    w = jax.random.uniform(k_w, shape, jnp.float32, -bound, bound)
    b = None
    if with_bias:
        b = jax.random.uniform(k_b, (shape[0],), jnp.float32, -bound, bound)
    return w, b


def _init_conv(key: jax.Array, shape: Tuple[int, ...], norm: str,
               with_bias: bool = True) -> Params:
    w, b = torch_default_conv_init(key, shape, with_bias)
    return R.init_reparam(w, norm, key=jax.random.fold_in(key, 7), bias=b)


def _weight(p: Params, norm: str) -> jnp.ndarray:
    return p["w"] if "w" in p else R.compute_weight(p, norm)


# ---------------------------------------------------------------------------
# STFT discriminator (discriminators.py:46-169)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class STFTDiscriminator:
    filters: int
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    max_filters: int = 1024
    filters_scale: int = 1
    kernel_size: Tuple[int, int] = (3, 9)
    dilations: Tuple[int, ...] = (1, 2, 4)
    stride: Tuple[int, int] = (1, 2)
    normalized: bool = True
    norm: str = R.WEIGHT_NORM
    magnitude: bool = False
    log_magnitude: bool = False
    eps: float = 1e-5
    activation_slope: float = 0.2

    def _layer_shapes(self) -> List[Tuple[Tuple[int, ...], Any, Any, Any]]:
        """[(wshape, stride, dilation, padding)] for each conv."""
        kh, kw = self.kernel_size
        spec_ch = 1 if self.magnitude else 2
        out: List = []
        out.append(((self.filters, spec_ch, kh, kw), (1, 1), (1, 1),
                    ((get_padding(kh), get_padding(kh)),
                     (get_padding(kw), get_padding(kw)))))
        in_chs = min(self.filters, self.max_filters)
        for i, d in enumerate(self.dilations):
            out_chs = min(self.filters_scale ** i * self.filters,
                          self.max_filters)
            out.append(((out_chs, in_chs, kh, kw), self.stride, (d, 1),
                        ((get_padding(kh, d), get_padding(kh, d)),
                         (get_padding(kw), get_padding(kw)))))
            in_chs = out_chs
        out_chs = min(self.filters_scale ** len(self.dilations) * self.filters,
                      self.max_filters)
        out.append(((out_chs, in_chs, kh, kh), (1, 1), (1, 1),
                    ((get_padding(kh), get_padding(kh)),
                     (get_padding(kh), get_padding(kh)))))
        # conv_post
        out.append(((1, out_chs, kh, kh), (1, 1), (1, 1),
                    ((get_padding(kh), get_padding(kh)),
                     (get_padding(kh), get_padding(kh)))))
        return out

    def init(self, key: jax.Array) -> Params:
        shapes = self._layer_shapes()
        keys = jax.random.split(key, len(shapes))
        return {"convs": [_init_conv(k, s[0], self.norm)
                          for k, s in zip(keys, shapes)]}

    def apply(self, params: Params, x: jnp.ndarray
              ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """x: [B, 1, T] -> (logits [B,1,H,W], fmaps). Complex STFT input
        laid out [B, 2, Time, Freq] (discriminators.py:126-128)."""
        # torchaudio Spectrogram(center=False, pad_mode=None): frames start
        # at 0 with no padding (discriminators.py:89-92).
        spec = _stft_nopad(x, self.n_fft, self.hop_length, self.win_length)
        if self.normalized:
            n = np.arange(self.win_length)
            win = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / self.win_length)
            spec = spec / math.sqrt(float((win ** 2).sum()))
        if self.magnitude:
            z = jnp.sqrt(spec[..., 0] ** 2 + spec[..., 1] ** 2)
            z = z.swapaxes(1, 2)[:, None]               # [B, 1, Time, Freq]
            if self.log_magnitude:
                z = jnp.log(z + self.eps)
        else:
            z = spec.transpose(0, 3, 2, 1)              # [B, 2, Time, Freq]
        fmap = []
        shapes = self._layer_shapes()
        for i, (p, (shape, stride, dil, pad)) in enumerate(
                zip(params["convs"], shapes)):
            z = C.conv2d(z, _weight(p, self.norm), p.get("b"), stride, dil,
                         pad)
            if i < len(shapes) - 1:     # all but conv_post get act + fmap
                z = _lrelu(z, self.activation_slope)
                fmap.append(z)
        return z, fmap


def _stft_nopad(x: jnp.ndarray, n_fft: int, hop: int,
                win: int) -> jnp.ndarray:
    """torchaudio Spectrogram(center=False, pad=0, power=None):
    un-padded framed rfft -> [B, F, L, 2]."""
    if x.ndim == 3:
        x = x.squeeze(1)
    window = S.hann_window(win)
    if win < n_fft:
        window = jnp.pad(window, ((n_fft - win) // 2,
                                  (n_fft - win + 1) // 2))
    frames = S.frame(x, n_fft, hop) * window.astype(x.dtype)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    out = jnp.stack([spec.real, spec.imag], axis=-1)    # [B, L, F, 2]
    return out.astype(x.dtype).swapaxes(1, 2)           # [B, F, L, 2]


@dataclasses.dataclass(frozen=True)
class MultiSTFTDiscriminator:
    filters: int
    n_ffts: Tuple[int, ...] = (1024, 2048, 512, 256, 128)
    hop_lengths: Tuple[int, ...] = (256, 512, 128, 64, 32)
    win_lengths: Tuple[int, ...] = (1024, 2048, 512, 256, 128)
    filters_scale: int = 1
    magnitude: bool = False
    log_magnitude: bool = False   # only applies to the magnitude branch
    eps: float = 1e-5             # (discriminators.py:124-125)
    norm: str = R.WEIGHT_NORM

    def __post_init__(self):
        discs = tuple(
            STFTDiscriminator(self.filters, n_fft=n, hop_length=h,
                              win_length=w, filters_scale=self.filters_scale,
                              magnitude=self.magnitude,
                              log_magnitude=self.log_magnitude,
                              eps=self.eps, norm=self.norm)
            for n, h, w in zip(self.n_ffts, self.hop_lengths,
                               self.win_lengths))
        object.__setattr__(self, "discs", discs)

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.discs))
        return {"discs": [d.init(k) for d, k in zip(self.discs, keys)]}

    def apply(self, params: Params, x: jnp.ndarray):
        logits, fmaps = [], []
        for d, p in zip(self.discs, params["discs"]):
            lg, fm = d.apply(p, x)
            logits.append(lg)
            fmaps.extend(fm)
        return logits, fmaps


# ---------------------------------------------------------------------------
# Filter-bank discriminator (discriminators.py:172-265)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FilterBankDiscriminator:
    """period: PQMF bank size; see module-level set_fbd_lowering for the
    conv2d-vs-bands1d execution choice."""
    period: int
    taps: int = 0
    beta: float = 0.0
    cutoff_freq: float = 0.0
    kernel_sizes: Tuple[int, ...] = (5, 5, 5, 5, 5)
    strides: Tuple[int, ...] = (3, 3, 3, 3, 1)
    channels: Tuple[int, ...] = (32, 128, 512, 1024, 1024)
    norm: str = R.WEIGHT_NORM

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.channels) + 1)
        convs = []
        c_in = 1
        for k_i, (ch, k) in zip(keys, zip(self.channels, self.kernel_sizes)):
            convs.append(_init_conv(k_i, (ch, c_in, 1, k), self.norm))
            c_in = ch
        post = _init_conv(keys[-1], (1, c_in, 1, 3), self.norm)
        return {"convs": convs, "post": post}

    def apply(self, params: Params, x: jnp.ndarray):
        """x: [B, 1, T] -> PQMF subbands as 2-D image [B,1,period,T/period],
        (1,k) convs strided along time."""
        if self.period == 1:
            z = x[:, None]                          # [B, 1, 1, T]
        else:
            z = P.analysis(x, self.period, self.taps, self.cutoff_freq,
                           self.beta)[:, None]      # [B, 1, period, T']
        if _FBD_LOWERING == "bands1d":
            return self._apply_bands1d(params, z)
        fmap = []
        for p, k, s in zip(params["convs"], self.kernel_sizes, self.strides):
            z = C.conv2d(z, _weight(p, self.norm), p.get("b"), (1, s),
                         (1, 1), ((0, 0), (get_padding(k), get_padding(k))))
            z = _lrelu(z)
            fmap.append(z)
        z = C.conv2d(z, _weight(params["post"], self.norm),
                     params["post"].get("b"), (1, 1), (1, 1),
                     ((0, 0), (1, 1)))
        fmap.append(z)
        return z.reshape(z.shape[0], -1), fmap

    def _apply_bands1d(self, params: Params, z: jnp.ndarray):
        """Bands-in-batch lowering: every conv in this stack has kh=1, so
        the `period` axis never mixes — fold it into the batch and run the
        whole stack as conv1d ([B,1,H,W] -> [B*H,1,W]). Mathematically
        identical (parity-tested); prepared as an on-chip A/B because the
        MFBD dense convs dominate the train step's FLOPs and the 2-D form
        leaves H as a small awkward spatial dim (flops_analysis.py)."""
        B, _, H, W = z.shape

        def to4d(y):
            b, c, w = y.shape
            return y.reshape(B, H, c, w).transpose(0, 2, 1, 3)

        y = z.transpose(0, 2, 1, 3).reshape(B * H, 1, W)
        fmap = []
        for p, k, s in zip(params["convs"], self.kernel_sizes, self.strides):
            w = _weight(p, self.norm)
            y = C.conv1d(y, w[:, :, 0, :], p.get("b"), s,
                         padding=(get_padding(k), get_padding(k)))
            y = _lrelu(y)
            fmap.append(to4d(y))
        w = _weight(params["post"], self.norm)
        y = C.conv1d(y, w[:, :, 0, :], params["post"].get("b"), 1,
                     padding=(1, 1))
        z = to4d(y)
        fmap.append(z)
        return z.reshape(z.shape[0], -1), fmap


@dataclasses.dataclass(frozen=True)
class MultiFilterBankDiscriminator:
    periods: Tuple[int, ...] = (1, 2, 3, 5, 7, 11)
    taps: int = 256
    beta: float = 8.0
    cutoff_freqs: Tuple[float, ...] = (0, 0.253881, 0.170546, 0.103881,
                                       0.075310, 0.049338)
    kernel_sizes: Tuple[int, ...] = (5, 5, 5, 5, 5)
    strides: Tuple[int, ...] = (3, 3, 3, 3, 1)
    channels: Tuple[int, ...] = (32, 128, 512, 1024, 1024)
    norm: str = R.WEIGHT_NORM

    def __post_init__(self):
        discs = tuple(
            FilterBankDiscriminator(p, self.taps, self.beta, c,
                                    tuple(self.kernel_sizes),
                                    tuple(self.strides),
                                    tuple(self.channels), self.norm)
            for p, c in zip(self.periods, self.cutoff_freqs))
        object.__setattr__(self, "discs", discs)

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.discs))
        return {"discs": [d.init(k) for d, k in zip(self.discs, keys)]}

    def apply(self, params: Params, x: jnp.ndarray):
        logits, fmaps = [], []
        for d, p in zip(self.discs, params["discs"]):
            lg, fm = d.apply(p, x)
            logits.append(lg)
            fmaps.extend(fm)
        return logits, fmaps


# ---------------------------------------------------------------------------
# Multi-period discriminator (discriminators.py:268-331)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PeriodDiscriminator:
    period: int
    kernel_size: int = 5
    stride: int = 3
    norm: str = R.WEIGHT_NORM

    _CHANNELS = (32, 128, 512, 1024, 1024)

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, 6)
        convs = []
        c_in = 1
        for i, ch in enumerate(self._CHANNELS):
            s = self.stride if i < 4 else 1
            convs.append(_init_conv(
                keys[i], (ch, c_in, self.kernel_size, 1), self.norm))
            c_in = ch
        post = _init_conv(keys[5], (1, c_in, 3, 1), self.norm)
        return {"convs": convs, "post": post}

    def apply(self, params: Params, x: jnp.ndarray):
        B, c, t = x.shape
        if t % self.period:
            pad = self.period - t % self.period
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect")
            t += pad
        z = x.reshape(B, c, t // self.period, self.period)
        fmap = []
        for i, p in enumerate(params["convs"]):
            s = self.stride if i < 4 else 1
            pad_h = get_padding(5, 1) if i < 4 else 2
            z = C.conv2d(z, _weight(p, self.norm), p.get("b"), (s, 1),
                         (1, 1), ((pad_h, pad_h), (0, 0)))
            z = _lrelu(z)
            fmap.append(z)
        z = C.conv2d(z, _weight(params["post"], self.norm),
                     params["post"].get("b"), (1, 1), (1, 1),
                     ((1, 1), (0, 0)))
        fmap.append(z)
        return z.reshape(B, -1), fmap


@dataclasses.dataclass(frozen=True)
class MultiPeriodDiscriminator:
    kernel_size: int = 5
    stride: int = 3
    norm: str = R.WEIGHT_NORM
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)

    def __post_init__(self):
        object.__setattr__(self, "discs", tuple(
            PeriodDiscriminator(p, self.kernel_size, self.stride, self.norm)
            for p in self.periods))

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.discs))
        return {"discs": [d.init(k) for d, k in zip(self.discs, keys)]}

    def apply(self, params: Params, x: jnp.ndarray):
        logits, fmaps = [], []
        for d, p in zip(self.discs, params["discs"]):
            lg, fm = d.apply(p, x)
            logits.append(lg)
            fmaps.extend(fm)
        return logits, fmaps


# ---------------------------------------------------------------------------
# Multi-scale discriminator (discriminators.py:334-416)
# ---------------------------------------------------------------------------

_MSD_SPECS = (
    # (cout, k, s, groups, pad)
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
)


@dataclasses.dataclass(frozen=True)
class ScaleDiscriminator:
    norm: str = R.WEIGHT_NORM

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(_MSD_SPECS) + 1)
        convs = []
        c_in = 1
        for k_i, (ch, k, s, g, _p) in zip(keys, _MSD_SPECS):
            convs.append(_init_conv(k_i, (ch, c_in // g, k), self.norm))
            c_in = ch
        post = _init_conv(keys[-1], (1, c_in, 3), self.norm)
        return {"convs": convs, "post": post}

    def apply(self, params: Params, x: jnp.ndarray):
        fmap = []
        z = x
        for p, (ch, k, s, g, pad) in zip(params["convs"], _MSD_SPECS):
            z = C.conv1d(z, _weight(p, self.norm), p.get("b"), stride=s,
                         groups=g, padding=(pad, pad))
            z = _lrelu(z)
            fmap.append(z)
        z = C.conv1d(z, _weight(params["post"], self.norm),
                     params["post"].get("b"), padding=(1, 1))
        fmap.append(z)
        return z.reshape(z.shape[0], -1), fmap


def _avg_pool1d(x: jnp.ndarray, kernel: int = 4, stride: int = 2,
                pad: int = 1) -> jnp.ndarray:
    """torch AvgPool1d(4, 2, padding=1) semantics (count includes pads)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    y = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, (1, 1, kernel), (1, 1, stride),
        "VALID")
    return y / kernel


@dataclasses.dataclass(frozen=True)
class MultiScaleDiscriminator:
    norm: Optional[str] = None
    use_pqmf: bool = False

    def __post_init__(self):
        norms = ([R.SPECTRAL_NORM, R.WEIGHT_NORM, R.WEIGHT_NORM]
                 if self.norm is None else [self.norm] * 3)
        object.__setattr__(self, "discs",
                           tuple(ScaleDiscriminator(n) for n in norms))

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, 3)
        return {"discs": [d.init(k) for d, k in zip(self.discs, keys)]}

    def _pool(self, x: jnp.ndarray, idx: int) -> jnp.ndarray:
        if idx == 0:
            return x
        if self.use_pqmf:
            sub = 2 ** idx
            cutoff = 0.25 / (2 ** (idx - 1))
            return P.analysis(x, sub, 256, cutoff, 8.0)[:, :1]
        y = _avg_pool1d(x)
        if idx == 2:
            y = _avg_pool1d(y)
        return y

    def apply(self, params: Params, x: jnp.ndarray):
        logits, fmaps = [], []
        for i, (d, p) in enumerate(zip(self.discs, params["discs"])):
            lg, fm = d.apply(p, self._pool(x, i))
            logits.append(lg)
            fmaps.extend(fm)
        return logits, fmaps


# ---------------------------------------------------------------------------
# Sub-band discriminator (avocodo.py:17-171)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MDC:
    """Multi-dilation conv block: parallel dilated convs summed, then a
    strided post conv (avocodo.py:17-61). NB the reference pads the post
    conv with the *last* dilated conv's padding — reproduced exactly."""
    in_channels: int
    out_channels: int
    strides: int
    kernel_size: Tuple[int, ...]
    dilations: Tuple[int, ...]
    norm: str = R.WEIGHT_NORM

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.kernel_size) + 1)
        convs = [_init_conv(k_i, (self.out_channels, self.in_channels, k),
                            self.norm)
                 for k_i, k in zip(keys, self.kernel_size)]
        post = _init_conv(keys[-1], (self.out_channels, self.out_channels, 3),
                          self.norm)
        return {"convs": convs, "post": post}

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        out = None
        for p, k, d in zip(params["convs"], self.kernel_size,
                           self.dilations):
            pad = get_padding(k, d)
            y = C.conv1d(x, _weight(p, self.norm), p.get("b"), dilation=d,
                         padding=(pad, pad))
            y = _lrelu(y, 0.2)
            out = y if out is None else out + y
        pad = get_padding(self.kernel_size[-1], self.dilations[-1])
        y = C.conv1d(out, _weight(params["post"], self.norm),
                     params["post"].get("b"), stride=self.strides,
                     padding=(pad, pad))
        return _lrelu(y, 0.2)


@dataclasses.dataclass(frozen=True)
class SBDBlock:
    segment_dim: int
    strides: Tuple[int, ...]
    filters: Tuple[int, ...]
    kernel_size: Tuple[Tuple[int, ...], ...]
    dilations: Tuple[Tuple[int, ...], ...]
    norm: str = R.WEIGHT_NORM

    def __post_init__(self):
        mdcs = []
        c_in = self.segment_dim
        for s, f, k, d in zip(self.strides, self.filters, self.kernel_size,
                              self.dilations):
            mdcs.append(MDC(c_in, f, s, tuple(k), tuple(d), self.norm))
            c_in = f
        object.__setattr__(self, "mdcs", tuple(mdcs))

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.mdcs) + 1)
        return {"mdcs": [m.init(k) for m, k in zip(self.mdcs, keys)],
                "post": _init_conv(keys[-1], (1, self.filters[-1], 3),
                                   self.norm)}

    def apply(self, params: Params, x: jnp.ndarray):
        fmap = []
        for m, p in zip(self.mdcs, params["mdcs"]):
            x = m.apply(p, x)
            fmap.append(x)
        x = C.conv1d(x, _weight(params["post"], self.norm),
                     params["post"].get("b"), padding=(1, 1))
        return x, fmap


@dataclasses.dataclass(frozen=True)
class SBD:
    """Sub-band discriminator over PQMF bands; optional transposed variant
    over time-bands of a finer PQMF (avocodo.py:113-171)."""
    channels: Tuple[Tuple[int, ...], ...]
    strides: Tuple[Tuple[int, ...], ...]
    kernel_sizes: Tuple[Tuple[Tuple[int, ...], ...], ...]
    dilations: Tuple[Tuple[Tuple[int, ...], ...], ...]
    band_ranges: Tuple[Tuple[int, int], ...]
    transpose: Tuple[bool, ...]
    pqmf_kwargs: Dict[str, Any]
    f_pqmf_kwargs: Optional[Dict[str, Any]] = None
    segment_size: Optional[int] = None
    norm: str = R.WEIGHT_NORM
    # hilcodec's SBD uses the orthonormal functional PQMF (x sqrt(subbands),
    # models/hilcodec/avocodo.py:10 imports functional.PQMF); avocodo's SBD
    # copy uses the unscaled ParallelWaveGAN bank (SBD.py:8, avocodo/pqmf.py)
    pqmf_orthonormal: bool = True

    def __post_init__(self):
        blocks = []
        for c, k, d, s, br, tr in zip(self.channels, self.kernel_sizes,
                                      self.dilations, self.strides,
                                      self.band_ranges, self.transpose):
            if tr:
                seg = self.segment_size // br[1] - br[0]
            else:
                seg = br[1] - br[0]
            blocks.append(SBDBlock(seg, tuple(s), tuple(c),
                                   tuple(tuple(x) for x in k),
                                   tuple(tuple(x) for x in d), self.norm))
        object.__setattr__(self, "blocks", tuple(blocks))

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.blocks))
        return {"blocks": [b.init(k) for b, k in zip(self.blocks, keys)]}

    def _pqmf(self, x, kwargs):
        return P.analysis(x, kwargs.get("subbands", 4),
                          kwargs.get("taps", 62),
                          kwargs.get("cutoff_freq",
                                     kwargs.get("cutoff_ratio", 0.142)),
                          kwargs.get("beta", 9.0),
                          orthonormal=self.pqmf_orthonormal)

    def apply(self, params: Params, x: jnp.ndarray):
        logits, fmaps = [], []
        y_in = self._pqmf(x, self.pqmf_kwargs)
        y_in_f = None
        for b, p, br, tr in zip(self.blocks, params["blocks"],
                                self.band_ranges, self.transpose):
            if tr:
                if y_in_f is None:
                    y_in_f = self._pqmf(x, self.f_pqmf_kwargs or {})
                z = y_in_f[:, br[0]:br[1], :].swapaxes(1, 2)
            else:
                z = y_in[:, br[0]:br[1], :]
            lg, fm = b.apply(p, z)
            logits.append(lg)
            fmaps.extend(fm)
        return logits, fmaps


# ---------------------------------------------------------------------------
# aggregator (discriminators.py:419-450)
# ---------------------------------------------------------------------------

def _clean(kwargs: Dict[str, Any]) -> Dict[str, Any]:
    kw = {k: v for k, v in kwargs.items() if k != "use"}
    # YAML lists -> tuples for hashable dataclass configs
    def tup(v):
        if isinstance(v, list):
            return tuple(tup(x) for x in v)
        return v
    return {k: tup(v) for k, v in kw.items()}


@dataclasses.dataclass(frozen=True)
class Discriminators:
    """ModuleDict-style gate by `use:` flags; members keyed mfbd / mpd /
    msd / mstftd / sbd."""
    mfbd_kwargs: Optional[Dict[str, Any]] = None
    mpd_kwargs: Optional[Dict[str, Any]] = None
    msd_kwargs: Optional[Dict[str, Any]] = None
    mstftd_kwargs: Optional[Dict[str, Any]] = None
    sbd_kwargs: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        discs = {}
        for name, kw, cls in (
                ("mfbd", self.mfbd_kwargs, MultiFilterBankDiscriminator),
                ("mpd", self.mpd_kwargs, MultiPeriodDiscriminator),
                ("msd", self.msd_kwargs, MultiScaleDiscriminator),
                ("mstftd", self.mstftd_kwargs, MultiSTFTDiscriminator),
                ("sbd", self.sbd_kwargs, SBD)):
            if kw and kw.get("use", False):
                discs[name] = cls(**_clean(kw))
        object.__setattr__(self, "discs", discs)

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, max(len(self.discs), 1))
        return {name: d.init(k)
                for (name, d), k in zip(self.discs.items(), keys)}

    def apply(self, params: Params, x: jnp.ndarray
              ) -> Tuple[Dict[str, List[jnp.ndarray]],
                         Dict[str, List[jnp.ndarray]]]:
        logits, fmaps = {}, {}
        for name, d in self.discs.items():
            lg, fm = d.apply(params[name], x)
            logits[name] = lg
            fmaps[name] = fm
        return logits, fmaps
