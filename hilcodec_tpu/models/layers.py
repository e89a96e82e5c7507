"""Codec building blocks: one layer spec -> batched `apply` + streaming `step`.

The reference maintains two diverged module trees per model family (training
`modules/seanet.py` vs deployment `streaming.py`, linked by a manual
state-dict remap notebook). Here each block is a single config object whose
`apply(params, x)` (full-sequence, training) and `step(params, cache, x)`
(O(1)-state streaming) share the same parameter pytree, so streaming
equivalence is a property test instead of a port.

Conventions:
  * activations [B, C, T]; parameters are nested dicts of f32 leaves.
  * `init(key) -> params`, `init_cache(batch, dtype) -> [arrays...]` (flat
    list, reference cache order), `step` consumes/returns that list slice.
  * inference-time "folding" (remove_weight_norm + merge_scaling of
    streaming.py:240-344) is `fold_params`: params keyed `{v,g}` become
    `{w}`, and scale/normalization constants are absorbed into conv weights.
    `apply`/`step` detect folded params by pytree structure (static under
    jit).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv as C
from ..ops import reparam as R
from ..ops import stft as S

Params = Dict[str, Any]
Cache = List[jnp.ndarray]


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

_ACTS = {
    "ELU": lambda x: jax.nn.elu(x),
    "ReLU": lambda x: jax.nn.relu(x),
    "LeakyReLU": lambda x: jax.nn.leaky_relu(x, 0.01),
    "GELU": lambda x: jax.nn.gelu(x),
    "SiLU": lambda x: jax.nn.silu(x),
    "Tanh": lambda x: jnp.tanh(x),
    "Identity": lambda x: x,
}


def activation(name: str, params: Optional[dict] = None):
    if name == "LeakyReLU" and params and "negative_slope" in params:
        slope = params["negative_slope"]
        return lambda x: jax.nn.leaky_relu(x, slope)
    if name == "ELU" and params and params.get("alpha", 1.0) != 1.0:
        alpha = params["alpha"]
        return lambda x: jnp.where(x > 0, x, alpha * jnp.expm1(x))
    return _ACTS[name]


def kaiming_normal(key: jax.Array, shape: Tuple[int, ...], fan_in: int,
                   nonlinearity: str = "linear") -> jnp.ndarray:
    """torch.nn.init.kaiming_normal_ (mode=fan_in)."""
    gain = math.sqrt(2.0) if nonlinearity == "relu" else 1.0
    std = gain / math.sqrt(fan_in)
    return jax.random.normal(key, shape, jnp.float32) * std


# ---------------------------------------------------------------------------
# Conv / ConvTranspose layers
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Conv1d:
    """Causal (or plain) conv1d with selectable weight reparameterization.

    Mirrors SConv1d (models/hilcodec/modules/conv.py:202-236): causal
    left-pad (k-1)d-(s-1) + right pad to a full final window; kaiming init,
    zero bias init.
    """
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    norm: str = R.WEIGHT_NORM
    causal: bool = True
    nonlinearity: str = "linear"
    pad_mode: str = "constant"   # 'reflect' = EnCodec-family default

    def init(self, key: jax.Array) -> Params:
        k_w, k_u = jax.random.split(key)
        fan_in = self.in_channels // self.groups * self.kernel_size
        w = kaiming_normal(k_w, (self.out_channels,
                                 self.in_channels // self.groups,
                                 self.kernel_size), fan_in, self.nonlinearity)
        b = jnp.zeros((self.out_channels,), jnp.float32) if self.bias else None
        return R.init_reparam(w, self.norm, key=k_u, bias=b)

    def weight(self, params: Params) -> jnp.ndarray:
        if "w" in params:
            return params["w"]
        return R.compute_weight(params, self.norm)

    @property
    def cache_len(self) -> int:
        if self.kernel_size == 1:
            return 0
        return C.causal_conv1d_cache_len(self.kernel_size, self.stride,
                                         self.dilation)

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        w = self.weight(params)
        b = params.get("b")
        if self.causal and self.kernel_size > 1:
            return C.causal_conv1d(x, w, b, self.stride, self.dilation,
                                   self.groups, pad_mode=self.pad_mode)
        return C.conv1d(x, w, b, self.stride, self.dilation, self.groups)

    def apply_nopad(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Valid conv, no padding — for layers whose history arrives in-band
        (e.g. conv_pre consuming the shared wav ring cache)."""
        return C.conv1d(x, self.weight(params), params.get("b"),
                        self.stride, self.dilation, self.groups)

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        if self.cache_len == 0:
            return []
        return [jnp.zeros((batch, self.in_channels, self.cache_len), dtype)]

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        w = self.weight(params)
        b = params.get("b")
        if self.cache_len == 0:
            return C.conv1d(x, w, b, self.stride, self.dilation,
                            self.groups), []
        y, new = C.causal_conv1d_step(x, cache[0], w, b, self.stride,
                                      self.dilation, self.groups)
        return y, [new]

    def fold(self, params: Params) -> Params:
        return R.fold(params, self.norm)


@dataclasses.dataclass(frozen=True)
class ConvTranspose1d:
    """Causal transposed conv (SConvTranspose1d, trim_right_ratio=1)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    norm: str = R.WEIGHT_NORM
    nonlinearity: str = "linear"

    def init(self, key: jax.Array) -> Params:
        k_w, k_u = jax.random.split(key)
        # torch ConvTranspose1d weight: [in, out/groups, k]; fan_in per
        # torch._calculate_fan_in_and_fan_out = (out/groups) * k
        fan_in = self.out_channels // self.groups * self.kernel_size
        w = kaiming_normal(k_w, (self.in_channels,
                                 self.out_channels // self.groups,
                                 self.kernel_size), fan_in, self.nonlinearity)
        b = jnp.zeros((self.out_channels,), jnp.float32) if self.bias else None
        return R.init_reparam(w, self.norm, key=k_u, bias=b)

    def weight(self, params: Params) -> jnp.ndarray:
        if "w" in params:
            return params["w"]
        return R.compute_weight(params, self.norm)

    @property
    def cache_len(self) -> int:
        return C.causal_conv_transpose1d_cache_len(
            self.kernel_size, self.stride, self.dilation)

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return C.causal_conv_transpose1d(
            x, self.weight(params), params.get("b"), self.stride,
            self.dilation, self.groups)

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        return [jnp.zeros((batch, self.in_channels, self.cache_len), dtype)]

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        y, new = C.causal_conv_transpose1d_step(
            x, cache[0], self.weight(params), params.get("b"), self.stride,
            self.dilation, self.groups)
        return y, [new]

    def fold(self, params: Params) -> Params:
        return R.fold(params, self.norm)


# ---------------------------------------------------------------------------
# DWS block: act -> pointwise 1x1 -> (act) -> depthwise k (or transposed)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DWSBlock:
    """Depthwise-separable unit (seanet.py:26-52 dws_conv_block)."""
    act: str
    act_params: Optional[dict]
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    norm: str = R.WEIGHT_NORM
    act_all: bool = False
    transposed: bool = False
    expansion: int = 1
    groups: int = -1
    bias: bool = True

    def __post_init__(self):
        g = self.groups
        if g == -1:
            g = self.out_channels // self.expansion
        object.__setattr__(self, "_g", g)
        object.__setattr__(self, "_act", activation(self.act, self.act_params))
        pw = Conv1d(self.in_channels, self.out_channels, 1,
                    bias=self.bias if self.act_all else False, norm=self.norm,
                    nonlinearity="relu")
        if self.transposed:
            dw = ConvTranspose1d(self.out_channels, self.out_channels,
                                 self.kernel_size, self.stride, self.dilation,
                                 groups=g, norm=self.norm, bias=self.bias,
                                 nonlinearity="relu" if self.act_all else "linear")
        else:
            dw = Conv1d(self.out_channels, self.out_channels,
                        self.kernel_size, self.stride, self.dilation,
                        groups=g, norm=self.norm, bias=self.bias,
                        nonlinearity="relu" if self.act_all else "linear")
        object.__setattr__(self, "pointwise", pw)
        object.__setattr__(self, "depthwise", dw)

    def init(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        return {"pointwise": self.pointwise.init(k1),
                "depthwise": self.depthwise.init(k2)}

    def _pw(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x = self._act(x)
        x = self.pointwise.apply(params["pointwise"], x)
        if self.act_all:
            x = self._act(x)
        return x

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return self.depthwise.apply(params["depthwise"],
                                    self._pw(params, x))

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        return self.depthwise.init_cache(batch, dtype)

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        return self.depthwise.step(params["depthwise"], cache,
                                   self._pw(params, x))

    def fold(self, params: Params) -> Params:
        return {"pointwise": self.pointwise.fold(params["pointwise"]),
                "depthwise": self.depthwise.fold(params["depthwise"])}


# ---------------------------------------------------------------------------
# Residual block
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ResBlock:
    """Variance-constrained residual unit (seanet.py:55-148).

    y = skip + res_scale * res_scale_param * block(x * pre_scale)
    with pre_scale = (1 + idx * res_scale^2)^-1/2. Folding absorbs the
    residual scale into the last depthwise conv (streaming.py:240-250).
    """
    dim: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 1)
    activation: str = "ELU"
    activation_params: Optional[dict] = None
    norm: str = R.WEIGHT_NORM
    skip: str = "identity"
    act_all: bool = False
    expansion: int = 1
    groups: int = -1
    bias: bool = True
    res_scale: Optional[float] = None
    idx: int = 0
    zero_init: bool = True

    def __post_init__(self):
        blocks = tuple(
            DWSBlock(self.activation, self.activation_params, self.dim,
                     self.dim, self.kernel_size, dilation=d, norm=self.norm,
                     act_all=self.act_all, expansion=self.expansion,
                     groups=self.groups, bias=self.bias)
            for d in self.dilations)
        object.__setattr__(self, "blocks", blocks)
        pre = ((1 + self.idx * self.res_scale ** 2) ** -0.5
               if self.res_scale is not None else None)
        object.__setattr__(self, "pre_scale", pre)
        if self.skip == "1x1":
            object.__setattr__(self, "shortcut",
                               Conv1d(self.dim, self.dim, 1, norm=self.norm,
                                      bias=self.bias))
        else:
            object.__setattr__(self, "shortcut", None)

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.blocks) + 1)
        p: Params = {"blocks": [b.init(k) for b, k in zip(self.blocks, keys)]}
        if self.zero_init:
            p["res_scale_param"] = jnp.zeros((1,), jnp.float32)
        if self.skip == "1x1":
            p["shortcut"] = self.shortcut.init(keys[-1])
        elif self.skip == "scale":
            p["skip_scale"] = jnp.ones((1, 1, 1), jnp.float32)
        elif self.skip == "exp_scale":
            p["skip_scale"] = jnp.zeros((1, 1, 1), jnp.float32)
        elif self.skip == "channelwise_scale":
            p["skip_scale"] = jnp.ones((1, self.dim, 1), jnp.float32)
        return p

    def _shortcut(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        if self.skip == "identity":
            return x
        if self.skip == "1x1":
            return self.shortcut.apply(params["shortcut"], x)
        scale = params["skip_scale"].astype(x.dtype)
        if self.skip == "exp_scale":
            scale = jnp.exp(scale)
        return scale * x

    def _res_scale(self, params: Params, dtype) -> jnp.ndarray:
        scale = jnp.asarray(1.0 if self.res_scale is None else self.res_scale,
                            dtype)
        if "res_scale_param" in params:
            scale = scale * params["res_scale_param"].astype(dtype)[0]
        return scale

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        skip = self._shortcut(params, x)
        if self.pre_scale is not None:
            x = x * jnp.asarray(self.pre_scale, x.dtype)
        for blk, bp in zip(self.blocks, params["blocks"]):
            x = blk.apply(bp, x)
        folded = "res_scale_param" not in params and self.zero_init
        if not folded:
            x = x * self._res_scale(params, x.dtype)
        return x + skip

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        out: Cache = []
        for b in self.blocks:
            out.extend(b.init_cache(batch, dtype))
        return out

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        skip = self._shortcut(params, x)
        if self.pre_scale is not None:
            x = x * jnp.asarray(self.pre_scale, x.dtype)
        new_cache: Cache = []
        i = 0
        for blk, bp in zip(self.blocks, params["blocks"]):
            n = len(blk.init_cache(1))
            x, c = blk.step(bp, cache[i:i + n], x)
            new_cache.extend(c)
            i += n
        folded = "res_scale_param" not in params and self.zero_init
        if not folded:
            x = x * self._res_scale(params, x.dtype)
        return x + skip, new_cache

    def fold(self, params: Params) -> Params:
        """Absorb res_scale * res_scale_param into the last depthwise conv."""
        out: Params = {"blocks": [b.fold(p) for b, p in
                                  zip(self.blocks, params["blocks"])]}
        if self.skip == "1x1":
            out["shortcut"] = self.shortcut.fold(params["shortcut"])
        elif self.skip in ("scale", "exp_scale", "channelwise_scale"):
            out["skip_scale"] = params["skip_scale"]
        scale = 1.0 if self.res_scale is None else self.res_scale
        if "res_scale_param" in params:
            scale = scale * params["res_scale_param"][0]
            last = out["blocks"][-1]["depthwise"]
            last["w"] = last["w"] * scale
            if last.get("b") is not None:
                last["b"] = last["b"] * scale
        return out


# ---------------------------------------------------------------------------
# SpecBlock
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SpecBlock:
    """HILCodec's signature block: causal log-magnitude STFT of the raw wav,
    fixed normalization, 1x1 conv, zero-init scale, residual add
    (seanet.py:181-246 / streaming.py:304-365).

    In streaming mode the caller passes the wav suffix (shared ring cache);
    `step(params, x, wav_suffix)` where wav_suffix has n_fft-1+hop*L samples.
    """
    n_fft: int
    channels: int
    stride: int          # STFT hop
    norm: str = R.WEIGHT_NORM
    bias: bool = False
    learnable: bool = False
    compression: str = "log"
    mean: float = 0.0
    std: float = 1.0
    res_scale: Optional[float] = 1.0
    zero_init: bool = True
    inout_norm: bool = True

    def __post_init__(self):
        object.__setattr__(
            self, "layer",
            Conv1d(self.n_fft // 2 + 1, self.channels, 1, norm=self.norm,
                   bias=self.bias))

    @property
    def cache_len(self) -> int:
        return self.n_fft - 1

    def init(self, key: jax.Array) -> Params:
        p: Params = {"layer": self.layer.init(key)}
        if self.zero_init:
            p["scale_param"] = jnp.zeros((1,), jnp.float32)
        if self.learnable:
            p["basis"] = jnp.asarray(S.causal_stft_basis(self.n_fft))
        return p

    def _spec(self, params: Params, wav: jnp.ndarray,
              pad: bool) -> jnp.ndarray:
        if self.learnable:
            y = S.causal_stft_mag_learnable(wav, params["basis"], self.stride,
                                            pad=pad)
        else:
            y = S.causal_stft_mag(wav, self.n_fft, self.stride, pad=pad)
        if self.compression == "log":
            y = jnp.log(jnp.maximum(y, 1e-5))
        elif self.compression:
            c = float(self.compression)
            y = jnp.sign(y) * jnp.abs(y) ** c
        return y

    def _mix(self, params: Params, x: jnp.ndarray,
             y: jnp.ndarray) -> jnp.ndarray:
        folded = "scale_param" not in params and self.zero_init
        if self.inout_norm and not folded:
            y = (y - self.mean) / self.std
        y = self.layer.apply(params["layer"], y)
        if not folded:
            scale = jnp.asarray(
                1.0 if self.res_scale is None else self.res_scale, x.dtype)
            if "scale_param" in params:
                scale = scale * params["scale_param"].astype(x.dtype)[0]
            y = y * scale
        return x + y

    def apply(self, params: Params, x: jnp.ndarray,
              wav: jnp.ndarray) -> jnp.ndarray:
        return self._mix(params, x, self._spec(params, wav, pad=True))

    def step(self, params: Params, x: jnp.ndarray,
             wav_suffix: jnp.ndarray) -> jnp.ndarray:
        return self._mix(params, x, self._spec(params, wav_suffix, pad=False))

    def fold(self, params: Params) -> Params:
        """Fold mean/std normalization and the scale into the 1x1 conv
        (streaming.py:321-344)."""
        assert self.zero_init, "fold requires zero_init (streaming.py:684)"
        layer = self.layer.fold(params["layer"])
        w = layer["w"]
        b = layer.get("b")
        if b is None:
            b = jnp.zeros((w.shape[0],), jnp.float32)
        if self.inout_norm:
            b = b + jnp.sum(w, axis=(1, 2)) * (-self.mean / self.std)
            w = w / self.std
        scale = 1.0 if self.res_scale is None else self.res_scale
        if "scale_param" in params:
            scale = scale * params["scale_param"][0]
        out: Params = {"layer": {"w": w * scale, "b": b * scale}}
        if self.learnable:
            out["basis"] = params["basis"]
        return out


def l2norm(x: jnp.ndarray, channels: int, eps: float = 1e-12,
           inout_norm: bool = True) -> jnp.ndarray:
    """L2-normalize channel dim (seanet.py:151-162): matches
    F.normalize(x, dim=1, eps) * sqrt(C)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1,
                         keepdims=True))
    y = x.astype(jnp.float32) / jnp.maximum(n, eps)
    if inout_norm:
        y = y * math.sqrt(channels)
    return y.astype(x.dtype)
