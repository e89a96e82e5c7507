"""AudioDec model family (streaming benchmark codec, hop 300).

Reference: models/audiodec/streaming.py — CausalResidualUnit encoder stacks
(strides 3,4,5,5), RVQ (8 x 1024, dim 64), causal HiFiGAN decoder with the
grouped-conv MRF substitute `MultiGroupConv1d` (:297-387) and input
de-normalization stats (:554-566). The reference ships it streaming-only
(weights imported from the official repo); here every block has both
`apply` (batch) and `step` (reference cache order) like the other families.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import reparam as R
from . import layers as L

Params = Dict[str, Any]
Cache = List[jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class CausalResidualUnit:
    """x + pw(act(causal_conv_k(act(x)))) (streaming.py:150-180)."""
    channels: int
    kernel_size: int = 7
    dilation: int = 1
    bias: bool = False
    activation: str = "ELU"
    norm: str = R.NONE

    def __post_init__(self):
        object.__setattr__(self, "conv1",
                           L.Conv1d(self.channels, self.channels,
                                    self.kernel_size,
                                    dilation=self.dilation, bias=self.bias,
                                    norm=self.norm))
        object.__setattr__(self, "conv2",
                           L.Conv1d(self.channels, self.channels, 1,
                                    bias=self.bias, norm=self.norm))
        object.__setattr__(self, "_act", L.activation(self.activation, None))

    def init(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        return {"conv1": self.conv1.init(k1), "conv2": self.conv2.init(k2)}

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        y = self.conv1.apply(params["conv1"], self._act(x))
        y = self.conv2.apply(params["conv2"], self._act(y))
        return x + y

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        return self.conv1.init_cache(batch, dtype)

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        y, c = self.conv1.step(params["conv1"], cache, self._act(x))
        y = self.conv2.apply(params["conv2"], self._act(y))
        return x + y, c


@dataclasses.dataclass(frozen=True)
class AudioDecEncoder:
    """conv7 -> per stage [3 res units (d=1,3,9) + stride conv k=2s] ->
    projector conv3 (streaming.py:233-295)."""
    input_channels: int = 1
    encode_channels: int = 32
    channel_ratios: Tuple[int, ...] = (2, 4, 8, 16)
    strides: Tuple[int, ...] = (3, 4, 5, 5)
    kernel_size: int = 7
    bias: bool = True
    activation: str = "ELU"
    code_dim: int = 64
    norm: str = R.NONE

    def __post_init__(self):
        object.__setattr__(self, "hop_length", int(np.prod(self.strides)))
        conv_pre = L.Conv1d(self.input_channels, self.encode_channels,
                            self.kernel_size, bias=False, norm=self.norm)
        stages = []
        in_ch = self.encode_channels
        for ratio, stride in zip(self.channel_ratios, self.strides):
            out_ch = self.encode_channels * ratio
            units = tuple(CausalResidualUnit(in_ch, dilation=d,
                                             activation=self.activation,
                                             norm=self.norm)
                          for d in (1, 3, 9))
            down = L.Conv1d(in_ch, out_ch, 2 * stride, stride=stride,
                            bias=self.bias, norm=self.norm)
            stages.append((units, down))
            in_ch = out_ch
        projector = L.Conv1d(in_ch, self.code_dim, 3, bias=False,
                             norm=self.norm)
        object.__setattr__(self, "conv_pre", conv_pre)
        object.__setattr__(self, "stages", tuple(stages))
        object.__setattr__(self, "projector", projector)

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.stages) + 2)
        p: Params = {"conv_pre": self.conv_pre.init(keys[0]), "stages": []}
        for i, (units, down) in enumerate(self.stages):
            sk = jax.random.split(keys[1 + i], len(units) + 1)
            p["stages"].append({
                "units": [u.init(k) for u, k in zip(units, sk)],
                "down": down.init(sk[-1])})
        p["projector"] = self.projector.init(keys[-1])
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_pre.apply(params["conv_pre"], x)
        for (units, down), sp in zip(self.stages, params["stages"]):
            for u, up in zip(units, sp["units"]):
                x = u.apply(up, x)
            x = down.apply(sp["down"], x)
        return self.projector.apply(params["projector"], x)

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        out: Cache = []
        out.extend(self.conv_pre.init_cache(batch, dtype))
        for (units, down) in self.stages:
            for u in units:
                out.extend(u.init_cache(batch, dtype))
            out.extend(down.init_cache(batch, dtype))
        out.extend(self.projector.init_cache(batch, dtype))
        return out

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        new_cache: Cache = []
        i = 0

        def run(mod, p, x, i):
            n = len(mod.init_cache(1))
            y, c = mod.step(p, cache[i:i + n], x)
            new_cache.extend(c)
            return y, i + n

        x, i = run(self.conv_pre, params["conv_pre"], x, i)
        for (units, down), sp in zip(self.stages, params["stages"]):
            for u, up in zip(units, sp["units"]):
                x, i = run(u, up, x, i)
            x, i = run(down, sp["down"], x, i)
        x, i = run(self.projector, params["projector"], x, i)
        return x, new_cache


@dataclasses.dataclass(frozen=True)
class MultiGroupConv1d:
    """Grouped-conv substitute for HiFiGAN's MRF (streaming.py:297-387):
    input repeated `groups` x channel-wise, per dilation a grouped causal
    conv pair with residual, then a 1x1 merge back."""
    channels: int
    kernel_size: int = 11
    dilations: Tuple[int, ...] = (1, 3, 5)
    groups: int = 3
    bias: bool = True
    use_additional_convs: bool = True
    activation: str = "LeakyReLU"
    activation_params: Optional[dict] = None
    norm: str = R.WEIGHT_NORM

    def __post_init__(self):
        ch = self.channels * self.groups
        convs1, convs2 = [], []
        for d in self.dilations:
            convs1.append(L.Conv1d(ch, ch, self.kernel_size, dilation=d,
                                   groups=self.groups, bias=self.bias,
                                   norm=self.norm))
            if self.use_additional_convs:
                convs2.append(L.Conv1d(ch, ch, self.kernel_size, dilation=1,
                                       groups=self.groups, bias=self.bias,
                                       norm=self.norm))
        conv_out = L.Conv1d(ch, self.channels, 1, bias=False,
                            norm=self.norm)
        object.__setattr__(self, "convs1", tuple(convs1))
        object.__setattr__(self, "convs2", tuple(convs2))
        object.__setattr__(self, "conv_out", conv_out)
        object.__setattr__(self, "_act",
                           L.activation(self.activation,
                                        self.activation_params
                                        or {"negative_slope": 0.1}))

    def init(self, key: jax.Array) -> Params:
        n = len(self.convs1) + len(self.convs2) + 1
        keys = jax.random.split(key, n)
        p: Params = {"convs1": [c.init(k)
                                for c, k in zip(self.convs1, keys)],
                     "conv_out": self.conv_out.init(keys[-1])}
        if self.use_additional_convs:
            p["convs2"] = [c.init(k) for c, k in
                           zip(self.convs2, keys[len(self.convs1):])]
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.tile(x, (1, self.groups, 1))
        for li in range(len(self.convs1)):
            xt = self.convs1[li].apply(params["convs1"][li], self._act(x))
            if self.use_additional_convs:
                xt = self.convs2[li].apply(params["convs2"][li],
                                           self._act(xt))
            x = xt + x
        return self.conv_out.apply(params["conv_out"], x)

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        out: Cache = []
        for li in range(len(self.convs1)):
            out.extend(self.convs1[li].init_cache(batch, dtype))
            if self.use_additional_convs:
                out.extend(self.convs2[li].init_cache(batch, dtype))
        return out

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        new_cache: Cache = []
        x = jnp.tile(x, (1, self.groups, 1))
        i = 0
        for li in range(len(self.convs1)):
            xt, c = self.convs1[li].step(params["convs1"][li],
                                         cache[i:i + 1], self._act(x))
            new_cache.extend(c)
            i += 1
            if self.use_additional_convs:
                xt, c = self.convs2[li].step(params["convs2"][li],
                                             cache[i:i + 1], self._act(xt))
                new_cache.extend(c)
                i += 1
            x = xt + x
        return self.conv_out.apply(params["conv_out"], x), new_cache


@dataclasses.dataclass(frozen=True)
class AudioDecDecoder:
    """Causal HiFiGAN generator with grouped-conv blocks and input
    de-normalization stats (streaming.py:388-566)."""
    in_channels: int = 64
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Tuple[int, ...] = (5, 5, 4, 3)
    resblock_kernel_size: int = 11
    resblock_dilations: Tuple[int, ...] = (1, 3, 5)
    groups: int = 3
    bias: bool = True
    use_additional_convs: bool = True
    norm: str = R.WEIGHT_NORM
    use_stats: bool = True

    def __post_init__(self):
        input_conv = L.Conv1d(self.in_channels, self.channels,
                              self.kernel_size, norm=self.norm)
        ups, blocks = [], []
        for i, scale in enumerate(self.upsample_scales):
            ups.append(L.ConvTranspose1d(
                self.channels // (2 ** i), self.channels // (2 ** (i + 1)),
                2 * scale, stride=scale, norm=self.norm))
            blocks.append(MultiGroupConv1d(
                self.channels // (2 ** (i + 1)), self.resblock_kernel_size,
                tuple(self.resblock_dilations), self.groups, self.bias,
                self.use_additional_convs, norm=self.norm))
        output_conv = L.Conv1d(
            self.channels // (2 ** len(self.upsample_scales)),
            self.out_channels, self.kernel_size, norm=self.norm)
        object.__setattr__(self, "input_conv", input_conv)
        object.__setattr__(self, "ups", tuple(ups))
        object.__setattr__(self, "blocks", tuple(blocks))
        object.__setattr__(self, "output_conv", output_conv)
        object.__setattr__(self, "_act_up",
                           L.activation("LeakyReLU",
                                        {"negative_slope": 0.1}))
        object.__setattr__(self, "_act_out",
                           L.activation("LeakyReLU", None))  # slope 0.01

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, 2 * len(self.ups) + 3)
        p: Params = {"input_conv": self.input_conv.init(keys[0]),
                     "ups": [], "blocks": []}
        for i in range(len(self.ups)):
            p["ups"].append(self.ups[i].init(keys[1 + 2 * i]))
            p["blocks"].append(self.blocks[i].init(keys[2 + 2 * i]))
        p["output_conv"] = self.output_conv.init(keys[-1])
        if self.use_stats:
            p["mean"] = jnp.zeros((self.in_channels,), jnp.float32)
            p["scale"] = jnp.ones((self.in_channels,), jnp.float32)
        return p

    def _norm_in(self, params: Params, c: jnp.ndarray) -> jnp.ndarray:
        if self.use_stats and "mean" in params:
            c = (c - params["mean"].astype(c.dtype)[None, :, None]) \
                / params["scale"].astype(c.dtype)[None, :, None]
        return c

    def apply(self, params: Params, c: jnp.ndarray) -> jnp.ndarray:
        """c: [B, in_channels, T] (codes, channel-first)."""
        c = self._norm_in(params, c)
        c = self.input_conv.apply(params["input_conv"], c)
        for i in range(len(self.ups)):
            c = self.ups[i].apply(params["ups"][i], self._act_up(c))
            c = self.blocks[i].apply(params["blocks"][i], c)
        c = self.output_conv.apply(params["output_conv"], self._act_out(c))
        return jnp.tanh(c)

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        out: Cache = []
        out.extend(self.input_conv.init_cache(batch, dtype))
        for i in range(len(self.ups)):
            out.extend(self.ups[i].init_cache(batch, dtype))
            out.extend(self.blocks[i].init_cache(batch, dtype))
        out.extend(self.output_conv.init_cache(batch, dtype))
        return out

    def step(self, params: Params, cache: Cache, c: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        new_cache: Cache = []
        i = 0

        def run(mod, p, x, i, act=None):
            n = len(mod.init_cache(1))
            y, cc = mod.step(p, cache[i:i + n], act(x) if act else x)
            new_cache.extend(cc)
            return y, i + n

        c = self._norm_in(params, c)
        c, i = run(self.input_conv, params["input_conv"], c, i)
        for li in range(len(self.ups)):
            c, i = run(self.ups[li], params["ups"][li], c, i,
                       act=self._act_up)
            c, i = run(self.blocks[li], params["blocks"][li], c, i)
        c, i = run(self.output_conv, params["output_conv"], c, i,
                   act=self._act_out)
        return jnp.tanh(c), new_cache


@dataclasses.dataclass(frozen=True)
class AudioDec:
    """Full AudioDec generator (streaming.py:569-637), hop 300."""
    input_channels: int = 1
    encode_channels: int = 32
    enc_ratios: Tuple[int, ...] = (2, 4, 8, 16)
    enc_strides: Tuple[int, ...] = (3, 4, 5, 5)
    code_dim: int = 64
    codebook_num: int = 8
    codebook_size: int = 1024
    output_channels: int = 1
    decode_channels: int = 512
    dec_strides: Tuple[int, ...] = (5, 5, 4, 3)
    kernel_size: int = 7
    resblock_kernel_size: int = 11
    resblock_dilations: Tuple[int, ...] = (1, 3, 5)

    def __post_init__(self):
        enc = AudioDecEncoder(
            self.input_channels, self.encode_channels,
            tuple(self.enc_ratios), tuple(self.enc_strides),
            code_dim=self.code_dim)
        dec = AudioDecDecoder(
            self.code_dim, self.output_channels, self.decode_channels,
            self.kernel_size, tuple(self.dec_strides),
            self.resblock_kernel_size, tuple(self.resblock_dilations))
        object.__setattr__(self, "encoder", enc)
        object.__setattr__(self, "decoder", dec)
        object.__setattr__(self, "hop_length", enc.hop_length)

    def init(self, key: jax.Array) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        return {"encoder": self.encoder.init(k1),
                "decoder": self.decoder.init(k2),
                "codebooks": jax.random.normal(
                    k3, (self.codebook_num, self.codebook_size,
                         self.code_dim), jnp.float32)}

    def init_cache(self, batch: int, dtype=jnp.float32
                   ) -> Tuple[Cache, Cache]:
        return (self.encoder.init_cache(batch, dtype),
                self.decoder.init_cache(batch, dtype))

    def fold_params(self, params: Params) -> Params:
        """Deployment fold: remove weight_norm from the decoder convs
        (the encoder is norm-free; codebooks pass through)."""
        return R.fold_tree(params, R.WEIGHT_NORM)
