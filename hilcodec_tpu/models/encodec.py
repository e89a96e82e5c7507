"""EnCodec model family: SEANet + LSTM bottleneck + RVQ, and the streaming
transformer LM entropy model.

Reference: models/encodec/{models.py, modules/seanet.py, modules/lstm.py,
modules/transformer.py, streaming.py}. Same single-spec dual-mode design as
hilcodec.py: `apply` for training, `step` with the reference's flat cache
list (incl. LSTM (h, c) state pairs, streaming.py:262-299) for deployment.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import reparam as R
from . import layers as L

Params = Dict[str, Any]
Cache = List[jnp.ndarray]


# ---------------------------------------------------------------------------
# LSTM (modules/lstm.py SLSTM)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SLSTM:
    """Multi-layer LSTM over conv-layout [B, C, T] with residual skip.
    torch.nn.LSTM weight layout/equations; streaming carries (h, c) as two
    cache tensors (encodec/causal_layers.py:86-107)."""
    dimension: int
    num_layers: int = 2
    skip: bool = True

    def init(self, key: jax.Array) -> Params:
        H = self.dimension
        bound = 1.0 / math.sqrt(H)
        layers = []
        for i in range(self.num_layers):
            k = jax.random.fold_in(key, i)
            ks = jax.random.split(k, 4)
            layers.append({
                "w_ih": jax.random.uniform(ks[0], (4 * H, H), jnp.float32,
                                           -bound, bound),
                "w_hh": jax.random.uniform(ks[1], (4 * H, H), jnp.float32,
                                           -bound, bound),
                "b_ih": jax.random.uniform(ks[2], (4 * H,), jnp.float32,
                                           -bound, bound),
                "b_hh": jax.random.uniform(ks[3], (4 * H,), jnp.float32,
                                           -bound, bound),
            })
        return {"layers": layers}

    def _cell(self, p: Params, x_t: jnp.ndarray, h: jnp.ndarray,
              c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        H = self.dimension
        gates = (x_t @ p["w_ih"].astype(x_t.dtype).T
                 + h @ p["w_hh"].astype(x_t.dtype).T
                 + (p["b_ih"] + p["b_hh"]).astype(x_t.dtype))
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new

    def _run(self, params: Params, x: jnp.ndarray, h0: jnp.ndarray,
             c0: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: [B, C, T]; h0/c0: [num_layers, B, H]."""
        seq = x.swapaxes(1, 2)                      # [B, T, C]
        hs, cs = [], []
        for li, p in enumerate(params["layers"]):
            def step(carry, x_t):
                h, c = carry
                h, c = self._cell(p, x_t, h, c)
                return (h, c), h

            (h_f, c_f), ys = jax.lax.scan(
                step, (h0[li], c0[li]), seq.swapaxes(0, 1))
            seq = ys.swapaxes(0, 1)
            hs.append(h_f)
            cs.append(c_f)
        y = seq.swapaxes(1, 2)
        if self.skip:
            y = y + x
        return y, jnp.stack(hs), jnp.stack(cs)

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        zeros = jnp.zeros((self.num_layers, B, self.dimension), x.dtype)
        y, _, _ = self._run(params, x, zeros, zeros)
        return y

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        z = jnp.zeros((self.num_layers, batch, self.dimension), dtype)
        return [z, z]

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        y, h, c = self._run(params, x, cache[0], cache[1])
        return y, [h, c]

    def fold(self, params: Params) -> Params:
        return params


# ---------------------------------------------------------------------------
# EnCodec residual block (modules/seanet.py:21-63)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EncodecResnetBlock:
    """[act -> conv(k, d) dim->hidden -> act -> conv(1) hidden->dim] + skip
    (true_skip identity or streamable 1x1)."""
    dim: int
    kernel_sizes: Tuple[int, ...] = (3, 1)
    dilations: Tuple[int, ...] = (1, 1)
    activation: str = "ELU"
    activation_params: Optional[dict] = None
    norm: str = R.WEIGHT_NORM
    compress: int = 2
    true_skip: bool = False
    pad_mode: str = "reflect"   # the EnCodec-family default

    def __post_init__(self):
        hidden = self.dim // self.compress
        convs = []
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
            in_chs = self.dim if i == 0 else hidden
            out_chs = self.dim if i == len(self.kernel_sizes) - 1 else hidden
            convs.append(L.Conv1d(in_chs, out_chs, k, dilation=d,
                                  norm=self.norm, pad_mode=self.pad_mode))
        object.__setattr__(self, "convs", tuple(convs))
        object.__setattr__(self, "_act",
                           L.activation(self.activation,
                                        self.activation_params))
        shortcut = None
        if not self.true_skip:
            shortcut = L.Conv1d(self.dim, self.dim, 1, norm=self.norm)
        object.__setattr__(self, "shortcut", shortcut)

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.convs) + 1)
        p: Params = {"convs": [c.init(k)
                               for c, k in zip(self.convs, keys)]}
        if self.shortcut is not None:
            p["shortcut"] = self.shortcut.init(keys[-1])
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        skip = x if self.shortcut is None else \
            self.shortcut.apply(params["shortcut"], x)
        y = x
        for conv, cp in zip(self.convs, params["convs"]):
            y = self._act(y)
            y = conv.apply(cp, y)
        return skip + y

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        out: Cache = []
        for c in self.convs:
            out.extend(c.init_cache(batch, dtype))
        return out

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        skip = x if self.shortcut is None else \
            self.shortcut.apply(params["shortcut"], x)
        new_cache: Cache = []
        y = x
        i = 0
        for conv, cp in zip(self.convs, params["convs"]):
            y = self._act(y)
            n = len(conv.init_cache(1))
            y, c = conv.step(cp, cache[i:i + n], y)
            new_cache.extend(c)
            i += n
        return skip + y, new_cache


# ---------------------------------------------------------------------------
# Encoder / Decoder (modules/seanet.py:66-243)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EncodecEncoder:
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    activation: str = "ELU"
    activation_params: Optional[dict] = None
    norm: str = R.WEIGHT_NORM
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    pad_mode: str = "reflect"

    def __post_init__(self):
        ratios = tuple(reversed(self.ratios))
        object.__setattr__(self, "_ratios", ratios)
        object.__setattr__(self, "hop_length", int(np.prod(ratios)))
        conv_pre = L.Conv1d(self.channels, self.n_filters, self.kernel_size,
                            norm=self.norm, pad_mode=self.pad_mode)
        stages = []
        mult = 1
        for ratio in ratios:
            blocks = tuple(
                EncodecResnetBlock(
                    mult * self.n_filters,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    activation=self.activation,
                    activation_params=self.activation_params,
                    norm=self.norm, compress=self.compress,
                    true_skip=self.true_skip, pad_mode=self.pad_mode)
                for j in range(self.n_residual_layers))
            down = L.Conv1d(mult * self.n_filters, mult * self.n_filters * 2,
                            ratio * 2, stride=ratio, norm=self.norm,
                            pad_mode=self.pad_mode)
            stages.append((blocks, down))
            mult *= 2
        slstm = SLSTM(mult * self.n_filters, self.lstm) if self.lstm else None
        conv_post = L.Conv1d(mult * self.n_filters, self.dimension,
                             self.last_kernel_size, norm=self.norm,
                             pad_mode=self.pad_mode)
        object.__setattr__(self, "conv_pre", conv_pre)
        object.__setattr__(self, "stages", tuple(stages))
        object.__setattr__(self, "slstm", slstm)
        object.__setattr__(self, "conv_post", conv_post)
        object.__setattr__(self, "_act",
                           L.activation(self.activation,
                                        self.activation_params))

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.stages) + 3)
        p: Params = {"conv_pre": self.conv_pre.init(keys[0]), "stages": []}
        for i, (blocks, down) in enumerate(self.stages):
            sk = jax.random.split(keys[1 + i], len(blocks) + 1)
            p["stages"].append({
                "blocks": [b.init(k) for b, k in zip(blocks, sk)],
                "down": down.init(sk[-1])})
        if self.slstm is not None:
            p["lstm"] = self.slstm.init(keys[-2])
        p["conv_post"] = self.conv_post.init(keys[-1])
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_pre.apply(params["conv_pre"], x)
        for (blocks, down), sp in zip(self.stages, params["stages"]):
            for b, bp in zip(blocks, sp["blocks"]):
                x = b.apply(bp, x)
            x = self._act(x)
            x = down.apply(sp["down"], x)
        if self.slstm is not None:
            x = self.slstm.apply(params["lstm"], x)
        x = self._act(x)
        return self.conv_post.apply(params["conv_post"], x)

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        out: Cache = []
        out.extend(self.conv_pre.init_cache(batch, dtype))
        for (blocks, down) in self.stages:
            for b in blocks:
                out.extend(b.init_cache(batch, dtype))
            out.extend(down.init_cache(batch, dtype))
        if self.slstm is not None:
            out.extend(self.slstm.init_cache(batch, dtype))
        out.extend(self.conv_post.init_cache(batch, dtype))
        return out

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        new_cache: Cache = []
        i = 0

        def run(mod, p, x, i, n=None):
            n = n if n is not None else len(mod.init_cache(1))
            y, c = mod.step(p, cache[i:i + n], x)
            new_cache.extend(c)
            return y, i + n

        x, i = run(self.conv_pre, params["conv_pre"], x, i)
        for (blocks, down), sp in zip(self.stages, params["stages"]):
            for b, bp in zip(blocks, sp["blocks"]):
                x, i = run(b, bp, x, i)
            x = self._act(x)
            x, i = run(down, sp["down"], x, i)
        if self.slstm is not None:
            x, i = run(self.slstm, params["lstm"], x, i, n=2)
        x = self._act(x)
        x, i = run(self.conv_post, params["conv_post"], x, i)
        return x, new_cache


@dataclasses.dataclass(frozen=True)
class EncodecDecoder:
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    activation: str = "ELU"
    activation_params: Optional[dict] = None
    norm: str = R.WEIGHT_NORM
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    final_activation: Optional[str] = None
    pad_mode: str = "reflect"

    def __post_init__(self):
        object.__setattr__(self, "hop_length", int(np.prod(self.ratios)))
        mult = int(2 ** len(self.ratios))
        conv_pre = L.Conv1d(self.dimension, mult * self.n_filters,
                            self.kernel_size, norm=self.norm,
                            pad_mode=self.pad_mode)
        slstm = SLSTM(mult * self.n_filters, self.lstm) if self.lstm else None
        stages = []
        for ratio in self.ratios:
            up = L.ConvTranspose1d(mult * self.n_filters,
                                   mult * self.n_filters // 2, ratio * 2,
                                   stride=ratio, norm=self.norm)
            blocks = tuple(
                EncodecResnetBlock(
                    mult * self.n_filters // 2,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    activation=self.activation,
                    activation_params=self.activation_params,
                    norm=self.norm, compress=self.compress,
                    true_skip=self.true_skip, pad_mode=self.pad_mode)
                for j in range(self.n_residual_layers))
            stages.append((up, blocks))
            mult //= 2
        conv_post = L.Conv1d(self.n_filters, self.channels,
                             self.last_kernel_size, norm=self.norm,
                             pad_mode=self.pad_mode)
        object.__setattr__(self, "conv_pre", conv_pre)
        object.__setattr__(self, "slstm", slstm)
        object.__setattr__(self, "stages", tuple(stages))
        object.__setattr__(self, "conv_post", conv_post)
        object.__setattr__(self, "_act",
                           L.activation(self.activation,
                                        self.activation_params))
        object.__setattr__(
            self, "_final_act",
            L.activation(self.final_activation or "Identity", None))

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.stages) + 3)
        p: Params = {"conv_pre": self.conv_pre.init(keys[0]), "stages": []}
        if self.slstm is not None:
            p["lstm"] = self.slstm.init(keys[-2])
        for i, (up, blocks) in enumerate(self.stages):
            sk = jax.random.split(keys[1 + i], len(blocks) + 1)
            p["stages"].append({
                "up": up.init(sk[0]),
                "blocks": [b.init(k) for b, k in zip(blocks, sk[1:])]})
        p["conv_post"] = self.conv_post.init(keys[-1])
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv_pre.apply(params["conv_pre"], x)
        if self.slstm is not None:
            x = self.slstm.apply(params["lstm"], x)
        for (up, blocks), sp in zip(self.stages, params["stages"]):
            x = self._act(x)
            x = up.apply(sp["up"], x)
            for b, bp in zip(blocks, sp["blocks"]):
                x = b.apply(bp, x)
        x = self._act(x)
        x = self.conv_post.apply(params["conv_post"], x)
        return self._final_act(x)

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        out: Cache = []
        out.extend(self.conv_pre.init_cache(batch, dtype))
        if self.slstm is not None:
            out.extend(self.slstm.init_cache(batch, dtype))
        for (up, blocks) in self.stages:
            out.extend(up.init_cache(batch, dtype))
            for b in blocks:
                out.extend(b.init_cache(batch, dtype))
        out.extend(self.conv_post.init_cache(batch, dtype))
        return out

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        new_cache: Cache = []
        i = 0

        def run(mod, p, x, i, n=None):
            n = n if n is not None else len(mod.init_cache(1))
            y, c = mod.step(p, cache[i:i + n], x)
            new_cache.extend(c)
            return y, i + n

        x, i = run(self.conv_pre, params["conv_pre"], x, i)
        if self.slstm is not None:
            x, i = run(self.slstm, params["lstm"], x, i, n=2)
        for (up, blocks), sp in zip(self.stages, params["stages"]):
            x = self._act(x)
            x, i = run(up, sp["up"], x, i)
            for b, bp in zip(blocks, sp["blocks"]):
                x, i = run(b, bp, x, i)
        x = self._act(x)
        x, i = run(self.conv_post, params["conv_post"], x, i)
        return self._final_act(x), new_cache


@dataclasses.dataclass(frozen=True)
class EncodecModel:
    """encoder -> ResidualVQ -> decoder (models.py:59-120). The quantizer
    (ops/rvq.ResidualVQ) is attached by the caller like CodecModel."""
    sample_rate: int = 24000
    channels_audio: int = 1
    channels_enc: int = 32
    channels_dec: int = 32
    n_residual_layers: int = 1
    strides: Tuple[int, ...] = (8, 5, 4, 2)
    activation: str = "ELU"
    norm: str = R.WEIGHT_NORM
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    final_activation: Optional[str] = None
    vq_dim: int = 128
    pad_mode: str = "reflect"

    def __post_init__(self):
        enc = EncodecEncoder(
            self.channels_audio, self.vq_dim, self.channels_enc,
            self.n_residual_layers, tuple(self.strides), self.activation,
            None, self.norm, self.kernel_size, self.last_kernel_size,
            self.residual_kernel_size, self.dilation_base, self.true_skip,
            self.compress, self.lstm, self.pad_mode)
        dec = EncodecDecoder(
            self.channels_audio, self.vq_dim, self.channels_dec,
            self.n_residual_layers, tuple(self.strides), self.activation,
            None, self.norm, self.kernel_size, self.last_kernel_size,
            self.residual_kernel_size, self.dilation_base, self.true_skip,
            self.compress, self.lstm, self.final_activation, self.pad_mode)
        object.__setattr__(self, "encoder", enc)
        object.__setattr__(self, "decoder", dec)
        object.__setattr__(self, "hop_length", enc.hop_length)

    def init(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        return {"encoder": self.encoder.init(k1),
                "decoder": self.decoder.init(k2)}

    def init_cache(self, batch: int, dtype=jnp.float32
                   ) -> Tuple[Cache, Cache]:
        return (self.encoder.init_cache(batch, dtype),
                self.decoder.init_cache(batch, dtype))

    def fold_params(self, params: Params) -> Params:
        """Deployment fold: remove weight_norm from every conv
        (streaming export path; LSTM params pass through)."""
        return R.fold_tree(params, self.norm)


# ---------------------------------------------------------------------------
# Streaming transformer LM (modules/transformer.py, models.py:21-56)
# ---------------------------------------------------------------------------

def sin_embedding(positions: jnp.ndarray, dim: int,
                  max_period: float = 10000.0) -> jnp.ndarray:
    half = dim // 2
    adim = jnp.arange(half)[None, None, :]
    phase = positions[..., None] / (max_period ** (adim / (half - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


def _layer_norm(x, g, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


@dataclasses.dataclass(frozen=True)
class StreamingTransformerEncoder:
    """Past-context-masked causal self-attention with state carry
    (transformer.py:30-117). post-norm (torch norm_first=False)."""
    dim: int
    hidden_scale: float = 4.0
    num_heads: int = 8
    num_layers: int = 5
    max_period: float = 10000.0
    past_context: int = 1000
    gelu: bool = True
    norm_in: bool = True

    def init(self, key: jax.Array) -> Params:
        C = self.dim
        H = int(C * self.hidden_scale)
        layers = []
        for i in range(self.num_layers):
            k = jax.random.fold_in(key, i)
            ks = jax.random.split(k, 4)
            s = 1.0 / math.sqrt(C)
            layers.append({
                "in_proj_w": jax.random.uniform(ks[0], (3 * C, C),
                                                jnp.float32, -s, s),
                "in_proj_b": jnp.zeros((3 * C,), jnp.float32),
                "out_proj_w": jax.random.uniform(ks[1], (C, C), jnp.float32,
                                                 -s, s),
                "out_proj_b": jnp.zeros((C,), jnp.float32),
                "lin1_w": jax.random.uniform(ks[2], (H, C), jnp.float32,
                                             -s, s),
                "lin1_b": jnp.zeros((H,), jnp.float32),
                "lin2_w": jax.random.uniform(ks[3], (C, H), jnp.float32,
                                             -1.0 / math.sqrt(H),
                                             1.0 / math.sqrt(H)),
                "lin2_b": jnp.zeros((C,), jnp.float32),
                "norm1_g": jnp.ones((C,)), "norm1_b": jnp.zeros((C,)),
                "norm2_g": jnp.ones((C,)), "norm2_b": jnp.zeros((C,)),
            })
        p: Params = {"layers": layers}
        if self.norm_in:
            p["norm_in_g"] = jnp.ones((C,))
            p["norm_in_b"] = jnp.zeros((C,))
        return p

    def _attn(self, p, x, x_past):
        B, T, C = x.shape
        H = self.num_heads
        hd = C // H
        keys_in = jnp.concatenate([x_past, x], axis=1)
        Tk = keys_in.shape[1]
        q = x @ p["in_proj_w"][:C].T + p["in_proj_b"][:C]
        k = keys_in @ p["in_proj_w"][C:2 * C].T + p["in_proj_b"][C:2 * C]
        v = keys_in @ p["in_proj_w"][2 * C:].T + p["in_proj_b"][2 * C:]
        q = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3)
        scores = q @ k.swapaxes(-1, -2) / math.sqrt(hd)
        hist = x_past.shape[1]
        qpos = jnp.arange(hist, T + hist)[:, None]
        kpos = jnp.arange(Tk)[None, :]
        delta = qpos - kpos
        valid = (delta >= 0) & (delta <= self.past_context)
        scores = jnp.where(valid[None, None], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, C)
        return out @ p["out_proj_w"].T + p["out_proj_b"]

    def apply(self, params: Params, x: jnp.ndarray,
              states: Optional[List[jnp.ndarray]] = None,
              offset: int = 0
              ) -> Tuple[jnp.ndarray, List[jnp.ndarray], int]:
        """x: [B, T, C] -> (y, new_states, new_offset)."""
        B, T, C = x.shape
        if states is None:
            states = [jnp.zeros((B, 1, C), x.dtype)
                      for _ in range(self.num_layers)]
        pos = jnp.arange(T)[None, :] + offset
        x = x + 0  # copy
        if self.norm_in:
            x = _layer_norm(x, params["norm_in_g"], params["norm_in_b"])
        x = x + sin_embedding(pos, C, self.max_period).astype(x.dtype)

        new_states = []
        act = jax.nn.gelu if self.gelu else jax.nn.relu
        for p, st in zip(params["layers"], states):
            sa_input = x
            x = _layer_norm(x + self._attn(p, x, st), p["norm1_g"],
                            p["norm1_b"])
            ff = act(x @ p["lin1_w"].T + p["lin1_b"]) @ p["lin2_w"].T \
                + p["lin2_b"]
            x = _layer_norm(x + ff, p["norm2_g"], p["norm2_b"])
            new_st = jnp.concatenate([st, sa_input], axis=1)
            new_states.append(new_st[:, -self.past_context:])
        return x, new_states, offset + T


@dataclasses.dataclass(frozen=True)
class LMModel:
    """Entropy model over RVQ tokens (models.py:21-56): summed per-codebook
    embeddings -> streaming transformer -> per-codebook softmax heads."""
    n_q: int = 32
    card: int = 1024
    dim: int = 200
    num_heads: int = 8
    num_layers: int = 5
    past_context: int = 1000

    def __post_init__(self):
        object.__setattr__(self, "transformer", StreamingTransformerEncoder(
            dim=self.dim, num_heads=self.num_heads,
            num_layers=self.num_layers, past_context=self.past_context))

    def init(self, key: jax.Array) -> Params:
        ks = jax.random.split(key, 3)
        emb = jax.random.normal(ks[0], (self.n_q, self.card + 1, self.dim),
                                jnp.float32)
        s = 1.0 / math.sqrt(self.dim)
        lin_w = jax.random.uniform(ks[1], (self.n_q, self.card, self.dim),
                                   jnp.float32, -s, s)
        lin_b = jnp.zeros((self.n_q, self.card), jnp.float32)
        return {"emb": emb, "lin_w": lin_w, "lin_b": lin_b,
                "transformer": self.transformer.init(ks[2])}

    def apply(self, params: Params, indices: jnp.ndarray,
              states: Optional[List[jnp.ndarray]] = None, offset: int = 0):
        """indices: [B, n_q, T] (1 + codebook index; 0 = missing) ->
        (probs [B, card, n_q, T], states, offset)."""
        B, K, T = indices.shape
        x = jnp.zeros((B, T, self.dim))
        for k in range(K):
            x = x + params["emb"][k][indices[:, k]]
        out, states, offset = self.transformer.apply(params["transformer"],
                                                     x, states, offset)
        logits = jnp.einsum("btc,kvc->bvkt", out, params["lin_w"]) \
            + params["lin_b"].T[None, :, :, None]
        return jax.nn.softmax(logits, axis=1), states, offset
