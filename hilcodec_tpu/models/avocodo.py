"""Avocodo model family: multi-scale decoder heads + CoMBD discriminator.

Reference: models/avocodo/ — the generator is the same SEANet codec as
HILCodec (encoder reused from models/hilcodec.py; `spec_layer: 1x1_zero` ==
zero_init SpecBlock), but the decoder emits outputs at three scales
(1/8-rate, 1/2-rate, full-rate) via per-stage conv_post heads
(modules/seanet.py:440-521), trained against PQMF-decomposed targets with
the CoMBD (avocodo/CoMBD.py) + SBD discriminators and a simple weighted-sum
balancer (balancer.py:46-54).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pqmf as P
from ..ops import reparam as R
from . import layers as L
from .discriminators import SBD, _init_conv, _lrelu, _weight
from .hilcodec import WAV_STD, Encoder

Params = Dict[str, Any]
Cache = List[jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class AvocodoDecoder:
    """HILCodec-style decoder with multi-scale output heads: after stage
    i >= 1 a head [scale -> act -> conv(ch->1) -> wav_std -> final_act]
    produces the output at that scale; ys = [1/8, 1/2, 1] x full rate."""
    channels: int = 1
    dimension: int = 128
    n_filters: int = 96
    n_residual_layers: int = 3
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    activation: str = "ELU"
    activation_params: Optional[dict] = None
    norm: str = R.WEIGHT_NORM
    kernel_size: int = 5
    last_kernel_size: int = 5
    residual_kernel_size: int = 5
    dilation_base: int = 1
    skip: str = "identity"
    final_activation: Optional[str] = "Tanh"
    act_all: bool = False
    expansion: int = 1
    groups: int = -1
    bias: bool = True
    res_scale: Optional[float] = None
    wav_std: float = WAV_STD

    def __post_init__(self):
        object.__setattr__(self, "hop_length", int(np.prod(self.ratios)))
        act, act_p = self.activation, self.activation_params
        mult = int(2 ** len(self.ratios))
        pre_pw = L.Conv1d(self.dimension, mult * self.n_filters, 1,
                          norm=self.norm, bias=False)
        pre_dw = L.Conv1d(mult * self.n_filters, mult * self.n_filters,
                          self.kernel_size, groups=mult * self.n_filters,
                          norm=self.norm, bias=self.bias)
        stages, heads = [], []
        for i, ratio in enumerate(self.ratios):
            up_dw = L.ConvTranspose1d(
                mult * self.n_filters, mult * self.n_filters, ratio * 2,
                stride=ratio, groups=mult * self.n_filters, norm=self.norm,
                bias=False, nonlinearity="relu")
            up_pw = L.Conv1d(mult * self.n_filters,
                             mult * self.n_filters // 2, 1, norm=self.norm,
                             bias=self.bias)
            blocks = tuple(
                L.ResBlock(mult * self.n_filters // 2,
                           kernel_size=self.residual_kernel_size,
                           dilations=(self.dilation_base ** j, 1),
                           activation=act, activation_params=act_p,
                           norm=self.norm, skip=self.skip,
                           act_all=self.act_all, expansion=self.expansion,
                           groups=self.groups, bias=self.bias,
                           res_scale=self.res_scale, idx=j, zero_init=True)
                for j in range(self.n_residual_layers))
            stages.append((up_dw, up_pw, blocks))
            mult //= 2
            if i >= 1:
                heads.append(L.Conv1d(mult * self.n_filters, self.channels,
                                      self.last_kernel_size, norm=self.norm,
                                      bias=self.bias, nonlinearity="relu"))
        object.__setattr__(self, "pre_pw", pre_pw)
        object.__setattr__(self, "pre_dw", pre_dw)
        object.__setattr__(self, "stages", tuple(stages))
        object.__setattr__(self, "heads", tuple(heads))
        object.__setattr__(self, "_act", L.activation(act, act_p))
        object.__setattr__(
            self, "_final_act",
            L.activation(self.final_activation or "Identity", None))
        rs = 1.0 if self.res_scale is None else self.res_scale
        object.__setattr__(self, "stage_scale",
                           (1 + self.n_residual_layers * rs ** 2) ** -0.5)

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.stages) + len(self.heads) + 2)
        p: Params = {"pre_pw": self.pre_pw.init(keys[0]),
                     "pre_dw": self.pre_dw.init(keys[1]), "stages": [],
                     "heads": []}
        ki = 2
        for (up_dw, up_pw, blocks) in self.stages:
            sk = jax.random.split(keys[ki], len(blocks) + 2)
            ki += 1
            p["stages"].append({
                "up_dw": up_dw.init(sk[0]), "up_pw": up_pw.init(sk[1]),
                "blocks": [b.init(k) for b, k in zip(blocks, sk[2:])]})
        for h in self.heads:
            p["heads"].append(h.init(keys[ki]))
            ki += 1
        return p

    def _head(self, head, hp: Params, x: jnp.ndarray) -> jnp.ndarray:
        y = x * jnp.asarray(self.stage_scale, x.dtype)
        y = self._act(y)
        y = head.apply(hp, y)
        y = y * jnp.asarray(self.wav_std, y.dtype)
        return self._final_act(y).astype(jnp.float32)

    def apply(self, params: Params, x: jnp.ndarray,
              return_list: bool = True):
        """x: [B, dim, T'] -> ys (list of 3 scales) or the full-rate
        output only."""
        x = self.pre_pw.apply(params["pre_pw"], x)
        x = self.pre_dw.apply(params["pre_dw"], x)
        ys = []
        for i, ((up_dw, up_pw, blocks), sp) in enumerate(
                zip(self.stages, params["stages"])):
            if i > 0:
                x = x * jnp.asarray(self.stage_scale, x.dtype)
            x = self._act(x)
            x = up_dw.apply(sp["up_dw"], x)
            x = up_pw.apply(sp["up_pw"], x)
            for blk, bp in zip(blocks, sp["blocks"]):
                x = blk.apply(bp, x)
            if i >= 1:
                ys.append(self._head(self.heads[i - 1],
                                     params["heads"][i - 1], x))
        return ys if return_list else ys[-1]

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        out: Cache = []
        out.extend(self.pre_dw.init_cache(batch, dtype))
        for (up_dw, _pw, blocks) in self.stages:
            out.extend(up_dw.init_cache(batch, dtype))
            for b in blocks:
                out.extend(b.init_cache(batch, dtype))
        out.extend(self.heads[-1].init_cache(batch, dtype))
        return out

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        """Streaming: full-rate output only (deployment graph)."""
        new_cache: Cache = []
        x = self.pre_pw.apply(params["pre_pw"], x)
        x, c = self.pre_dw.step(params["pre_dw"], cache[0:1], x)
        new_cache.extend(c)
        i = 1
        for si, ((up_dw, up_pw, blocks), sp) in enumerate(
                zip(self.stages, params["stages"])):
            if si > 0:
                x = x * jnp.asarray(self.stage_scale, x.dtype)
            x = self._act(x)
            x, c = up_dw.step(sp["up_dw"], cache[i:i + 1], x)
            new_cache.extend(c)
            i += 1
            x = up_pw.apply(sp["up_pw"], x)
            for blk, bp in zip(blocks, sp["blocks"]):
                n = len(blk.init_cache(1))
                x, c = blk.step(bp, cache[i:i + n], x)
                new_cache.extend(c)
                i += n
        x = x * jnp.asarray(self.stage_scale, x.dtype)
        x = self._act(x)
        head = self.heads[-1]
        hp = params["heads"][-1]
        x, c = head.step(hp, cache[i:i + 1], x)
        new_cache.extend(c)
        x = x * jnp.asarray(self.wav_std, x.dtype)
        return self._final_act(x), new_cache


@dataclasses.dataclass(frozen=True)
class AvocodoModel:
    """Encoder (HILCodec SEANet) + multi-scale decoder
    (models/avocodo/models.py:24-127)."""
    sample_rate: int = 24000
    channels_audio: int = 1
    channels_enc: int = 64
    channels_dec: int = 96
    n_fft_base: int = 64
    n_residual_enc: int = 2
    n_residual_dec: int = 3
    res_scale_enc: Optional[float] = 0.5773502691896258
    res_scale_dec: Optional[float] = 0.5773502691896258
    strides: Tuple[int, ...] = (8, 5, 4, 2)
    kernel_size: int = 5
    last_kernel_size: int = 5
    residual_kernel_size: int = 5
    dilation_base: int = 1
    skip: str = "identity"
    final_activation: Optional[str] = "Tanh"
    act_all: bool = False
    encoder_l2norm: bool = True
    spec: str = "stft"
    spec_compression: str = "log"
    spec_learnable: bool = False
    norm: str = R.WEIGHT_NORM
    vq_dim: int = 128

    def __post_init__(self):
        enc = Encoder(
            self.channels_audio, self.vq_dim, self.channels_enc,
            self.n_fft_base, self.n_residual_enc, tuple(self.strides),
            "ELU", None, self.norm, self.kernel_size, self.last_kernel_size,
            self.residual_kernel_size, self.dilation_base, self.skip,
            act_all=self.act_all, l2norm=self.encoder_l2norm,
            spec=self.spec, spec_compression=self.spec_compression,
            spec_learnable=self.spec_learnable,
            res_scale=self.res_scale_enc)
        dec = AvocodoDecoder(
            self.channels_audio, self.vq_dim, self.channels_dec,
            self.n_residual_dec, tuple(self.strides), "ELU", None,
            self.norm, self.kernel_size, self.last_kernel_size,
            self.residual_kernel_size, self.dilation_base, self.skip,
            self.final_activation, self.act_all,
            res_scale=self.res_scale_dec)
        object.__setattr__(self, "encoder", enc)
        object.__setattr__(self, "decoder", dec)
        object.__setattr__(self, "hop_length", enc.hop_length)

    @classmethod
    def from_config(cls, model_kwargs: Dict[str, Any]) -> "AvocodoModel":
        kw = dict(model_kwargs)
        vq_kwargs = kw.pop("vq_kwargs", {})
        keep = {f.name for f in dataclasses.fields(cls)}
        mapped = {k: v for k, v in kw.items() if k in keep}
        if "strides" in mapped:
            mapped["strides"] = tuple(mapped["strides"])
        mapped["vq_dim"] = vq_kwargs.get("dim", 128)
        return cls(**mapped)

    def init(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        return {"encoder": self.encoder.init(k1),
                "decoder": self.decoder.init(k2)}

    # CodecModel-protocol streaming surface: wrap as
    # `CodecModel(AvocodoModel(...), vq)` to stream the deployment graph
    # (full-rate head only — AvocodoDecoder.step) like every other family.
    def init_cache(self, batch: int, dtype=jnp.float32):
        return (self.encoder.init_cache(batch, dtype),
                self.decoder.init_cache(batch, dtype))

    def fold_params(self, params: Params) -> Params:
        """Deployment fold: the encoder reuses HILCodec's fold (weight-norm
        removal + scale merges); the avocodo decoder applies stage_scale /
        wav_std explicitly inside step, so plain weight-norm folding
        suffices there."""
        return {"encoder": self.encoder.fold_params(params["encoder"]),
                "decoder": R.fold_tree(params["decoder"], self.norm)}


@dataclasses.dataclass(frozen=True)
class _FullRateDecoder:
    """AvocodoDecoder restricted to its full-rate head: `apply` drops the
    multi-scale output list so the generator satisfies the standard
    CodecModel protocol (decoder.apply(params, x) -> wav)."""
    dec: AvocodoDecoder

    def init(self, key: jax.Array) -> Params:
        return self.dec.init(key)

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return self.dec.apply(params, x, return_list=False)

    def init_cache(self, batch: int, dtype=jnp.float32) -> Cache:
        return self.dec.init_cache(batch, dtype)

    def step(self, params: Params, cache: Cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, Cache]:
        return self.dec.step(params, cache, x)


@dataclasses.dataclass(frozen=True)
class AvocodoFullRate:
    """Avocodo generator with the full-rate head only — the controlled
    ablation (`train.trainer: hilcodec` in the config) that trains the
    avocodo ARCHITECTURE under the hilcodec TRAINER (gradient balancer,
    MFBD+MSTFTD, hinge, normalized FM). Distinguishes "the avocodo quality
    gap is architectural" from "it is the avocodo training recipe"
    (BASELINE round-4, VERDICT r3 weak #6)."""
    base: AvocodoModel

    def __post_init__(self):
        object.__setattr__(self, "encoder", self.base.encoder)
        object.__setattr__(self, "decoder",
                           _FullRateDecoder(self.base.decoder))
        object.__setattr__(self, "hop_length", self.base.hop_length)

    def init(self, key: jax.Array) -> Params:
        return self.base.init(key)

    def init_cache(self, batch: int, dtype=jnp.float32):
        return self.base.init_cache(batch, dtype)

    def fold_params(self, params: Params) -> Params:
        return self.base.fold_params(params)


# ---------------------------------------------------------------------------
# CoMBD (avocodo/CoMBD.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CoMBDBlock:
    h_u: Tuple[int, ...]
    d_k: Tuple[int, ...]
    d_s: Tuple[int, ...]
    d_d: Tuple[int, ...]
    d_g: Tuple[int, ...]
    d_p: Tuple[int, ...]
    op_f: int
    op_k: int
    op_g: int
    norm: str = R.WEIGHT_NORM

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.h_u) + 1)
        convs = []
        c_in = 1
        for k_i, (ch, k, g) in zip(keys, zip(self.h_u, self.d_k, self.d_g)):
            convs.append(_init_conv(k_i, (ch, c_in // g, k), self.norm))
            c_in = ch
        proj = _init_conv(keys[-1], (self.op_f, c_in // self.op_g,
                                     self.op_k), self.norm)
        return {"convs": convs, "proj": proj}

    def apply(self, params: Params, x: jnp.ndarray):
        from ..ops import conv as C
        fmap = []
        for p, k, s, d, g, pad in zip(params["convs"], self.d_k, self.d_s,
                                      self.d_d, self.d_g, self.d_p):
            x = C.conv1d(x, _weight(p, self.norm), p.get("b"), stride=s,
                         dilation=d, groups=g, padding=(pad, pad))
            x = _lrelu(x, 0.2)
            fmap.append(x)
        x = C.conv1d(x, _weight(params["proj"], self.norm),
                     params["proj"].get("b"), groups=self.op_g)
        return x, fmap


@dataclasses.dataclass(frozen=True)
class CoMBD:
    """Collaborative multi-band discriminator: hierarchical path over the
    generator's multi-scale outputs + multi-scale path over PQMF bands of
    the final output, sharing blocks (CoMBD.py:67-122)."""
    combd_h_u: Tuple[Tuple[int, ...], ...]
    combd_d_k: Tuple[Tuple[int, ...], ...]
    combd_d_s: Tuple[Tuple[int, ...], ...]
    combd_d_d: Tuple[Tuple[int, ...], ...]
    combd_d_g: Tuple[Tuple[int, ...], ...]
    combd_d_p: Tuple[Tuple[int, ...], ...]
    combd_op_f: Tuple[int, ...]
    combd_op_k: Tuple[int, ...]
    combd_op_g: Tuple[int, ...]
    pqmf_config: Dict[str, Tuple]
    norm: str = R.WEIGHT_NORM

    def __post_init__(self):
        blocks = tuple(
            CoMBDBlock(tuple(hu), tuple(dk), tuple(ds), tuple(dd),
                       tuple(dg), tuple(dp), of, ok, og, self.norm)
            for hu, dk, ds, dd, dg, dp, of, ok, og in zip(
                self.combd_h_u, self.combd_d_k, self.combd_d_s,
                self.combd_d_d, self.combd_d_g, self.combd_d_p,
                self.combd_op_f, self.combd_op_k, self.combd_op_g))
        object.__setattr__(self, "blocks", blocks)

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.blocks))
        return {"blocks": [b.init(k) for b, k in zip(self.blocks, keys)]}

    def _pqmf1(self, x: jnp.ndarray, cfg) -> jnp.ndarray:
        sub, taps, cutoff, beta = cfg
        # ParallelWaveGAN bank (no sqrt(subbands)), CoMBD.py:70-74
        return P.analysis(x, sub, taps, cutoff, beta,
                          orthonormal=False)[:, :1]

    def apply(self, params: Params, ys: List[jnp.ndarray]):
        """ys: list of waveforms at increasing rates (last = full rate)."""
        logits, fmaps = [], []
        # hierarchical path
        for x, b, p in zip(ys, self.blocks, params["blocks"]):
            lg, fm = b.apply(p, x)
            logits.append(lg)
            fmaps.extend(fm)
        # multi-scale path over PQMF of the final output
        ms = [self._pqmf1(ys[-1], self.pqmf_config["lv2"]),
              self._pqmf1(ys[-1], self.pqmf_config["lv1"])]
        for x, b, p in zip(ms, self.blocks[:-1], params["blocks"][:-1]):
            lg, fm = b.apply(p, x)
            logits.append(lg)
            fmaps.extend(fm)
        return logits, fmaps


@dataclasses.dataclass(frozen=True)
class AvocodoDiscriminators:
    """{combd, sbd} over the multi-scale output list
    (models/avocodo/discriminators.py)."""
    combd_kwargs: Optional[Dict[str, Any]] = None
    sbd_kwargs: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        discs = {}
        if self.combd_kwargs and self.combd_kwargs.get("use", False):
            h = dict(self.combd_kwargs["h"])
            discs["combd"] = CoMBD(
                combd_h_u=tuple(map(tuple, h["combd_h_u"])),
                combd_d_k=tuple(map(tuple, h["combd_d_k"])),
                combd_d_s=tuple(map(tuple, h["combd_d_s"])),
                combd_d_d=tuple(map(tuple, h["combd_d_d"])),
                combd_d_g=tuple(map(tuple, h["combd_d_g"])),
                combd_d_p=tuple(map(tuple, h["combd_d_p"])),
                combd_op_f=tuple(h["combd_op_f"]),
                combd_op_k=tuple(h["combd_op_k"]),
                combd_op_g=tuple(h["combd_op_g"]),
                pqmf_config={k: tuple(v)
                             for k, v in h["pqmf_config"].items()})
        if self.sbd_kwargs and self.sbd_kwargs.get("use", False):
            h = dict(self.sbd_kwargs["h"])

            def pq(cfg):
                if cfg is None:
                    return None
                if isinstance(cfg, dict):
                    return cfg
                sub, taps, cutoff, beta = cfg
                return {"subbands": sub, "taps": taps,
                        "cutoff_freq": cutoff, "beta": beta}

            pqmf_cfg = h.get("pqmf_config", {})
            discs["sbd"] = SBD(
                channels=tuple(map(tuple, h["sbd_filters"])),
                strides=tuple(map(tuple, h["sbd_strides"])),
                kernel_sizes=tuple(
                    tuple(map(tuple, k)) for k in h["sbd_kernel_sizes"]),
                dilations=tuple(
                    tuple(map(tuple, d)) for d in h["sbd_dilations"]),
                band_ranges=tuple(map(tuple, h["sbd_band_ranges"])),
                transpose=tuple(h["sbd_transpose"]),
                pqmf_kwargs=pq(pqmf_cfg.get("sbd",
                                            h.get("pqmf_kwargs"))) or {},
                f_pqmf_kwargs=pq(pqmf_cfg.get("fsbd",
                                              h.get("f_pqmf_kwargs"))),
                segment_size=h.get("segment_size"),
                pqmf_orthonormal=False)
        object.__setattr__(self, "discs", discs)

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, max(len(self.discs), 1))
        return {n: d.init(k) for (n, d), k in zip(self.discs.items(), keys)}

    def apply(self, params: Params, ys: List[jnp.ndarray]):
        logits, fmaps = {}, {}
        for name, d in self.discs.items():
            x = ys if name == "combd" else ys[-1]
            lg, fm = d.apply(params[name], x)
            logits[name] = lg
            fmaps[name] = fm
        return logits, fmaps


def pqmf_targets(wav: jnp.ndarray, pqmf_config: Dict[str, Tuple]
                 ) -> List[jnp.ndarray]:
    """Real multi-scale targets: [pqmf_lv2(wav)[:, :1], pqmf_lv1(wav)[:, :1],
    wav] (avocodo wrapper.py:229-233)."""
    lv2 = pqmf_config["lv2"]
    lv1 = pqmf_config["lv1"]
    # the avocodo wrapper builds targets with its ParallelWaveGAN PQMF
    # (no sqrt(subbands) factor), models/avocodo/avocodo/pqmf.py:71-96
    return [P.analysis(wav, lv2[0], lv2[1], lv2[2], lv2[3],
                       orthonormal=False)[:, :1],
            P.analysis(wav, lv1[0], lv1[1], lv1[2], lv1[3],
                       orthonormal=False)[:, :1],
            wav]
