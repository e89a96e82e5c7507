"""Fused Pallas encoder-frame megakernel.

Same design as ops/pallas_decoder.py (shared op executor): the per-frame
HILCodec encoder step collapses into a few VMEM-resident Pallas segments.
The SpecBlock STFT branch (causal windowed-DFT magnitude + log compression)
stays OUTSIDE the kernels — it is already a handful of MXU matmuls on the
shared wav ring (ops/stft.causal_stft_mag); each stage's log-mag enters its
segment as an aux input and only the folded 1x1 mix happens in-kernel.

Reference semantics: models/hilcodec/streaming.py:482-517 (Encoder.forward
with the shared 1023-sample wav ring cache). Cache list layout/order equals
Encoder.init_cache, with slots 1.. stored time-major ([B, L, C]); slot 0 is
the wav ring, updated outside the kernels.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decoder import (_COMPILER_PARAMS, _Op, _pack_segments,
                             _prepare_weights, _lookup, _segment_kernel,
                             _segment_out_shape)


def _encoder_ops(enc) -> Tuple[List[_Op], List[Tuple[int, int]], List[dict]]:
    """(ops, cache_shapes for slots 1.. [(L, C)...], spec descriptors)."""
    assert enc.skip == "identity" and not enc.act_all
    assert not enc.spec_learnable, "megakernel: fixed STFT basis only"
    assert (enc.activation_params or {}).get("alpha", 1.0) == 1.0
    ops: List[_Op] = []
    cache_shapes: List[Tuple[int, int]] = []
    specs: List[dict] = []
    group = 0

    def f32(*shape):
        return 4 * int(np.prod(shape))

    c = enc.n_filters
    k = enc.kernel_size
    ops.append(_Op("dense1ch", dict(path=("conv_pre",), k=k, c=c),
                   f32(k, c)))

    stride = 1
    mult = 1
    for si, ratio in enumerate(enc._ratios):
        ch = mult * enc.n_filters
        spec_obj = enc.stages[si][0]
        if spec_obj is not None:
            specs.append(dict(stage=si, n_fft=spec_obj.n_fft,
                              stride=spec_obj.stride,
                              path=("stages", si, "spec")))
            ops.append(_Op("mix", dict(path=("stages", si, "spec"),
                                       f=spec_obj.n_fft // 2 + 1, cout=ch),
                           f32(spec_obj.n_fft // 2 + 1, ch)))
        kr = enc.residual_kernel_size
        for bi in range(1, enc.n_residual_layers + 1):
            group += 1
            idx = bi - 1 if enc.spec == "" else bi
            pre = ((1 + idx * enc.res_scale ** 2) ** -0.5
                   if enc.res_scale is not None else None)
            ops.append(_Op("res_begin", dict(pre_scale=pre),
                           atomic_group=group))
            dils = (enc.dilation_base ** bi, 1)
            for di, d in enumerate(dils):
                base = ("stages", si, "blocks", bi - 1, "blocks", di)
                ops.append(_Op("act", dict(name=enc.activation),
                               atomic_group=group))
                ops.append(_Op("pw", dict(path=base + ("pointwise",),
                                          cin=ch, cout=ch),
                               f32(ch, ch), atomic_group=group))
                cache_shapes.append((d * (kr - 1), ch))
                ops.append(_Op("dw", dict(path=base + ("depthwise",),
                                          k=kr, d=d, c=ch),
                               f32(kr, ch),
                               cache_slot=len(cache_shapes) - 1,
                               atomic_group=group))
            ops.append(_Op("res_end", dict(), atomic_group=group))
        scale = (None if enc.res_scale is None else
                 (1 + enc.n_residual_layers * enc.res_scale ** 2) ** -0.5)
        if scale is not None:
            ops.append(_Op("scale", dict(s=scale)))
        ops.append(_Op("act", dict(name=enc.activation)))
        ops.append(_Op("pw", dict(path=("stages", si, "down_pw"),
                                  cin=ch, cout=2 * ch),
                       f32(ch, 2 * ch)))
        cache_shapes.append((ratio, 2 * ch))
        ops.append(_Op("dws", dict(path=("stages", si, "down_dw"),
                                   k=2 * ratio, s=ratio, c=2 * ch),
                       f32(2 * ratio, 2 * ch),
                       cache_slot=len(cache_shapes) - 1))
        stride *= ratio
        mult *= 2

    ch = mult * enc.n_filters
    if enc.spec_post is not None:
        specs.append(dict(stage=len(enc._ratios), n_fft=enc.spec_post.n_fft,
                          stride=enc.spec_post.stride, path=("spec_post",)))
        ops.append(_Op("mix", dict(path=("spec_post",),
                                   f=enc.spec_post.n_fft // 2 + 1, cout=ch),
                       f32(enc.spec_post.n_fft // 2 + 1, ch)))
    ops.append(_Op("act", dict(name=enc.activation)))
    kp = enc.last_kernel_size
    cache_shapes.append((kp - 1, ch))
    ops.append(_Op("dw", dict(path=("post_dw",), k=kp, d=1, c=ch),
                   f32(kp, ch), cache_slot=len(cache_shapes) - 1))
    ops.append(_Op("pw", dict(path=("post_pw",), cin=ch,
                              cout=enc.dimension),
                   f32(ch, enc.dimension)))
    if enc.l2norm:
        ops.append(_Op("l2norm", dict(c=enc.dimension, eps=1e-12,
                                      inout_norm=enc.inout_norm)))
    return ops, cache_shapes, specs


@dataclasses.dataclass(frozen=True)
class EncoderMegakernel:
    """Fused streaming encoder step. `step(folded_params, cache, x)`:
    cache = [wav_ring [B,1,W]] + time-major layer caches ([B,L,C]) in the
    reference flat order; x = [B, 1, hop*L] new samples."""
    enc: Any
    block_streams: int = 32
    interpret: bool = False

    def __post_init__(self):
        ops, cache_shapes, specs = _encoder_ops(self.enc)
        object.__setattr__(self, "_ops", ops)
        object.__setattr__(self, "cache_shapes", cache_shapes)
        object.__setattr__(self, "_specs", specs)
        object.__setattr__(self, "_segments", _pack_segments(ops))

    def cache_to_time_major(self, cache):
        return [cache[0]] + [c.transpose(0, 2, 1) for c in cache[1:]]

    def cache_from_time_major(self, cache):
        return [cache[0]] + [c.transpose(0, 2, 1) for c in cache[1:]]

    def init_cache(self, batch: int, dtype=jnp.float32):
        out = [jnp.zeros((batch, 1, self.enc.wav_cache_len), dtype)]
        out += [jnp.zeros((batch, l, c), dtype)
                for (l, c) in self.cache_shapes]
        return out

    def step(self, params, cache, x: jnp.ndarray
             ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """x: [B, 1, hop*L] -> (latents [B, dim, L], new_cache)."""
        enc = self.enc
        B = x.shape[0]
        sb = min(self.block_streams, B)
        assert B % sb == 0, (B, sb)
        grid = B // sb
        wcl = enc.wav_cache_len
        wav = jnp.concatenate([cache[0], x], axis=-1)   # [B, 1, W+hop*L]
        new_cache: List[Optional[jnp.ndarray]] = [None] * len(cache)
        new_cache[0] = wav[:, :, wav.shape[-1] - wcl:]

        # spec branch outside the kernels (MXU matmuls on the wav ring);
        # log-mags enter segments as aux inputs, time-major
        aux_all: List[jnp.ndarray] = []
        for sd in self._specs:
            spec_obj = (enc.spec_post if sd["path"] == ("spec_post",)
                        else enc.stages[sd["stage"]][0])
            sfx = wav[:, :, wcl - (sd["n_fft"] - 1):]
            p_spec = _lookup(params, sd["path"])
            mag = spec_obj._spec(p_spec, sfx, pad=False)   # [B, F, L]
            aux_all.append(mag.swapaxes(1, 2))             # [B, L, F]

        # first segment input: the wav window feeding conv_pre, 2-D
        xk = wav[:, 0, wcl - (enc.kernel_size - 1):]       # [B, k-1+hop*L]
        x_cur: jnp.ndarray = xk

        ai_global = 0
        for seg in self._segments:
            weights = _prepare_weights(seg, params)
            slots = [o.cache_slot for o in seg if o.cache_slot is not None]
            caches_in = [cache[1 + s] for s in slots]
            n_aux = sum(1 for o in seg if o.kind == "mix")
            aux = aux_all[ai_global:ai_global + n_aux]
            ai_global += n_aux
            if x_cur.ndim == 2:
                # raw wav window; the dense1ch op consumes the k-1 history
                t_in, c_in = x_cur.shape[1], 1
                x_spec = pl.BlockSpec((sb, x_cur.shape[1]),
                                      lambda b: (b, 0),
                                      memory_space=pltpu.VMEM)
            else:
                t_in, c_in = x_cur.shape[1], x_cur.shape[2]
                x_spec = pl.BlockSpec((sb, t_in, c_in), lambda b: (b, 0, 0),
                                      memory_space=pltpu.VMEM)
            t_out, c_out = _segment_out_shape(seg, t_in, c_in)
            seg_bias = {}
            for i, o in enumerate(seg):
                if o.kind in ("pw", "dw", "dws", "convt", "post",
                              "dense1ch"):
                    seg_bias[i] = _lookup(
                        params, o.attrs["path"]).get("b") is not None
                elif o.kind == "mix":
                    seg_bias[i] = _lookup(
                        params,
                        o.attrs["path"])["layer"].get("b") is not None

            kernel = partial(_segment_kernel, seg, seg_bias, n_aux,
                             len(caches_in), len(weights))
            out_shapes = ([jax.ShapeDtypeStruct((B, t_out, c_out),
                                                jnp.float32)]
                          + [jax.ShapeDtypeStruct(c.shape, c.dtype)
                             for c in caches_in])
            in_specs = ([x_spec]
                        + [pl.BlockSpec((sb,) + a.shape[1:],
                                        lambda b: (b, 0, 0),
                                        memory_space=pltpu.VMEM)
                           for a in aux]
                        + [pl.BlockSpec((sb,) + c.shape[1:],
                                        lambda b: (b, 0, 0),
                                        memory_space=pltpu.VMEM)
                           for c in caches_in]
                        + [pl.BlockSpec(w.shape, lambda b: (0, 0),
                                        memory_space=pltpu.VMEM)
                           for w in weights])
            out_specs = ([pl.BlockSpec((sb, t_out, c_out),
                                       lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM)]
                         + [pl.BlockSpec((sb,) + c.shape[1:],
                                         lambda b: (b, 0, 0),
                                         memory_space=pltpu.VMEM)
                            for c in caches_in])
            outs = pl.pallas_call(
                kernel,
                grid=(grid,),
                out_shape=out_shapes,
                in_specs=in_specs,
                out_specs=out_specs,
                interpret=self.interpret,
                compiler_params=_COMPILER_PARAMS,
            )(x_cur, *aux, *caches_in, *weights)
            x_cur = outs[0]
            for s, nc in zip(slots, outs[1:]):
                new_cache[1 + s] = nc

        latents = x_cur.transpose(0, 2, 1)                 # [B, dim, L]
        return latents, new_cache
