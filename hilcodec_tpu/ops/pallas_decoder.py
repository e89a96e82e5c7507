"""Fused Pallas decoder-frame megakernel.

The streaming decoder step (models/hilcodec.py Decoder.step) lowers to ~55
XLA fusions per frame; at 128 concurrent streams each fusion round-trips
multi-MB activation tensors through HBM, which dominates the ~1 ms step.
This module re-expresses the whole per-frame decoder as a handful of Pallas
kernels ("segments") that keep all intermediate activations in VMEM: per
frame the only HBM traffic is the folded weights (26 MB, streamed once),
the per-layer caches (44 kB/stream) and the in/out frames.

Segmentation: the full decoder's folded weights (26 MB f32) exceed VMEM
(~16 MB/core), so the op chain is greedily packed into segments whose
weight footprint stays under a budget; residual blocks are atomic (their
skip tensor lives in kernel registers). The speech config packs into 7
segments vs the ~55-fusion baseline.

Kernel math mirrors ops/conv.py exactly:
  * depthwise causal conv step (causal_conv1d_step): concat cache on the
    time axis, slide k windows, keep the last d*(k-1) samples;
  * depthwise transposed conv step (causal_conv_transpose1d_step,
    cache_len=1 for k=2r,s=r): y[t*r+i] = xc[t]*w[i+r] + xc[t+1]*w[i]
    (verified numerically against the lax formulation);
  * pointwise convs are [SB*T, Cin] @ [Cin, Cout] MXU matmuls.

Reference semantics: models/hilcodec/streaming.py:599-648 (Decoder.forward
with explicit caches); cache list order identical to Decoder.init_cache,
but time-major ([B, L, C]) so channels ride the TPU lane dimension —
convert once per stream with `cache_to_time_major` / `cache_from_...`.
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

# ---------------------------------------------------------------------------
# op list construction (trace-time only; weights referenced by param path)
# ---------------------------------------------------------------------------

# each op: (kind, attrs dict). Weight tensors are looked up from the folded
# param tree when the step runs, so the kernel is rebuilt only per SHAPE.

_WEIGHT_BUDGET = 6 * 2 ** 20          # bytes of weights per segment

# The default scoped-VMEM limit is 16 MiB; v5e has 128 MiB of VMEM. Segments
# hold all their weights + a stream-block of activations resident, so raise
# the cap (leaving headroom for XLA's own scoped allocations in the while
# body that hosts the kernel).
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 2 ** 20)


def _elu(x):
    # expm1 has no Mosaic TPU lowering; exp(min(x,0))-1 matches ELU for the
    # x<=0 branch (abs error <= f32 eps) and avoids overflow on the dead
    # branch of the where.
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _act_fn(name: str):
    return {"ELU": _elu, "ReLU": jax.nn.relu,
            "Tanh": jnp.tanh, "Identity": lambda x: x}[name]


@dataclasses.dataclass
class _Op:
    kind: str                 # pw | dw | convt | act | scale | res_begin
    #                           | res_end | post
    attrs: Dict[str, Any]
    weight_bytes: int = 0
    cache_slot: Optional[int] = None   # index into the flat cache list
    atomic_group: int = -1             # resblock id (atomic for packing)


def _decoder_ops(dec) -> Tuple[List[_Op], List[Tuple[int, int]], int]:
    """Flatten the Decoder spec into the op list.

    Returns (ops, cache_shapes [(L, C)...] in reference order, in_dim)."""
    assert dec.skip == "identity", "megakernel supports identity skips"
    assert not dec.act_all, "megakernel supports act_all=False"
    assert (dec.activation_params or {}).get("alpha", 1.0) == 1.0
    ops: List[_Op] = []
    cache_shapes: List[Tuple[int, int]] = []
    group = 0

    def f32(*shape):
        return 4 * int(np.prod(shape))

    mult = int(2 ** len(dec.ratios))
    c = mult * dec.n_filters
    # pre_pw (1x1, no bias) + pre_dw (k, depthwise, bias)
    ops.append(_Op("pw", dict(path=("pre_pw",), cin=dec.dimension, cout=c),
                   f32(dec.dimension, c)))
    k = dec.kernel_size
    cache_shapes.append((k - 1, c))
    ops.append(_Op("dw", dict(path=("pre_dw",), k=k, d=1, c=c),
                   f32(k, c), cache_slot=0))

    for si, ratio in enumerate(dec.ratios):
        ops.append(_Op("act", dict(name=dec.activation)))
        cache_shapes.append((1, c))
        ops.append(_Op("convt", dict(path=("stages", si, "up_dw"), r=ratio,
                                     c=c),
                       f32(2 * ratio, c), cache_slot=len(cache_shapes) - 1))
        ops.append(_Op("pw", dict(path=("stages", si, "up_pw"), cin=c,
                                  cout=c // 2),
                       f32(c, c // 2)))
        c //= 2
        kr = dec.residual_kernel_size
        for bi in range(dec.n_residual_layers):
            group += 1
            pre = ((1 + bi * dec.res_scale ** 2) ** -0.5
                   if dec.res_scale is not None else None)
            ops.append(_Op("res_begin", dict(pre_scale=pre),
                           atomic_group=group))
            dils = (dec.dilation_base ** bi, 1)
            for di, d in enumerate(dils):
                base = ("stages", si, "blocks", bi, "blocks", di)
                ops.append(_Op("act", dict(name=dec.activation),
                               atomic_group=group))
                ops.append(_Op("pw", dict(path=base + ("pointwise",),
                                          cin=c, cout=c),
                               f32(c, c), atomic_group=group))
                cache_shapes.append((d * (kr - 1), c))
                ops.append(_Op("dw", dict(path=base + ("depthwise",),
                                          k=kr, d=d, c=c),
                               f32(kr, c),
                               cache_slot=len(cache_shapes) - 1,
                               atomic_group=group))
            ops.append(_Op("res_end", dict(), atomic_group=group))
        scale = (None if dec.res_scale is None else
                 (1 + dec.n_residual_layers * dec.res_scale ** 2) ** -0.5)
        if scale is not None:
            ops.append(_Op("scale", dict(s=scale)))

    ops.append(_Op("act", dict(name=dec.activation)))
    kp = dec.last_kernel_size
    cache_shapes.append((kp - 1, c))
    ops.append(_Op("post", dict(path=("conv_post",), k=kp, c=c),
                   f32(kp, c), cache_slot=len(cache_shapes) - 1))
    if dec.final_activation:
        ops.append(_Op("act", dict(name=dec.final_activation)))
    return ops, cache_shapes, dec.dimension


def _pack_segments(ops: List[_Op]) -> List[List[_Op]]:
    """Greedy weight-budget packing; resblocks are atomic."""
    groups: List[List[_Op]] = []
    i = 0
    while i < len(ops):
        g = ops[i].atomic_group
        if g >= 0:
            j = i
            while j < len(ops) and ops[j].atomic_group == g:
                j += 1
            groups.append(ops[i:j])
            i = j
        else:
            groups.append([ops[i]])
            i += 1
    segments: List[List[_Op]] = []
    cur: List[_Op] = []
    cur_bytes = 0
    for grp in groups:
        b = sum(o.weight_bytes for o in grp)
        if cur and cur_bytes + b > _WEIGHT_BUDGET:
            segments.append(cur)
            cur, cur_bytes = [], 0
        cur.extend(grp)
        cur_bytes += b
    if cur:
        segments.append(cur)
    return segments


# ---------------------------------------------------------------------------
# weight preparation (jnp, outside the kernels; hoisted out of the scan)
# ---------------------------------------------------------------------------

def _lookup(params: Dict[str, Any], path: Tuple) -> Dict[str, Any]:
    node: Any = params
    for p in path:
        node = node[p]
    return node


def _prepare_weights(ops: Sequence[_Op], params) -> List[jnp.ndarray]:
    """Kernel-layout weight arrays, in op order."""
    out: List[jnp.ndarray] = []
    for op in ops:
        a = op.attrs
        if op.kind == "pw":
            p = _lookup(params, a["path"])
            out.append(p["w"][:, :, 0].T)                 # [Cin, Cout]
            if p.get("b") is not None:
                out.append(p["b"][None, :])               # [1, Cout]
        elif op.kind == "mix":
            p = _lookup(params, a["path"])["layer"]
            out.append(p["w"][:, :, 0].T)                 # [F, C]
            if p.get("b") is not None:
                out.append(p["b"][None, :])
        elif op.kind in ("dw", "dws"):
            p = _lookup(params, a["path"])
            out.append(p["w"][:, 0, :].T)                 # [k, C]
            if p.get("b") is not None:
                out.append(p["b"][None, :])
        elif op.kind == "dense1ch":
            p = _lookup(params, a["path"])
            out.append(p["w"][:, 0, :].T)                 # [k, C]
            if p.get("b") is not None:
                out.append(p["b"][None, :])
        elif op.kind == "convt":
            p = _lookup(params, a["path"])
            r = a["r"]
            out.append(p["w"][:, 0, r:].T)                # wA [r, C]
            out.append(p["w"][:, 0, :r].T)                # wB [r, C]
            if p.get("b") is not None:
                out.append(p["b"][None, :])
        elif op.kind == "post":
            p = _lookup(params, a["path"])
            out.append(p["w"][0].T)                       # [k, C]
            if p.get("b") is not None:
                out.append(p["b"][None, :1])              # [1, 1]
    return out


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------

def _segment_kernel(ops: Sequence[_Op], bias_flags: Dict[int, bool],
                    n_aux: int, n_cache: int, n_weights: int, *refs):
    """refs: x, aux..., caches_in..., weights..., y, caches_out..."""
    x_ref = refs[0]
    aux = refs[1:1 + n_aux]
    cache_in = refs[1 + n_aux:1 + n_aux + n_cache]
    weights = refs[1 + n_aux + n_cache:1 + n_aux + n_cache + n_weights]
    y_ref = refs[1 + n_aux + n_cache + n_weights]
    cache_out = refs[2 + n_aux + n_cache + n_weights:]

    x = x_ref[:].astype(jnp.float32)            # [SB, T, C]
    if x.ndim == 2:                             # raw 1-channel wav window
        x = x[:, :, None]
    wi = 0
    ci = 0
    ai = 0
    skip = None

    for oi, op in enumerate(ops):
        a = op.attrs
        if op.kind == "act":
            x = _act_fn(a["name"])(x)
        elif op.kind == "scale":
            x = x * jnp.float32(a["s"])
        elif op.kind == "res_begin":
            skip = x
            if a["pre_scale"] is not None:
                x = x * jnp.float32(a["pre_scale"])
        elif op.kind == "res_end":
            x = x + skip
            skip = None
        elif op.kind == "pw":
            w = weights[wi][:]
            wi += 1
            sb, t, cin = x.shape
            y = jnp.dot(x.reshape(sb * t, cin), w,
                        preferred_element_type=jnp.float32)
            if bias_flags[oi]:
                y = y + weights[wi][:]
                wi += 1
            x = y.reshape(sb, t, w.shape[1])
        elif op.kind == "dw":
            k, d = a["k"], a["d"]
            clen = d * (k - 1)
            xc = jnp.concatenate([cache_in[ci][:].astype(jnp.float32), x],
                                 axis=1)
            cache_out[ci][:] = xc[:, xc.shape[1] - clen:, :]
            ci += 1
            w = weights[wi][:]
            wi += 1
            t = x.shape[1]
            y = None
            for j in range(k):
                term = xc[:, j * d:j * d + t, :] * w[j][None, None, :]
                y = term if y is None else y + term
            if bias_flags[oi]:
                y = y + weights[wi][:][None]
                wi += 1
            x = y
        elif op.kind == "convt":
            r = a["r"]
            xc = jnp.concatenate([cache_in[ci][:].astype(jnp.float32), x],
                                 axis=1)
            cache_out[ci][:] = x[:, -1:, :]
            ci += 1
            wA = weights[wi][:]
            wB = weights[wi + 1][:]
            wi += 2
            sb, tc, c = xc.shape
            t = tc - 1
            # y[:, t*r+i, :] = xc[:, t]*wA[i] + xc[:, t+1]*wB[i].
            # Interleave via stack on a fresh axis-2 + a lane-preserving
            # reshape [SB, t, r, C] -> [SB, t*r, C] (Mosaic-verified). A
            # 4-D transpose here lowers as an unsupported >2-D gather, and
            # a concat-along-lanes reshape is an unsupported shape cast.
            xa, xb = xc[:, :t, :], xc[:, 1:, :]
            phases = [xa * wA[i][None, None, :] + xb * wB[i][None, None, :]
                      for i in range(r)]
            y = jnp.stack(phases, axis=2).reshape(sb, t * r, c)
            if bias_flags[oi]:
                y = y + weights[wi][:][None]
                wi += 1
            x = y
        elif op.kind == "post":
            k = a["k"]
            xc = jnp.concatenate([cache_in[ci][:].astype(jnp.float32), x],
                                 axis=1)
            cache_out[ci][:] = xc[:, xc.shape[1] - (k - 1):, :]
            ci += 1
            w = weights[wi][:]
            wi += 1
            t = x.shape[1]
            y = None
            for j in range(k):
                term = jnp.sum(xc[:, j:j + t, :] * w[j][None, None, :],
                               axis=-1)
                y = term if y is None else y + term       # [SB, T]
            if bias_flags[oi]:
                y = y + weights[wi][0, 0]
                wi += 1
            x = y[:, :, None]                             # [SB, T, 1]
        elif op.kind == "dense1ch":
            # conv_pre from 1 input channel: x [SB, T+k-1, 1] wav window,
            # w [k, C] -> y[SB, T, C] = sum_j wav[t+j] * w[j]
            k = a["k"]
            w = weights[wi][:]
            wi += 1
            t = x.shape[1] - (k - 1)
            y = None
            for j in range(k):
                term = x[:, j:j + t, :] * w[j][None, None, :]
                y = term if y is None else y + term
            if bias_flags[oi]:
                y = y + weights[wi][:][None]
                wi += 1
            x = y
        elif op.kind == "mix":
            # SpecBlock residual mix (folded): x += spec_mag @ W + b
            spec = aux[ai][:].astype(jnp.float32)         # [SB, T, F]
            ai += 1
            w = weights[wi][:]
            wi += 1
            sb, t, f = spec.shape
            y = jnp.dot(spec.reshape(sb * t, f), w,
                        preferred_element_type=jnp.float32)
            if bias_flags[oi]:
                y = y + weights[wi][:]
                wi += 1
            x = x + y.reshape(sb, t, w.shape[1])
        elif op.kind == "dws":
            # strided depthwise downsample, k = 2s (cache k-s = s frames):
            # y[t] = sum_j xc[t*s+j] * w[j]; xc reshaped [T/s+1, s] so
            # j = a*s+b -> xr[t+a, b]
            k, s = a["k"], a["s"]
            assert k == 2 * s
            xc = jnp.concatenate([cache_in[ci][:].astype(jnp.float32), x],
                                 axis=1)
            cache_out[ci][:] = xc[:, xc.shape[1] - (k - s):, :]
            ci += 1
            w = weights[wi][:]
            wi += 1
            sb, tc, c = xc.shape
            tout = (tc - s) // s
            # Lane-preserving split [SB, tc, C] -> [SB, tc/s, s, C] + static
            # phase index (Mosaic-verified; strided time slices lower as an
            # unsupported >2-D gather).
            xr = xc.reshape(sb, tc // s, s, c)
            y = None
            for b_ in range(s):
                term = (xr[:, :tout, b_, :] * w[b_][None, None, :]
                        + xr[:, 1:tout + 1, b_, :]
                        * w[s + b_][None, None, :])
                y = term if y is None else y + term
            if bias_flags[oi]:
                y = y + weights[wi][:][None]
                wi += 1
            x = y
        elif op.kind == "l2norm":
            n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
            x = x / jnp.maximum(n, a["eps"])
            if a["inout_norm"]:
                x = x * jnp.float32(a["c"] ** 0.5)
        else:  # pragma: no cover
            raise ValueError(op.kind)

    y_ref[:] = x.astype(y_ref.dtype)


# ---------------------------------------------------------------------------
# public driver
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DecoderMegakernel:
    """Builds per-shape fused step functions for a Decoder spec.

    Use `step(folded_params, cache_tm, q)`; caches are TIME-MAJOR
    ([B, L, C]) in the reference flat order — convert with
    `cache_to_time_major`."""
    dec: Any
    block_streams: int = 32
    interpret: bool = False

    def __post_init__(self):
        ops, cache_shapes, in_dim = _decoder_ops(self.dec)
        object.__setattr__(self, "_ops", ops)
        object.__setattr__(self, "cache_shapes", cache_shapes)
        object.__setattr__(self, "in_dim", in_dim)
        object.__setattr__(self, "_segments", _pack_segments(ops))

    # -- cache layout conversion ------------------------------------------
    def cache_to_time_major(self, cache: List[jnp.ndarray]):
        return [c.transpose(0, 2, 1) for c in cache]

    def cache_from_time_major(self, cache: List[jnp.ndarray]):
        return [c.transpose(0, 2, 1) for c in cache]

    def init_cache(self, batch: int, dtype=jnp.float32):
        return [jnp.zeros((batch, l, c), dtype)
                for (l, c) in self.cache_shapes]

    # -- the fused step -----------------------------------------------------
    def step(self, params, cache: List[jnp.ndarray], q: jnp.ndarray
             ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """q: [B, dim, L] latent frames -> (wav [B, 1, L*hop], new_cache)."""
        B = q.shape[0]
        L = q.shape[-1]
        sb = min(self.block_streams, B)
        assert B % sb == 0, (B, sb)
        grid = B // sb

        x = q.transpose(0, 2, 1)                     # [B, L, dim]
        new_cache: List[Optional[jnp.ndarray]] = [None] * len(cache)

        for seg in self._segments:
            weights = _prepare_weights(seg, params)
            slots = [o.cache_slot for o in seg if o.cache_slot is not None]
            caches_in = [cache[s] for s in slots]
            t_in = x.shape[1]
            # static shape walk to size the outputs
            t_out, c_out = _segment_out_shape(seg, t_in, x.shape[2])
            n_cache = len(caches_in)
            n_weights = len(weights)
            seg_bias = {}
            for i, o in enumerate(seg):
                if o.kind in ("pw", "dw", "convt", "post"):
                    seg_bias[i] = _lookup(params,
                                          o.attrs["path"]).get("b") is not None

            kernel = partial(_segment_kernel, seg, seg_bias, 0, n_cache,
                             n_weights)
            out_shapes = ([jax.ShapeDtypeStruct((B, t_out, c_out),
                                                jnp.float32)]
                          + [jax.ShapeDtypeStruct(c.shape, c.dtype)
                             for c in caches_in])
            in_specs = ([pl.BlockSpec((sb, t_in, x.shape[2]),
                                      lambda b: (b, 0, 0),
                                      memory_space=pltpu.VMEM)]
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
            )(x, *caches_in, *weights)
            x = outs[0]
            for s, nc in zip(slots, outs[1:]):
                new_cache[s] = nc

        wav = x.transpose(0, 2, 1)                   # [B, 1, L*hop]
        return wav, [nc for nc in new_cache]


def _segment_out_shape(seg: Sequence[_Op], t: int, c: int
                       ) -> Tuple[int, int]:
    for op in seg:
        if op.kind == "pw":
            c = op.attrs["cout"]
        elif op.kind == "convt":
            t = t * op.attrs["r"]
        elif op.kind == "post":
            c = 1
        elif op.kind == "dense1ch":
            t, c = t - (op.attrs["k"] - 1), op.attrs["c"]
        elif op.kind == "dws":
            t = t // op.attrs["s"]
    return t, c
