"""Full codec assembly: encoder -> RVQ -> decoder, batch + streaming.

The user-facing API mirrors what the reference spreads over
models/hilcodec/models.py (training forward), streaming.py (deployment) and
test_onnx.py (the frame-loop driver): here `forward` is the training graph
and `encode_stream`/`decode_stream` are jit-once `lax.scan`s over frames
whose carry is the reference-ordered cache list.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import rvq as Q
from ..ops import pallas_rvq as PQ
from .hilcodec import HILCodec

Params = Dict[str, Any]


def _megakernel_supported(codec) -> bool:
    dec = getattr(codec, "decoder", None)
    return (isinstance(codec, HILCodec)
            and getattr(dec, "skip", None) == "identity"
            and not getattr(dec, "act_all", False))


# Measured on v5e (bench.py A/B, frame-by-frame streaming): the fused
# frame megakernels TIE the XLA scan path at 1 stream (23.6x vs 23.2x)
# and LOSE above it (380x vs 505x @ 8 streams, 984x vs 1717x @ 128) —
# XLA pipelines its ~55 small fusions across the scan better than the
# VMEM-resident segment kernels execute their ops serially at low VPU
# occupancy. So auto never selects them; they stay available via
# megakernel=True (and bench.py --megakernel) as the measured road not
# taken, and as the base for future sub-frame-latency work where a
# single-kernel frame step is the only way to cut dispatch floor.
_MEGAKERNEL_MAX_STREAMS = 0


def _auto_megakernel(codec, batch: int) -> bool:
    import jax
    return (jax.default_backend() in ("tpu", "axon")
            and batch <= _MEGAKERNEL_MAX_STREAMS
            and _megakernel_supported(codec))


def _resolve_chunks(stream_chunks, batch: int) -> int:
    """None -> groups of 128 for large batches (measured v5e sweet spot:
    groups of exactly 128 recover the peak fusion regime — 512 streams
    885x flat vs 1514x chunked); explicit int is taken as-is."""
    if stream_chunks is not None:
        return stream_chunks
    if batch > 256 and batch % 128 == 0:
        return batch // 128
    return 1


def _pick_stream_block(batch: int, cap: int = 32) -> int:
    """Largest divisor of `batch` that is <= cap (VMEM activation budget)."""
    for sb in range(min(cap, batch), 0, -1):
        if batch % sb == 0:
            return sb
    return 1


@functools.lru_cache(maxsize=16)
def _decoder_megakernel(decoder, block_streams: int, interpret: bool):
    from ..ops.pallas_decoder import DecoderMegakernel
    return DecoderMegakernel(decoder, block_streams=block_streams,
                             interpret=interpret)


@functools.lru_cache(maxsize=16)
def _encoder_megakernel(encoder, block_streams: int, interpret: bool):
    from ..ops.pallas_encoder import EncoderMegakernel
    return EncoderMegakernel(encoder, block_streams=block_streams,
                             interpret=interpret)


def cast_streaming_params(params: Params, dtype=jnp.bfloat16,
                          kernels_only: bool = True) -> Params:
    """Deployment-time precision cast of a folded param tree.

    kernels_only=True casts only rank>=3 leaves — the conv kernels, which
    carry ~all the parameter bytes. On TPU, XLA's DEFAULT precision already
    feeds bf16-rounded operands to the MXU for f32 convs, so storing the
    kernels in bf16 changes no MXU input bits while halving the per-frame
    weight reads from HBM; biases/scales stay f32 and keep accumulating in
    f32. kernels_only=False casts every leaf (full-bf16 deployment).
    RVQ codebooks live in vq_state, not here, and always stay f32 — token
    identity is decided in the f32 distance GEMM (ops/rvq.py:43-48)
    regardless of this cast."""
    def leaf(x):
        if getattr(x, "ndim", 0) >= 3 or not kernels_only:
            return x.astype(dtype)
        return x
    return jax.tree.map(leaf, params)


@dataclasses.dataclass(frozen=True)
class CodecModel:
    """HILCodec + ResidualVQ bundle built from a reference YAML config."""
    codec: HILCodec
    vq: Q.ResidualVQ

    @classmethod
    def from_config(cls, model_kwargs: Dict[str, Any]) -> "CodecModel":
        vq_kwargs = dict(model_kwargs.get("vq_kwargs", {}))
        codec = HILCodec.from_config(model_kwargs)
        # `vq:` config routing (reference models.py:101-106): "ResidualVQ"
        # builds the quantizer, "" runs the codec without one (ablation),
        # anything else is rejected.
        vq_name = model_kwargs.get("vq", "ResidualVQ")
        if vq_name == "":
            return cls(codec, Q.NoVQ())
        if vq_name == "ResidualShapeGainVQ":
            # gain/shape product VQ (reference
            # modules/vector_quantize.py:198-372) behind the same trainer
            # interface; token encode/decode stays Euclidean-only (the
            # reference never deploys shape-gain either)
            from ..ops.shape_gain import ShapeGainVQBridge
            return cls(codec, ShapeGainVQBridge.from_kwargs(vq_kwargs))
        if vq_name != "ResidualVQ":
            raise ValueError(f"Unknown vq: {vq_name!r} (supported: "
                             f"'ResidualVQ', 'ResidualShapeGainVQ', '')")
        vq = Q.ResidualVQ(
            dim=vq_kwargs.get("dim", 128),
            codebook_size=vq_kwargs.get("codebook_size", 1024),
            num_quantizers=vq_kwargs.get("num_quantizers", 8),
            kmeans_init=vq_kwargs.get("kmeans_init", True),
            decay=vq_kwargs.get("decay", 0.99),
            ema_num_threshold=vq_kwargs.get("ema_num_threshold", 0.0),
            ema_num_initial=vq_kwargs.get("ema_num_initial", 1.0),
            dropout=vq_kwargs.get("dropout", False),
            dropout_index=tuple(vq_kwargs["dropout_index"])
            if vq_kwargs.get("dropout_index") else None,
            channel_last=False,
        )
        return cls(codec, vq)

    @property
    def hop_length(self) -> int:
        return self.codec.hop_length

    def init(self, key: jax.Array) -> Tuple[Params, Q.VQState]:
        k1, k2 = jax.random.split(key)
        return self.codec.init(k1), self.vq.init_state(k2)

    # -- training graph -----------------------------------------------------
    def forward(self, params: Params, vq_state: Q.VQState, wav: jnp.ndarray,
                key: jax.Array, n: Optional[jnp.ndarray] = None,
                training: bool = True, axis_name: Optional[str] = None
                ) -> Tuple[jnp.ndarray, Q.VQState, jnp.ndarray, jnp.ndarray]:
        """wav [B, 1, T] -> (wav_g [B, 1, T], new_vq_state, loss_vq,
        num_replaces). Matches models.py:111-118."""
        z = self.codec.encoder.apply(params["encoder"], wav)
        # VQ always runs f32: EMA statistics, k-means init and the
        # distance argmin (token identity) must not degrade under a bf16
        # compute dtype (mixed-precision training casts wav/params only).
        q, vq_state, loss_vq, num_replaces, _idx = self.vq(
            z.astype(jnp.float32), vq_state, key, n=n, training=training,
            axis_name=axis_name)
        wav_g = self.codec.decoder.apply(params["decoder"],
                                         q.astype(z.dtype))
        return wav_g.astype(jnp.float32), vq_state, loss_vq, num_replaces

    # -- offline (whole-utterance) coding -----------------------------------
    def encode(self, params: Params, vq_state: Q.VQState, wav: jnp.ndarray,
               n: Optional[int] = None) -> jnp.ndarray:
        """wav [B, 1, T] -> tokens [n, B, T/hop] (int32)."""
        if isinstance(self.vq, Q.NoVQ):
            raise ValueError("codec built with vq: '' has no quantizer; "
                             "token encode/decode is unavailable")
        z = self.codec.encoder.apply(params["encoder"], wav)
        return PQ.quantize(z.swapaxes(1, 2), vq_state["embed"], n=n)

    def decode(self, params: Params, vq_state: Q.VQState,
               tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens [n, B, T'] -> wav [B, 1, T'*hop]."""
        q = Q.dequantize(tokens, vq_state["embed"])
        return self.codec.decoder.apply(params["decoder"], q.swapaxes(1, 2))

    # -- streaming ----------------------------------------------------------
    def encode_stream(self, params: Params, vq_state: Q.VQState,
                      wav: jnp.ndarray, cache: List[jnp.ndarray],
                      n: Optional[int] = None,
                      frames_per_step: int = 1,
                      megakernel: Optional[bool] = None,
                      megakernel_interpret: bool = False,
                      unroll: int = 1,
                      stream_chunks: Optional[int] = None
                      ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """Streaming encode via lax.scan over frame blocks.

        unroll>1 unrolls the frame loop so XLA can schedule fusions across
        adjacent frames — a lever for the dispatch-bound per-frame step
        (latency per frame is unchanged; only throughput mode benefits).

        stream_chunks=G processes the B streams as G sequential groups
        *within each frame step* (an inner lax.map): per-frame latency
        grows ~G-fold but stays far under the 13.3 ms deadline, and every
        op sees B/G-sized tensors — the fix for the large-B throughput
        cliff where XLA falls out of its fused in-place cache-update
        regime. Measured on v5e: 512 streams 885x flat -> 1514x with
        G=4, 384 streams 1442x -> 1518x with G=3; groups of exactly 128
        are what recovers the peak regime (192 with G=2, i.e. groups of
        96, measured *worse*). None auto-selects G=B/128 when B>256 and
        128 | B; pass 1 to force the flat path (the exact-parity mode —
        chunked results are allclose but may differ in final ulps).
        Streaming semantics hold: all B streams emit every frame on time.

        wav [B, 1, T] with T = hop * L, L divisible by frames_per_step.
        Returns (tokens [n, B, L], new_cache). One compiled program per
        (B, frames_per_step) shape. megakernel=True runs the fused Pallas
        encoder-frame kernel (ops/pallas_encoder.py; measured slower than
        the XLA scan at every stream count, see models/codec.py top note);
        the spec branch and the fused RVQ stay MXU matmuls either way.
        """
        hop = self.hop_length
        B = wav.shape[0]
        L = wav.shape[-1] // hop
        blocks = L // frames_per_step
        xs = wav.reshape(B, 1, blocks, frames_per_step * hop)
        xs = jnp.moveaxis(xs, 2, 0)          # [blocks, B, 1, hop*f]
        books = vq_state["embed"]
        if megakernel is None:
            megakernel = (_auto_megakernel(self.codec, B)
                          and not self.codec.encoder.spec_learnable)

        if megakernel:
            mk = _encoder_megakernel(self.codec.encoder,
                                     _pick_stream_block(B),
                                     megakernel_interpret)
            cache = mk.cache_to_time_major(cache)

        G = 1 if megakernel else _resolve_chunks(stream_chunks, B)
        if G > 1:
            assert B % G == 0, (B, G)
            cache = [c.reshape(G, B // G, *c.shape[1:]) for c in cache]

        def body(cache, x):
            if megakernel:
                z, cache = mk.step(params["encoder"], cache, x)
                idx = PQ.quantize(z.swapaxes(1, 2), books, n=n)
            elif G > 1:
                xg = x.reshape(G, B // G, *x.shape[1:])

                def one(args):
                    cg, xc = args
                    zc, cg = self.codec.encoder.step(params["encoder"],
                                                     list(cg), xc)
                    return PQ.quantize(zc.swapaxes(1, 2), books, n=n), cg

                idx_g, cache = jax.lax.map(one, (cache, xg))
                # [G, n, B/G, f] -> [n, B, f]
                idx = jnp.moveaxis(idx_g, 0, 1).reshape(
                    idx_g.shape[1], B, idx_g.shape[-1])
            else:
                z, cache = self.codec.encoder.step(params["encoder"],
                                                   cache, x)
                # fused Pallas RVQ on TPU (token-bit-exact vs scan path)
                idx = PQ.quantize(z.swapaxes(1, 2), books, n=n)
            return cache, idx

        cache, tokens = jax.lax.scan(body, cache, xs, unroll=unroll)
        if megakernel:
            cache = mk.cache_from_time_major(cache)
        if G > 1:
            cache = [c.reshape(B, *c.shape[2:]) for c in cache]
        # tokens: [blocks, n, B, f] -> [n, B, blocks*f]
        tokens = jnp.moveaxis(tokens, 0, 2).reshape(
            tokens.shape[1], B, L)
        return tokens, cache

    def decode_stream(self, params: Params, vq_state: Q.VQState,
                      tokens: jnp.ndarray, cache: List[jnp.ndarray],
                      frames_per_step: int = 1,
                      megakernel: Optional[bool] = None,
                      megakernel_interpret: bool = False,
                      unroll: int = 1,
                      stream_chunks: Optional[int] = None
                      ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """tokens [n, B, L] -> (wav [B, 1, L*hop], new_cache).

        unroll, stream_chunks: see encode_stream.

        megakernel=True runs the fused Pallas decoder-frame kernel for
        HILCodec (ops/pallas_decoder.py): the whole per-frame decoder as a
        handful of VMEM-resident kernels instead of ~55 XLA fusions. On
        v5e this measured slower than the XLA scan at every stream count
        (see models/codec.py top note), so auto (None) keeps the scan.
        The cache list layout/order handed in and out is unchanged.
        """
        n, B, L = tokens.shape
        blocks = L // frames_per_step
        xs = tokens.reshape(n, B, blocks, frames_per_step)
        xs = jnp.moveaxis(xs, 2, 0)          # [blocks, n, B, f]
        books = vq_state["embed"]

        dtype = cache[0].dtype if cache else jnp.float32
        if megakernel is None:
            megakernel = _auto_megakernel(self.codec, B)

        if megakernel:
            mk = _decoder_megakernel(self.codec.decoder,
                                     _pick_stream_block(B),
                                     megakernel_interpret)
            cache_tm = mk.cache_to_time_major(cache)

            def body_mk(cache_tm, idx):
                q = Q.dequantize(idx, books).astype(dtype)
                y, cache_tm = mk.step(params["decoder"], cache_tm,
                                      q.swapaxes(1, 2))
                return cache_tm, y

            cache_tm, wavs = jax.lax.scan(body_mk, cache_tm, xs,
                                          unroll=unroll)
            cache = mk.cache_from_time_major(cache_tm)
            wav = jnp.moveaxis(wavs, 0, 2).reshape(B, 1, -1)
            return wav, cache

        G = _resolve_chunks(stream_chunks, B)
        if G > 1:
            assert B % G == 0, (B, G)
            cache = [c.reshape(G, B // G, *c.shape[1:]) for c in cache]

            def body_g(cache, idx):
                # idx: [n, B, f] -> per-chunk [n, B/G, f]
                idx_g = jnp.moveaxis(
                    idx.reshape(idx.shape[0], G, B // G, idx.shape[-1]),
                    1, 0)

                def one(args):
                    cg, ic = args
                    q = Q.dequantize(ic, books).astype(dtype)
                    y, cg = self.codec.decoder.step(
                        params["decoder"], list(cg), q.swapaxes(1, 2))
                    return y, cg

                y_g, cache = jax.lax.map(one, (cache, idx_g))
                # [G, B/G, 1, f*hop] -> [B, 1, f*hop]
                return cache, y_g.reshape(B, *y_g.shape[2:])

            cache, wavs = jax.lax.scan(body_g, cache, xs, unroll=unroll)
            cache = [c.reshape(B, *c.shape[2:]) for c in cache]
            wav = jnp.moveaxis(wavs, 0, 2).reshape(B, 1, -1)
            return wav, cache

        def body(cache, idx):
            q = Q.dequantize(idx, books).astype(dtype)
            y, cache = self.codec.decoder.step(params["decoder"], cache,
                                               q.swapaxes(1, 2))
            return cache, y

        cache, wavs = jax.lax.scan(body, cache, xs, unroll=unroll)
        # wavs: [blocks, B, 1, f*hop] -> [B, 1, T]
        wav = jnp.moveaxis(wavs, 0, 2).reshape(B, 1, -1)
        return wav, cache

    def encode_decode_stream(self, params: Params, vq_state: Q.VQState,
                             wav: jnp.ndarray, cache_enc: List[jnp.ndarray],
                             cache_dec: List[jnp.ndarray],
                             n: Optional[int] = None,
                             frames_per_step: int = 1, unroll: int = 1
                             ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                        List[jnp.ndarray],
                                        List[jnp.ndarray]]:
        """Fused streaming enc+dec: ONE lax.scan whose body runs
        encoder-step -> RVQ -> dequant -> decoder-step for each frame.

        vs encode_stream-then-decode_stream this halves the while-loop
        iteration count (one loop over frames instead of two) and never
        materializes the full token array between the two scans — a
        throughput lever for the per-frame-step serving program where
        fixed per-iteration costs are a visible fraction of the 13.33 ms
        frame budget. Token/wav outputs are bitwise those of the two-scan
        path (same per-frame math, same order).

        wav [B, 1, T] -> (tokens [n, B, L], wav_out [B, 1, T], new caches).
        """
        hop = self.hop_length
        B = wav.shape[0]
        L = wav.shape[-1] // hop
        blocks = L // frames_per_step
        xs = wav.reshape(B, 1, blocks, frames_per_step * hop)
        xs = jnp.moveaxis(xs, 2, 0)          # [blocks, B, 1, hop*f]
        books = vq_state["embed"]
        dec_dtype = cache_dec[0].dtype if cache_dec else jnp.float32

        def body(carry, x):
            ce, cd = carry
            z, ce = self.codec.encoder.step(params["encoder"], ce, x)
            idx = PQ.quantize(z.swapaxes(1, 2), books, n=n)
            q = Q.dequantize(idx, books).astype(dec_dtype)
            y, cd = self.codec.decoder.step(params["decoder"], cd,
                                            q.swapaxes(1, 2))
            return (ce, cd), (idx, y)

        (cache_enc, cache_dec), (tokens, wavs) = jax.lax.scan(
            body, (cache_enc, cache_dec), xs, unroll=unroll)
        tokens = jnp.moveaxis(tokens, 0, 2).reshape(tokens.shape[1], B, L)
        wav_out = jnp.moveaxis(wavs, 0, 2).reshape(B, 1, -1)
        return tokens, wav_out, cache_enc, cache_dec

    def init_cache(self, batch: int, dtype=jnp.float32):
        return self.codec.init_cache(batch, dtype)

    def fold_params(self, params: Params) -> Params:
        """Deployment-time weight-norm removal + scale merging; identity
        for families without foldable reparameterizations."""
        if hasattr(self.codec, "fold_params"):
            return self.codec.fold_params(params)
        return params
