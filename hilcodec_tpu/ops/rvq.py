"""Residual vector quantization: fused inference + functional EMA training.

Replaces the reference's per-stage modules and 8-12 separate VQ/deq ONNX
graphs (models/hilcodec/vector_quantize.py, streaming.py:25-157) with:

  * `quantize`: one jitted cascade — per stage a [B*T, C] x [C, K] distance
    GEMM on the MXU, first-index argmin, gather, residual subtract — rolled
    over stacked codebooks [n, K, C].
  * `dequantize`: sum of embedding lookups.
  * `vq_train_step`: functional EMA/k-means codebook learning with masked
    quantizer dropout, Laplace-free EMA normalization, dead-code expiry with
    replicated determinism (replica-0 candidates broadcast via all_gather),
    matching models/hilcodec/vector_quantize.py:62-243 semantics.

State pytree (all f32):
  embed     [n, K, C]   codebooks
  ema_embed [n, K, C]
  ema_num   [n, K]
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

VQState = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------

def _stage_indices(residual: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """First-min-index nearest codeword. residual [M, C], embed [K, C].

    Matches the streaming reference (streaming.py:57-64): distance includes
    the ||x||^2 term, argmax of the negated distance -> first minimum.
    """
    r32 = residual.astype(jnp.float32)
    e32 = embed.astype(jnp.float32)
    dist = (jnp.sum(r32 * r32, axis=1, keepdims=True)
            - 2.0 * jnp.dot(r32, e32.T, preferred_element_type=jnp.float32)
            + jnp.sum(e32 * e32, axis=1)[None, :])
    return jnp.argmax(-dist, axis=-1)


def quantize(x: jnp.ndarray, codebooks: jnp.ndarray,
             n: Optional[int] = None) -> jnp.ndarray:
    """x: [B, T, C]; codebooks: [n_q, K, C] -> indices [n, B, T] (int32)."""
    n_q = codebooks.shape[0] if n is None else n
    B, T, C = x.shape
    residual = x.reshape(B * T, C)

    def body(residual, embed):
        idx = _stage_indices(residual, embed)
        q = embed[idx]
        return residual - q.astype(residual.dtype), idx

    _, indices = jax.lax.scan(body, residual, codebooks[:n_q])
    return indices.reshape(n_q, B, T)


def dequantize(indices: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """indices: [n, B, T]; codebooks: [n_q, K, C] -> [B, T, C] sum of
    codewords (streaming.py:134-157 Dequantizer)."""
    n = indices.shape[0]

    def body(acc, inp):
        idx, embed = inp
        return acc + embed[idx], None

    B, T = indices.shape[1], indices.shape[2]
    C = codebooks.shape[-1]
    init = jnp.zeros((B, T, C), codebooks.dtype)
    out, _ = jax.lax.scan(body, init, (indices, codebooks[:n]))
    return out


def quantize_dequantize(x: jnp.ndarray, codebooks: jnp.ndarray,
                        n: Optional[int] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused encode-side path returning (quantized [B,T,C], indices)."""
    n_q = codebooks.shape[0] if n is None else n
    B, T, C = x.shape
    residual = x.reshape(B * T, C)

    def body(carry, embed):
        residual, acc = carry
        idx = _stage_indices(residual, embed)
        q = embed[idx].astype(residual.dtype)
        return (residual - q, acc + q), idx

    (_, q_out), indices = jax.lax.scan(
        body, (residual, jnp.zeros_like(residual)), codebooks[:n_q])
    return q_out.reshape(B, T, C), indices.reshape(n_q, B, T)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ResidualVQ:
    """Config mirror of reference ResidualVQ + EuclideanCodebook."""
    dim: int = 128
    codebook_size: int = 1024
    num_quantizers: int = 8
    kmeans_init: bool = True
    kmeans_iters: int = 20
    decay: float = 0.99
    eps: float = 1e-7
    ema_num_threshold: float = 0.5
    ema_num_initial: float = 0.5
    dropout: bool = True
    dropout_index: Optional[Tuple[int, ...]] = None
    channel_last: bool = False

    def init_state(self, key: jax.Array) -> VQState:
        n, K, C = self.num_quantizers, self.codebook_size, self.dim
        if self.kmeans_init:
            embed = jnp.zeros((n, K, C), jnp.float32)
            initted = jnp.zeros((), jnp.bool_)
        else:
            embed = jax.random.normal(key, (n, K, C), jnp.float32)
            initted = jnp.ones((), jnp.bool_)
        return {
            "embed": embed,
            "ema_embed": embed * self.ema_num_initial,
            "ema_num": jnp.full((n, K), self.ema_num_initial, jnp.float32),
            "initted": initted,
        }

    # -- k-means initialization (wrapper.initialize() warm-up path) --------
    def kmeans_init_state(self, state: VQState, x: jnp.ndarray,
                          key: jax.Array,
                          axis_name: Optional[str] = None) -> VQState:
        """Initialize every codebook by running k-means on the first batch's
        residuals (vector_quantize.py:102-109). All replicas compute the
        same result: the sample pool is replica-0's shard (all_gather +
        take-first) so no out-of-band broadcast is needed.
        """
        if not self.kmeans_init:
            return state
        x = _to_channel_last(x, self.channel_last)
        flatten = x.reshape(-1, self.dim).astype(jnp.float32)
        if axis_name is not None:
            flatten = jax.lax.all_gather(flatten, axis_name)[0]

        def stage(carry, inp):
            residual = carry
            k_i = inp
            embed, _num = _kmeans(residual, self.codebook_size,
                                  self.kmeans_iters, k_i)
            idx = _stage_indices(residual, embed)
            residual = residual - embed[idx]
            return residual, embed

        keys = jax.random.split(key, self.num_quantizers)
        _, embeds = jax.lax.scan(stage, flatten, keys)
        return {
            "embed": embeds,
            "ema_embed": embeds * self.ema_num_initial,
            "ema_num": jnp.full((self.num_quantizers, self.codebook_size),
                                self.ema_num_initial, jnp.float32),
            "initted": jnp.ones((), jnp.bool_),
        }

    # -- the hot training path ---------------------------------------------
    def __call__(self, x: jnp.ndarray, state: VQState, key: jax.Array,
                 n: Optional[jnp.ndarray] = None, training: bool = True,
                 axis_name: Optional[str] = None
                 ) -> Tuple[jnp.ndarray, VQState, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray]:
        """One RVQ pass.

        Args:
          x: latents [B, C, T] (channel_last=False) or [B, T, C].
          n: traced int — number of active quantizers. Pass the sampled
             dropout index for training, a constant for eval.
        Returns (quantized, new_state, loss_vq, num_replaces [n_q], indices
        [n_q, B, T]; inactive stages yield index 0 and contribute nothing).
        """
        xcl = _to_channel_last(x, self.channel_last)
        B, T, C = xcl.shape
        n_q = self.num_quantizers
        if n is None:
            n = jnp.asarray(n_q, jnp.int32)
        flatten0 = jax.lax.stop_gradient(xcl.reshape(B * T, C))

        drop_key, rep_key = jax.random.split(key)
        rep_keys = jax.random.split(rep_key, n_q)
        stage_ids = jnp.arange(n_q)

        def stage_fn(carry, inp):
            residual, acc = carry
            embed, ema_embed, ema_num, sid, k_i = inp
            active = sid < n

            idx = _stage_indices(residual, embed)
            q = embed[idx].astype(residual.dtype)

            if training:
                onehot = jax.nn.one_hot(idx, self.codebook_size,
                                        dtype=jnp.float32)
                num_curr = jnp.sum(onehot, axis=0)
                embed_curr = jnp.dot(onehot.T,
                                     residual.astype(jnp.float32),
                                     preferred_element_type=jnp.float32)
                if axis_name is not None:
                    # fused all_reduce of [num; embed] stats bucket
                    # (vector_quantize.py:159-165)
                    bucket = jnp.concatenate(
                        [num_curr[:, None], embed_curr], axis=1)
                    bucket = jax.lax.psum(bucket, axis_name)
                    num_curr, embed_curr = bucket[:, 0], bucket[:, 1:]

                d = self.decay
                new_ema_num = ema_num * d + num_curr * (1 - d)
                new_ema_embed = ema_embed * d + embed_curr * (1 - d)
                if self.ema_num_threshold > 0.0:
                    denom = new_ema_num[:, None]
                else:
                    # Laplace smoothing when expiry is off
                    # (modules/vector_quantize.py:182-187)
                    total = jnp.sum(new_ema_num)
                    smoothed = ((new_ema_num + self.eps)
                                / (total + self.codebook_size * self.eps)
                                * total)
                    denom = smoothed[:, None]
                new_embed = new_ema_embed / denom

                # dead-code expiry: replica-0 samples broadcast to all
                # (vector_quantize.py:111-130)
                if self.ema_num_threshold > 0.0:
                    expired = new_ema_num < self.ema_num_threshold
                    cand_idx = jax.random.randint(
                        k_i, (self.codebook_size,), 0, flatten0.shape[0])
                    cand = flatten0[cand_idx].astype(jnp.float32)
                    if axis_name is not None:
                        cand = jax.lax.all_gather(cand, axis_name)[0]
                    new_embed = jnp.where(expired[:, None], cand, new_embed)
                    new_ema_embed = jnp.where(
                        expired[:, None], cand * self.ema_num_initial,
                        new_ema_embed)
                    new_ema_num = jnp.where(
                        expired, self.ema_num_initial, new_ema_num)
                    num_replace = jnp.sum(expired.astype(jnp.int32))
                else:
                    num_replace = jnp.zeros((), jnp.int32)

                # only active stages update their codebooks
                new_embed = jnp.where(active, new_embed, embed)
                new_ema_embed = jnp.where(active, new_ema_embed, ema_embed)
                new_ema_num = jnp.where(active, new_ema_num, ema_num)
                num_replace = jnp.where(active, num_replace, 0)
            else:
                new_embed, new_ema_embed, new_ema_num = (embed, ema_embed,
                                                         ema_num)
                num_replace = jnp.zeros((), jnp.int32)

            q_masked = jnp.where(active, q, jnp.zeros_like(q))
            idx_masked = jnp.where(active, idx, jnp.zeros_like(idx))
            new_residual = jnp.where(active, residual - q, residual)
            return ((new_residual, acc + q_masked),
                    (new_embed, new_ema_embed, new_ema_num, num_replace,
                     idx_masked))

        init = (flatten0, jnp.zeros_like(flatten0))
        (_, q_sum), (new_embed, new_ema_embed, new_ema_num, num_replaces,
                     indices) = jax.lax.scan(
            stage_fn, init,
            (state["embed"], state["ema_embed"], state["ema_num"],
             stage_ids, rep_keys))

        quantized = q_sum.reshape(B, T, C)
        loss_vq = jnp.mean(
            jnp.square(xcl.astype(jnp.float32)
                       - quantized.astype(jnp.float32)))
        if training:
            # straight-through: value = quantized, dvalue/dx = identity
            quantized = xcl + jax.lax.stop_gradient(quantized - xcl)
        quantized = _from_channel_last(quantized, self.channel_last)
        new_state = {"embed": new_embed, "ema_embed": new_ema_embed,
                     "ema_num": new_ema_num, "initted": state["initted"]}
        return (quantized, new_state, loss_vq, num_replaces,
                indices.reshape(n_q, B, T))

    def sample_n(self, key: jax.Array) -> jnp.ndarray:
        """Sample the quantizer-dropout depth for a training step
        (vector_quantize.py:216-217)."""
        if not self.dropout:
            return jnp.asarray(self.num_quantizers, jnp.int32)
        idx = tuple(self.dropout_index or
                    range(1, self.num_quantizers + 1))
        choice = jax.random.randint(key, (), 0, len(idx))
        return jnp.asarray(idx, jnp.int32)[choice]


@dataclasses.dataclass(frozen=True)
class NoVQ:
    """The `vq: ""` ablation: codec without a quantizer (reference
    models/hilcodec/models.py:101-106 sets quantizer=None and the forward
    passes encoder latents straight to the decoder with zero VQ loss and
    an empty num_replaces list). Implements the ResidualVQ call protocol
    so every trainer/loop path runs unchanged."""
    num_quantizers: int = 0
    kmeans_init: bool = False
    dropout: bool = False

    def init_state(self, key: jax.Array) -> VQState:
        # "initted" keeps the state tree non-empty for checkpointing
        return {"initted": jnp.ones((), jnp.bool_)}

    def kmeans_init_state(self, state: VQState, x: jnp.ndarray,
                          key: jax.Array,
                          axis_name: Optional[str] = None) -> VQState:
        return state

    def __call__(self, x: jnp.ndarray, state: VQState, key: jax.Array,
                 n: Optional[jnp.ndarray] = None, training: bool = True,
                 axis_name: Optional[str] = None):
        del key, n, training, axis_name
        loss_vq = jnp.zeros((), jnp.float32)
        num_replaces = jnp.zeros((0,), jnp.int32)
        return x, state, loss_vq, num_replaces, None

    def sample_n(self, key: jax.Array) -> Optional[jnp.ndarray]:
        return None


def _to_channel_last(x: jnp.ndarray, channel_last: bool) -> jnp.ndarray:
    return x if channel_last else x.swapaxes(1, 2)


def _from_channel_last(x: jnp.ndarray, channel_last: bool) -> jnp.ndarray:
    return x if channel_last else x.swapaxes(1, 2)


def _kmeans(samples: jnp.ndarray, num_clusters: int, num_iters: int,
            key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-means matching vector_quantize.py:32-59 (euclidean)."""
    n = samples.shape[0]
    k_perm = key
    # sample_vectors: randperm if enough samples else randint
    if n >= num_clusters:
        idx = jax.random.permutation(k_perm, n)[:num_clusters]
    else:
        idx = jax.random.randint(k_perm, (num_clusters,), 0, n)
    means = samples[idx]

    def iteration(means, _):
        # [N, K] negated sq distance
        dist = -(jnp.sum(samples ** 2, 1, keepdims=True)
                 - 2 * samples @ means.T
                 + jnp.sum(means ** 2, 1)[None, :])
        buckets = jnp.argmax(dist, axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = jnp.sum(onehot, axis=0)
        zero_mask = bins == 0
        bins_clamped = jnp.where(zero_mask, 1.0, bins)
        new_means = (onehot.T @ samples) / bins_clamped[:, None]
        means = jnp.where(zero_mask[:, None], means, new_means)
        return means, bins

    means, bins = jax.lax.scan(iteration, means, None, length=num_iters)
    return means, bins[-1]
