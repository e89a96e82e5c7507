"""Shape-gain product VQ: l2-normalized shape codebook x scalar log-gain.

Reference: modules/vector_quantize.py:198-372 (ShapeGainCodebook) and the
ResidualShapeGainVQ cascade (:376-516). Functional state:

  shape     [scs, C]  unit-norm shape codewords
  shape_num [scs]     EMA usage
  gain      [gcs]     scalar (log-)gains
  gain_num  [gcs]     EMA usage (scaled by scs/gcs ratio)

Quantization: shape index by max inner product; gain target = <x, shape_q>
(log-compressed when log_gain); nearest gain entry; reconstruction =
exp(gain_q) * shape_q.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SGState = Dict[str, jnp.ndarray]


def _l2norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


@dataclasses.dataclass(frozen=True)
class ShapeGainCodebook:
    dim: int
    shape_codebook_size: int
    gain_codebook_size: int
    decay: float = 0.99
    eps: float = 1e-5
    ema_num_threshold: float = 0.0
    ema_num_initial: float = 1.0
    log_gain: bool = True

    @property
    def gain_num_ratio(self) -> float:
        return self.shape_codebook_size / self.gain_codebook_size

    def init_state(self, key: jax.Array) -> SGState:
        k1, k2 = jax.random.split(key)
        return {
            "shape": jax.random.normal(
                k1, (self.shape_codebook_size, self.dim), jnp.float32),
            "shape_num": jnp.full((self.shape_codebook_size,),
                                  self.ema_num_initial, jnp.float32),
            # Uniform(1.0, 1.9) like the reference buffer init
            "gain": jax.random.uniform(k2, (self.gain_codebook_size,),
                                       jnp.float32, 1.0, 1.9),
            "gain_num": jnp.full((self.gain_codebook_size,),
                                 self.ema_num_initial * self.gain_num_ratio,
                                 jnp.float32),
        }

    def quantize(self, flatten: jnp.ndarray, state: SGState
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray]:
        """flatten [M, C] -> (quantize [M, C], shape_ind, gain_ind,
        gain_target [M, 1])."""
        shape = state["shape"]
        sim = jnp.dot(flatten, shape.T,
                      preferred_element_type=jnp.float32)
        shape_ind = jnp.argmax(sim, axis=-1)
        shape_q = shape[shape_ind]

        gain_target = jnp.sum(flatten * shape_q, axis=1, keepdims=True)
        if self.log_gain:
            gain_target = jnp.log(jnp.maximum(gain_target, self.eps))
        g = state["gain"][None, :]
        dist = -(gain_target ** 2 - 2.0 * gain_target @ g + g ** 2)
        gain_ind = jnp.argmax(dist, axis=-1)
        gain_q = state["gain"][gain_ind]
        if self.log_gain:
            gain_q = jnp.exp(gain_q)
        quantize = gain_q[:, None] * shape_q
        return quantize, shape_ind, gain_ind, gain_target

    def train_step(self, flatten: jnp.ndarray, state: SGState,
                   key: jax.Array, axis_name: Optional[str] = None
                   ) -> Tuple[jnp.ndarray, SGState, jnp.ndarray,
                              jnp.ndarray]:
        """One EMA update; returns (quantize, new_state, n_shape_replace,
        n_gain_replace)."""
        flatten = flatten.astype(jnp.float32)
        quantize, shape_ind, gain_ind, gain_target = self.quantize(
            flatten, state)

        shape_onehot = jax.nn.one_hot(shape_ind, self.shape_codebook_size)
        gain_onehot = jax.nn.one_hot(gain_ind, self.gain_codebook_size)
        shape_num_new = shape_onehot.sum(0)
        shape_new = jnp.dot(flatten.T, shape_onehot,
                            preferred_element_type=jnp.float32)  # [C, scs]
        gain_num_new = gain_onehot.sum(0)
        gain_new = (gain_target.T @ gain_onehot).squeeze(0)

        if axis_name is not None:
            bucket = jnp.concatenate([
                gain_num_new, shape_num_new, gain_new, shape_new.ravel()])
            bucket = jax.lax.psum(bucket, axis_name)
            gcs, scs = self.gain_codebook_size, self.shape_codebook_size
            gain_num_new = bucket[:gcs]
            shape_num_new = bucket[gcs:gcs + scs]
            gain_new = bucket[gcs + scs:2 * gcs + scs]
            shape_new = bucket[2 * gcs + scs:].reshape(self.dim, scs)

        shape_new = shape_new / jnp.maximum(
            jnp.linalg.norm(shape_new, axis=0, keepdims=True), self.eps)
        gain_new = gain_new / jnp.maximum(gain_num_new, self.eps)

        d = self.decay
        gain_num = state["gain_num"] * d + gain_num_new * (1 - d)
        gain = state["gain"] * d + gain_new * (1 - d)
        shape_num = state["shape_num"] * d + shape_num_new * (1 - d)
        shape = _l2norm(state["shape"] * d + shape_new.T * (1 - d))

        n_shape_rep = jnp.zeros((), jnp.int32)
        n_gain_rep = jnp.zeros((), jnp.int32)
        if self.ema_num_threshold > 0.0:
            ks, kg = jax.random.split(key)
            expired_s = shape_num < self.ema_num_threshold
            cand_idx = jax.random.randint(
                ks, (self.shape_codebook_size,), 0, flatten.shape[0])
            cand = _l2norm(flatten)[cand_idx]
            if axis_name is not None:
                cand = jax.lax.all_gather(cand, axis_name)[0]
            shape = jnp.where(expired_s[:, None], cand, shape)
            shape_num = jnp.where(expired_s, self.ema_num_initial,
                                  shape_num)
            n_shape_rep = jnp.sum(expired_s.astype(jnp.int32))

            thr_g = self.ema_num_threshold * self.gain_num_ratio
            expired_g = gain_num < thr_g
            gidx = jax.random.randint(
                kg, (self.gain_codebook_size,), 0, flatten.shape[0])
            gcand = gain_target.squeeze(1)[gidx]
            if axis_name is not None:
                gcand = jax.lax.all_gather(gcand, axis_name)[0]
            gain = jnp.where(expired_g, gcand, gain)
            gain_num = jnp.where(expired_g,
                                 self.ema_num_initial * self.gain_num_ratio,
                                 gain_num)
            n_gain_rep = jnp.sum(expired_g.astype(jnp.int32))

        new_state = {"shape": shape, "shape_num": shape_num, "gain": gain,
                     "gain_num": gain_num}
        return quantize, new_state, n_shape_rep, n_gain_rep


@dataclasses.dataclass(frozen=True)
class ResidualShapeGainVQ:
    """Residual cascade of shape-gain codebooks with straight-through +
    MSE commit loss (modules/vector_quantize.py:376-516)."""
    dim: int
    num_quantizers: int
    shape_codebook_size: int = 1024
    gain_codebook_size: int = 16
    decay: float = 0.99
    ema_num_threshold: float = 0.0
    ema_num_initial: float = 1.0
    log_gain: bool = True
    channel_last: bool = False

    def __post_init__(self):
        object.__setattr__(self, "codebook", ShapeGainCodebook(
            self.dim, self.shape_codebook_size, self.gain_codebook_size,
            self.decay, ema_num_threshold=self.ema_num_threshold,
            ema_num_initial=self.ema_num_initial, log_gain=self.log_gain))

    def init_state(self, key: jax.Array) -> SGState:
        states = [self.codebook.init_state(jax.random.fold_in(key, i))
                  for i in range(self.num_quantizers)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    def __call__(self, x: jnp.ndarray, state: SGState, key: jax.Array,
                 n: Optional[int] = None, training: bool = True,
                 axis_name: Optional[str] = None):
        xcl = x if self.channel_last else x.swapaxes(1, 2)
        B, T, C = xcl.shape
        flatten = jax.lax.stop_gradient(xcl.reshape(B * T, C))
        n_q = self.num_quantizers if n is None else n
        # n may be a traced scalar (e.g. the jitted infer/eval graphs pass
        # jnp.asarray(n)); Python branching on `i < n_q` would raise
        # TracerBoolConversionError, so the traced case masks the
        # accumulate instead — the same masked form ops/rvq.py uses.
        # Training requires a static n: stage activity decides whether the
        # EMA train_step runs at all, which cannot be masked after the fact.
        n_static = n is None or isinstance(n, (int, np.integer))
        if training and not n_static:
            raise ValueError(
                "ResidualShapeGainVQ training requires a static (Python int)"
                " n; got a traced/array value")

        residual = flatten
        q_sum = jnp.zeros_like(flatten)
        new_states = []
        replaces = []
        for i in range(self.num_quantizers):
            st = jax.tree.map(lambda s: s[i], state)
            if training and (n is None or i < n_q):
                q, st_new, nr_s, nr_g = self.codebook.train_step(
                    residual, st, jax.random.fold_in(key, i), axis_name)
            else:
                q, _si, _gi, _gt = self.codebook.quantize(
                    residual.astype(jnp.float32), st)
                st_new, nr_s, nr_g = st, jnp.zeros((), jnp.int32), \
                    jnp.zeros((), jnp.int32)
            if n_static:
                if n is None or i < n_q:
                    residual = residual - q.astype(residual.dtype)
                    q_sum = q_sum + q.astype(q_sum.dtype)
            else:
                use = (jnp.asarray(i) < n_q).astype(q_sum.dtype)
                residual = residual - (q * use).astype(residual.dtype)
                q_sum = q_sum + (q * use).astype(q_sum.dtype)
            new_states.append(st_new)
            replaces.append(nr_s + nr_g)

        quantized = q_sum.reshape(B, T, C)
        loss = jnp.mean(jnp.square(xcl.astype(jnp.float32)
                                   - quantized.astype(jnp.float32)))
        if training:
            quantized = xcl + jax.lax.stop_gradient(quantized - xcl)
        if not self.channel_last:
            quantized = quantized.swapaxes(1, 2)
        new_state = jax.tree.map(lambda *xs: jnp.stack(xs), *new_states)
        return quantized, new_state, loss, jnp.stack(replaces)


@dataclasses.dataclass(frozen=True)
class ShapeGainVQBridge:
    """ResidualShapeGainVQ behind the CodecModel quantizer interface
    (`vq: ResidualShapeGainVQ` config routing — reference
    models/hilcodec/models.py:57 lists the option; its trainer only ever
    ships ResidualVQ). Adapts the 4-tuple __call__ to the trainer's
    5-tuple (token indices are Euclidean-only — shape-gain has two index
    sets per stage and no deployment path, matching the reference)."""
    rvq: ResidualShapeGainVQ
    # trainer duck-type flags (TrainLoop.initialize_vq checks kmeans_init
    # before touching vq_state): shape/gain codebooks initialize randomly
    # (unit-norm shapes + spread gains), no kmeans warmup, no structured
    # quantizer dropout — same contract as NoVQ (ops/rvq.py:310-312)
    kmeans_init: bool = False
    dropout: bool = False

    @classmethod
    def from_kwargs(cls, vq_kwargs) -> "ShapeGainVQBridge":
        return cls(ResidualShapeGainVQ(
            dim=vq_kwargs.get("dim", 128),
            num_quantizers=vq_kwargs.get("num_quantizers", 8),
            shape_codebook_size=vq_kwargs.get("shape_codebook_size",
                                              vq_kwargs.get("codebook_size",
                                                            1024)),
            gain_codebook_size=vq_kwargs.get("gain_codebook_size", 16),
            decay=vq_kwargs.get("decay", 0.99),
            ema_num_threshold=vq_kwargs.get("ema_num_threshold", 0.0),
            ema_num_initial=vq_kwargs.get("ema_num_initial", 1.0),
            log_gain=vq_kwargs.get("log_gain", True),
            channel_last=False))

    @property
    def num_quantizers(self) -> int:
        return self.rvq.num_quantizers

    def init_state(self, key: jax.Array) -> SGState:
        return self.rvq.init_state(key)

    def sample_n(self, key: jax.Array) -> None:
        """No structured quantizer dropout for shape-gain (the reference's
        dropout_index machinery lives in its Euclidean ResidualVQ only):
        always the full stack. None keeps the stage loop static —
        ResidualShapeGainVQ branches on n in Python, unlike the masked
        traced-n form in ops/rvq.py."""
        return None

    def kmeans_init_state(self, state: SGState, x: jnp.ndarray,
                          key: jax.Array) -> SGState:
        """No-op: shape/gain codebooks initialize randomly (unit-norm
        shapes + spread gains, ShapeGainCodebook.init_state); the
        reference's kmeans warmup applies to Euclidean codebooks only."""
        return state

    def __call__(self, x, state, key, n=None, training=True,
                 axis_name=None):
        q, state, loss, replaces = self.rvq(
            x, state, key, n=n, training=training, axis_name=axis_name)
        return q, state, loss, replaces, None
