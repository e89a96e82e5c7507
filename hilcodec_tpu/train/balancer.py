"""Gradient-norm loss balancer (EnCodec-style) + Avocodo's simple balancer.

Reference: models/hilcodec/balancer.py (gradient balancer: per-loss
cotangents w.r.t. the generated waveform, EMA-normalized and re-weighted)
and models/avocodo/balancer.py (plain weighted sum).

TPU-native formulation: instead of K `autograd.grad` calls + a synthetic
`(wav_g * ĝ).sum()` backward, the train step takes ONE `jax.vjp` of the
generator and feeds it the combined cotangent this module computes. bf16/f32
training needs no GradScaler; the non-finite guard (balancer.py:142-148)
remains as a skip-update flag.

State (pytree):
  ema_norms [K] f32 — EMA of per-loss grad norms (all-reduced)
  ema_fix   []  f32 — bias-correction accumulator (balancer.py:140)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

BalancerState = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class Balancer:
    """weights: ordered (key, weight); weight_others scales the extra
    differentiable scalar (loss_vq) fed through the same generator vjp."""
    weights: Tuple[Tuple[str, float], ...]
    weight_others: float = 0.01
    ema_decay: float = 0.999
    per_batch_item: bool = True
    epsilon: float = 1e-12

    @classmethod
    def from_config(cls, balancer_kwargs: Dict[str, Any]) -> "Balancer":
        kw = dict(balancer_kwargs)
        weights = tuple(kw.pop("weights").items())
        return cls(weights=weights, **kw)

    @property
    def keys(self) -> List[str]:
        return [k for k, _ in self.weights]

    def init_state(self) -> BalancerState:
        return {"ema_norms": jnp.zeros((len(self.weights),), jnp.float32),
                "ema_fix": jnp.zeros((), jnp.float32)}

    def combine(self, grads: Dict[str, jnp.ndarray], state: BalancerState,
                axis_name: Optional[str] = None
                ) -> Tuple[jnp.ndarray, BalancerState, jnp.ndarray,
                           Dict[str, jnp.ndarray]]:
        """grads: per-loss cotangent w.r.t. wav_g (each [B, 1, T]).

        Returns (combined cotangent ĝ, new_state, finite flag, log dict of
        debiased EMA norms). On non-finite norms the state is left unchanged
        and ĝ is zero (the step applies no generator update), matching
        balancer.py:142-148 minus the GradScaler backoff.
        """
        norms = []
        for key, _w in self.weights:
            g = grads[key].astype(jnp.float32)
            if self.per_batch_item:
                n = jnp.mean(jnp.sqrt(jnp.sum(
                    jnp.square(g.reshape(g.shape[0], -1)), axis=1)))
            else:
                n = jnp.sqrt(jnp.sum(jnp.square(g)))
            norms.append(n)
        norms = jnp.stack(norms)

        ema = self.ema_decay * state["ema_norms"] \
            + (1.0 - self.ema_decay) * norms
        if axis_name is not None:
            ema = jax.lax.pmean(ema, axis_name)
        ema_fix = state["ema_fix"] * self.ema_decay + (1.0 - self.ema_decay)

        finite = jnp.all(jnp.isfinite(ema))
        safe_ema = jnp.where(jnp.isfinite(ema), ema, state["ema_norms"])
        new_state = {
            "ema_norms": jnp.where(finite, ema, state["ema_norms"]),
            "ema_fix": jnp.where(finite, ema_fix, state["ema_fix"]),
        }

        recip = 1.0 / (safe_ema / jnp.maximum(ema_fix, 1e-30) + self.epsilon)
        out = jnp.zeros_like(grads[self.keys[0]], dtype=jnp.float32)
        for i, (key, w) in enumerate(self.weights):
            out = out + (w * recip[i]) * grads[key].astype(jnp.float32)
        out = jnp.where(finite, out, jnp.zeros_like(out))

        logs = {f"ema_norm/{k}": safe_ema[i] / jnp.maximum(ema_fix, 1e-30)
                for i, (k, _) in enumerate(self.weights)}
        return out, new_state, finite, logs


@dataclasses.dataclass(frozen=True)
class SimpleBalancer:
    """Avocodo's balancer (models/avocodo/balancer.py:46-54): a plain
    weighted sum of losses — no gradient rescaling. Returns the scalar total
    to backprop directly."""
    weights: Tuple[Tuple[str, float], ...]
    weight_others: float = 1.0

    @classmethod
    def from_config(cls, balancer_kwargs: Dict[str, Any]) -> "SimpleBalancer":
        kw = dict(balancer_kwargs)
        weights = tuple(kw.pop("weights").items())
        kw.pop("ema_decay", None)
        return cls(weights=weights,
                   weight_others=kw.get("weight_others", 1.0))

    def total(self, losses: Dict[str, jnp.ndarray],
              others: jnp.ndarray) -> jnp.ndarray:
        out = jnp.zeros((), jnp.float32)
        for k, w in self.weights:
            out = out + w * losses[k].astype(jnp.float32)
        return out + self.weight_others * others
