"""Entropy-model (LM) training utilities for the EnCodec token LM.

The reference defines LMModel (models/encodec/models.py:21-56) but ships no
training loop for it; this provides the standard next-step token
cross-entropy so the LM is trainable end-to-end here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.encodec import LMModel


def lm_inputs_from_tokens(tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens [n_q, B, T] -> LM input indices [B, n_q, T]: shifted right by
    one step, offset by +1, position 0 = the reserved missing index 0."""
    x = tokens.transpose(1, 0, 2) + 1        # [B, n_q, T], 1-based
    return jnp.pad(x[:, :, :-1], ((0, 0), (0, 0), (1, 0)))


def lm_cross_entropy(lm: LMModel, params: Any, tokens: jnp.ndarray
                     ) -> jnp.ndarray:
    """Mean next-step cross-entropy (nats/token) over all codebooks.

    tokens: [n_q, B, T] int32 from the RVQ encoder.
    """
    inputs = lm_inputs_from_tokens(tokens)
    probs, _, _ = lm.apply(params, inputs)           # [B, card, n_q, T]
    targets = tokens.transpose(1, 0, 2)              # [B, n_q, T]
    p = jnp.take_along_axis(
        probs, targets[:, None, :, :], axis=1)[:, 0]  # [B, n_q, T]
    return -jnp.mean(jnp.log(jnp.maximum(p, 1e-10)))


def lm_train_step(lm: LMModel, optimizer, params: Any, opt_state: Any,
                  tokens: jnp.ndarray, lr: jnp.ndarray
                  ) -> Tuple[Any, Any, jnp.ndarray]:
    loss, grads = jax.value_and_grad(
        lambda p: lm_cross_entropy(lm, p, tokens))(params)
    updates, opt_state = optimizer.update(grads, opt_state, params, lr)
    params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params, opt_state, loss
