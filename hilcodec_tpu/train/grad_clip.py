"""Gradient clipping (global-norm, per-parameter local-norm, value).

Reference: utils/grad_clip.py — notably `clip_grad_norm_local`, which clips
each parameter's gradient by its own norm with a sync-free clamp (no global
reduction), plus the standard global-norm and value clips selected by
`train.clip_grad` (wrapper.py:90-98).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def clip_grad_norm_global(grads: Any, max_norm: float,
                          eps: float = 1e-6) -> Any:
    sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
             for g in jax.tree.leaves(grads))
    norm = jnp.sqrt(sq)
    scale = jnp.minimum(1.0, max_norm / (norm + eps))
    return jax.tree.map(lambda g: (g.astype(jnp.float32)
                                   * scale).astype(g.dtype), grads)


def clip_grad_norm_local(grads: Any, max_norm: float,
                         eps: float = 1e-6) -> Any:
    """Per-parameter (not global) norm clipping — the reference's sync-free
    clamp trick (utils/grad_clip.py:7-32)."""
    def leaf(g):
        norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
        scale = jnp.minimum(1.0, max_norm / (norm + eps))
        return (g.astype(jnp.float32) * scale).astype(g.dtype)

    return jax.tree.map(leaf, grads)


def clip_grad_value(grads: Any, clip_value: float) -> Any:
    return jax.tree.map(
        lambda g: jnp.clip(g, -clip_value, clip_value), grads)


def make_clipper(clip_grad, clip_grad_kwargs=None):
    """Factory for wrapper.py:90-98 semantics: None | 'norm'/'norm_global'
    | 'norm_local' | 'value'."""
    kw = dict(clip_grad_kwargs or {})
    if clip_grad is None:
        return lambda g: g
    if clip_grad in ("norm", "norm_global"):
        return lambda g: clip_grad_norm_global(g, kw.get("max_norm", 1.0))
    if clip_grad == "norm_local":
        return lambda g: clip_grad_norm_local(g, kw.get("max_norm", 1.0))
    if clip_grad == "value":
        return lambda g: clip_grad_value(g, kw.get("clip_value", 1.0))
    raise ValueError(f"unknown clip_grad {clip_grad}")


def find_nonfinite_grads(grads: Any) -> list:
    """NaN/Inf gradient scanner (utils/debug.py check_grad): returns the
    paths of non-finite leaves (host-side debugging helper)."""
    import numpy as np
    bad = []
    for kp, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
        if not np.isfinite(np.asarray(leaf)).all():
            bad.append("/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                                for k in kp))
    return bad
