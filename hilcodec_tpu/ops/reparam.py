"""Functional weight reparameterizations.

The reference applies weight_norm / weight_standardization / spectral_norm as
torch forward-pre-hooks (modules/weight_standardization.py:10-145,
models/hilcodec/modules/conv.py:26-41). Here the reparameterized factors are
ordinary leaves of the parameter pytree and the effective weight is computed
functionally inside `apply`; `fold()` turns a reparameterized param dict into
an inference-time `{w, b}` dict (the analogue of `remove_weight_norm` +
`merge_scaling`).

Conventions (matching torch defaults, dim=0):
  * weight_norm:  params {v, g, b};  w = g * v / ||v||  with the L2 norm
    taken per index of axis 0 over all remaining axes. g has shape
    [d0, 1, ..., 1].
  * weight_standardization: params {v, g, b};
    w = (g * scale) * (v - mean) * rsqrt(max(var * fan_in, eps))
    with mean/var per index of axis 0 over remaining axes (biased var).
  * spectral_norm: params {v, u, b}; w = v / sigma(v) with sigma estimated
    by one power-iteration step on the 2-D reshape of v (u is the running
    left singular vector; updated out-of-band in the train step, fixed
    during apply to stay functional).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

ParamDict = Dict[str, Any]

WEIGHT_NORM = "weight_norm"
WEIGHT_STANDARDIZATION = "weight_standardization"
SPECTRAL_NORM = "spectral_norm"
NONE = "none"

VALID_NORMS = frozenset({WEIGHT_NORM, WEIGHT_STANDARDIZATION, SPECTRAL_NORM,
                         NONE})


def _reduce_axes(w: jnp.ndarray) -> Tuple[int, ...]:
    return tuple(range(1, w.ndim))


def weight_norm_init(w: jnp.ndarray) -> ParamDict:
    """Split an initialized weight into {v, g} with w == g * v/||v||."""
    norm = jnp.sqrt(jnp.sum(w.astype(jnp.float32) ** 2,
                            axis=_reduce_axes(w), keepdims=True))
    return {"v": w, "g": norm.astype(w.dtype)}


def weight_norm_compute(v: jnp.ndarray, g: jnp.ndarray,
                        eps: float = 0.0) -> jnp.ndarray:
    v32 = v.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(v32 ** 2, axis=_reduce_axes(v), keepdims=True))
    return (g.astype(jnp.float32) * v32 / (norm + eps)).astype(v.dtype)


def weight_standardization_init(w: jnp.ndarray, scale: Optional[float] = None,
                                zero_init: bool = False) -> ParamDict:
    g_shape = (w.shape[0],) + (1,) * (w.ndim - 1)
    g = jnp.zeros(g_shape, w.dtype) if zero_init else jnp.ones(g_shape, w.dtype)
    p: ParamDict = {"v": w, "g": g}
    if scale is not None:
        p["scale"] = jnp.asarray(scale, w.dtype)  # non-learnable buffer
    return p


def weight_standardization_compute(v: jnp.ndarray, g: jnp.ndarray,
                                   scale: Optional[jnp.ndarray] = None,
                                   eps: float = 1e-7) -> jnp.ndarray:
    axes = _reduce_axes(v)
    fan_in = 1
    for a in axes:
        fan_in *= v.shape[a]
    v32 = v.astype(jnp.float32)
    mean = jnp.mean(v32, axis=axes, keepdims=True)
    var = jnp.mean((v32 - mean) ** 2, axis=axes, keepdims=True)
    w = (v32 - mean) * jax.lax.rsqrt(jnp.maximum(var * fan_in, eps))
    gain = g.astype(jnp.float32)
    if scale is not None:
        gain = gain * scale.astype(jnp.float32)
    return (gain * w).astype(v.dtype)


def spectral_norm_init(w: jnp.ndarray, key: jax.Array) -> ParamDict:
    m = w.shape[0]
    u = jax.random.normal(key, (m,), jnp.float32)
    u = u / (jnp.linalg.norm(u) + 1e-12)
    return {"v": w, "u": u}


def spectral_norm_compute(v: jnp.ndarray, u: jnp.ndarray,
                          eps: float = 1e-12) -> jnp.ndarray:
    u = jax.lax.stop_gradient(u)  # u is a buffer (power-iteration state)
    w2 = v.astype(jnp.float32).reshape(v.shape[0], -1)
    vv = w2.T @ u
    vv = vv / (jnp.linalg.norm(vv) + eps)
    sigma = u @ (w2 @ vv)
    return (v.astype(jnp.float32) / sigma).astype(v.dtype)


def spectral_norm_power_iter(v: jnp.ndarray, u: jnp.ndarray,
                             eps: float = 1e-12) -> jnp.ndarray:
    """One power-iteration update of u (call from the train step)."""
    w2 = jax.lax.stop_gradient(v).astype(jnp.float32).reshape(v.shape[0], -1)
    vv = w2.T @ u
    vv = vv / (jnp.linalg.norm(vv) + eps)
    u_new = w2 @ vv
    return u_new / (jnp.linalg.norm(u_new) + eps)


def init_reparam(w: jnp.ndarray, norm: str, *, key: Optional[jax.Array] = None,
                 bias: Optional[jnp.ndarray] = None) -> ParamDict:
    """Wrap an initialized raw weight into the parameterization for `norm`."""
    assert norm in VALID_NORMS, norm
    if norm == WEIGHT_NORM:
        p = weight_norm_init(w)
    elif norm == WEIGHT_STANDARDIZATION:
        p = weight_standardization_init(w)
    elif norm == SPECTRAL_NORM:
        assert key is not None
        p = spectral_norm_init(w, key)
    else:
        p = {"w": w}
    if bias is not None:
        p["b"] = bias
    return p


def compute_weight(params: ParamDict, norm: str) -> jnp.ndarray:
    """Effective convolution weight from a (possibly reparameterized) dict."""
    if norm == WEIGHT_NORM:
        return weight_norm_compute(params["v"], params["g"])
    if norm == WEIGHT_STANDARDIZATION:
        return weight_standardization_compute(
            params["v"], params["g"], params.get("scale"))
    if norm == SPECTRAL_NORM:
        return spectral_norm_compute(params["v"], params["u"])
    return params["w"]


def fold(params: ParamDict, norm: str) -> ParamDict:
    """Materialize the effective weight: {v, g, ...} -> {w[, b]}.

    Functional analogue of remove_weight_norm /
    remove_weight_standardization for deployment.
    """
    out: ParamDict = {"w": compute_weight(params, norm)}
    if "b" in params and params["b"] is not None:
        out["b"] = params["b"]
    return out


def fold_tree(params, norm: str = WEIGHT_NORM):
    """Recursively fold every reparameterized conv dict in a param tree.

    Any dict node shaped like a reparameterized weight ({v, g} for
    weight_norm / weight_standardization, {v, u} for spectral_norm)
    becomes {w[, b]}; everything else passes through. Whole-model
    analogue of remove_weight_reparameterizations for families whose
    layers detect folded params structurally (models/layers.py).
    """
    def walk(node):
        if isinstance(node, dict):
            if "v" in node and ("g" in node or "u" in node):
                n = (SPECTRAL_NORM if "u" in node
                     else WEIGHT_STANDARDIZATION if "scale" in node
                     else norm)
                return fold(node, n)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)
