"""Causal 1-D convolution primitives (batch + streaming), TPU-first.

All tensors are NCL (`[batch, channels, length]`), matching the codec's
native layout. Batch mode lowers to a single `lax.conv_general_dilated`
(XLA tiles it onto the MXU); streaming mode implements the exact cache
semantics of the reference deployment:

  * causal conv cache length  = d*(k-1) - (s-1)
    (reference models/hilcodec/causal_layers.py:147-165)
  * causal transposed-conv cache length = floor(d*(k-1)/s), with
    padding/output_padding chosen so each step emits exactly L*s samples
    (reference models/hilcodec/causal_layers.py:168-188)

so that per-frame streaming is bit-equivalent to the batched forward.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# NCL activations, OIL weights (out, in/groups, k)
_DIMS = ("NCH", "OIH", "NCH")
# NCHW activations, OIHW weights — 2-D convs (discriminators)
_DIMS2D = ("NCHW", "OIHW", "NCHW")

# Lowering of pure depthwise convs (groups == Cin == Cout):
#   "conv"  — lax.conv_general_dilated with feature_group_count (default)
#   "shift" — k shifted elementwise FMAs on the VPU. A depthwise conv does
#     k FLOPs/sample — no MXU work — so its cost is pure bandwidth; the
#     shift form keeps both the forward AND its autodiff transposes
#     (pad/slice/multiply/reduce) in XLA's elementwise-fusion regime
#     instead of grouped-conv gradient lowerings. Opt-in pending an
#     on-chip A/B of the train step (BASELINE round-3 bottleneck row).
_DEPTHWISE_LOWERING = "conv"


def set_depthwise_lowering(mode: str) -> None:
    """Select the depthwise-conv lowering ("conv" | "shift") for later
    traces. Affects tracing only — call before jit/compile."""
    global _DEPTHWISE_LOWERING
    if mode not in ("conv", "shift"):
        raise ValueError(f"unknown depthwise lowering {mode!r}")
    _DEPTHWISE_LOWERING = mode


def _shift_depthwise(x: jnp.ndarray, w: jnp.ndarray, stride: int,
                     dilation: int, padding: Tuple[int, int]) -> jnp.ndarray:
    """Depthwise conv1d as k shifted FMAs. x: [B, C, L]; w: [C, 1, k]."""
    k = w.shape[-1]
    if padding != (0, 0):
        x = jnp.pad(x, ((0, 0), (0, 0), padding))
    tout = (x.shape[-1] - dilation * (k - 1) - 1) // stride + 1
    w = w.astype(x.dtype)
    y = w[None, :, 0, 0:1] * lax.slice(
        x, (0, 0, 0), (x.shape[0], x.shape[1], (tout - 1) * stride + 1),
        (1, 1, stride))
    for j in range(1, k):
        sl = lax.slice(x, (0, 0, j * dilation),
                       (x.shape[0], x.shape[1],
                        j * dilation + (tout - 1) * stride + 1),
                       (1, 1, stride))
        y = y + w[None, :, 0, j:j + 1] * sl
    return y


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
           stride: Tuple[int, int] = (1, 1),
           dilation: Tuple[int, int] = (1, 1),
           padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0)),
           groups: int = 1) -> jnp.ndarray:
    """Plain conv2d. x: [B, Cin, H, W]; w: [Cout, Cin/groups, kh, kw]."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=tuple(stride),
        padding=list(padding), rhs_dilation=tuple(dilation),
        dimension_numbers=_DIMS2D, feature_group_count=groups)
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None, None]
    return y


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
           stride: int = 1, dilation: int = 1, groups: int = 1,
           padding: Tuple[int, int] = (0, 0)) -> jnp.ndarray:
    """Plain conv1d. x: [B, Cin, L]; w: [Cout, Cin/groups, k]; b: [Cout]."""
    if (_DEPTHWISE_LOWERING == "shift" and groups > 1
            and groups == x.shape[1] == w.shape[0] and w.shape[1] == 1):
        y = _shift_depthwise(x, w, stride, dilation, padding)
    else:
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(stride,),
            padding=[padding], rhs_dilation=(dilation,),
            dimension_numbers=_DIMS, feature_group_count=groups)
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    return y


def causal_pad_total(kernel_size: int, stride: int = 1,
                     dilation: int = 1) -> int:
    """Left padding of a causal strided conv: d*(k-1) - (s-1)."""
    return dilation * (kernel_size - 1) - (stride - 1)


def extra_pad_for_full_windows(length: int, kernel_size: int, stride: int,
                               padding_total: int) -> int:
    """Right padding so the final conv window is full.

    Static-shape equivalent of the reference's
    get_extra_padding_for_conv1d (models/hilcodec/modules/conv.py:61-68).
    """
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + kernel_size - padding_total
    return ideal - length


def causal_conv1d(x: jnp.ndarray, w: jnp.ndarray,
                  b: Optional[jnp.ndarray] = None, stride: int = 1,
                  dilation: int = 1, groups: int = 1,
                  pad_mode: str = "constant") -> jnp.ndarray:
    """Batched causal conv: left-pad by d*(k-1)-(s-1), right-pad to a full
    last window. pad_mode 'constant' (the shipped HILCodec configs) or
    'reflect' (the EnCodec family default, modules/conv.py:86-103)."""
    k = w.shape[-1]
    pad_total = causal_pad_total(k, stride, dilation)
    extra = extra_pad_for_full_windows(x.shape[-1], k, stride, pad_total)
    if pad_mode != "constant":
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_total, extra)), mode=pad_mode)
        return conv1d(x, w, b, stride, dilation, groups)
    return conv1d(x, w, b, stride, dilation, groups,
                  padding=(pad_total, extra))


def causal_conv1d_cache_len(kernel_size: int, stride: int = 1,
                            dilation: int = 1) -> int:
    return dilation * (kernel_size - 1) - (stride - 1)


def causal_conv1d_step(x: jnp.ndarray, cache: jnp.ndarray, w: jnp.ndarray,
                       b: Optional[jnp.ndarray] = None, stride: int = 1,
                       dilation: int = 1, groups: int = 1
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming step: concat cache, conv, keep last `cache_len` samples.

    x: [B, Cin, L] with L a multiple of `stride`; cache: [B, Cin, cache_len].
    """
    cache_len = cache.shape[-1]
    xc = jnp.concatenate([cache, x], axis=-1)
    new_cache = xc[:, :, xc.shape[-1] - cache_len:]
    y = conv1d(xc, w, b, stride, dilation, groups)
    return y, new_cache


def _convt_weight_as_conv(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Torch ConvTranspose1d weight [Cin, Cout/groups, k] -> equivalent
    regular-conv weight [Cout, Cin/groups, k] (kernel flipped)."""
    cin, cout_g, k = w.shape
    cin_g = cin // groups
    w = w.reshape(groups, cin_g, cout_g, k)
    w = jnp.flip(w, axis=-1).transpose(0, 2, 1, 3)  # [g, cout_g, cin_g, k]
    return w.reshape(groups * cout_g, cin_g, k)


def _shift_depthwise_convt(x: jnp.ndarray, w: jnp.ndarray, stride: int,
                           prepadded: bool = False) -> jnp.ndarray:
    """Causal depthwise transposed conv as a polyphase bank of shifted
    FMAs. x: [B, C, L]; w: [C, 1, k] (torch ConvTranspose1d layout).

    Derivation: y[i] = sum_a w[a] * x[(i-a)/s] over a ≡ i (mod s), so
    output phase p = i mod s is the causal FIR y_p[t] = sum_m w[p+m*s]
    * x[t-m] — each phase ceil((k-p)/s) taps, interleaved back by a
    reshape. Matches `causal_conv_transpose1d` (right-trim k-s) exactly.

    `prepadded=True` means x already carries the ceil(k/s)-1 history
    frames on the left (the streaming step's cache — its length
    floor((k-1)/s) equals ceil(k/s)-1 for every k>=1), so no pad is
    applied and the output covers the trailing L-(n_taps-1) positions.
    """
    B, C, L = x.shape
    k = w.shape[-1]
    s = stride
    w = w.astype(x.dtype)
    n_taps = -(-k // s)  # max taps over phases
    xp = x if prepadded else jnp.pad(x, ((0, 0), (0, 0), (n_taps - 1, 0)))
    tout = xp.shape[-1] - (n_taps - 1)
    phases = []
    for p in range(s):
        y = None
        for m in range(n_taps):
            a = p + m * s
            if a >= k:
                break
            sl = lax.slice(xp, (0, 0, n_taps - 1 - m),
                           (B, C, n_taps - 1 - m + tout))
            term = w[None, :, 0, a:a + 1] * sl
            y = term if y is None else y + term
        phases.append(y)
    return jnp.stack(phases, axis=-1).reshape(B, C, tout * s)


def causal_conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray,
                            b: Optional[jnp.ndarray] = None, stride: int = 1,
                            dilation: int = 1, groups: int = 1
                            ) -> jnp.ndarray:
    """Batched causal transposed conv (training graph semantics).

    For d == 1: equals torch `conv_transpose1d(x, w, stride=s)` followed
    by trimming `k - s` samples on the right (trim_right_ratio=1.0,
    reference models/hilcodec/modules/conv.py:260-282). For d > 1 the
    reference's own two implementations diverge (the training-graph trim
    `k - s` at modules/conv.py:263 ignores dilation; the streaming cache
    algebra at causal_layers.py:168-188 accounts for it) — the repo's
    spec is the STREAMING semantic for every d: output length L*s, and
    batch == concatenated `causal_conv_transpose1d_step` chunks bitwise
    (pinned by tests/test_conv.py). The right padding that realizes it is
    `stride - 1` for all (k, s, d) — the old `rf - (k - stride)` form
    equals that only at d == 1.
    w layout follows torch ConvTranspose1d: [Cin, Cout/groups, k].
    """
    k = w.shape[-1]
    if (_DEPTHWISE_LOWERING == "shift" and dilation == 1 and groups > 1
            and groups == x.shape[1] == w.shape[0] and w.shape[1] == 1):
        y = _shift_depthwise_convt(x, w, stride)
        if b is not None:
            y = y + b.astype(y.dtype)[None, :, None]
        return y
    wc = _convt_weight_as_conv(w, groups)
    rf = dilation * (k - 1)
    y = lax.conv_general_dilated(
        x, wc.astype(x.dtype), window_strides=(1,),
        padding=[(rf, stride - 1)], lhs_dilation=(stride,),
        rhs_dilation=(dilation,), dimension_numbers=_DIMS,
        feature_group_count=groups)
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    return y


def causal_conv_transpose1d_cache_len(kernel_size: int, stride: int = 1,
                                      dilation: int = 1) -> int:
    return (dilation * (kernel_size - 1)) // stride


def causal_conv_transpose1d_step(x: jnp.ndarray, cache: jnp.ndarray,
                                 w: jnp.ndarray,
                                 b: Optional[jnp.ndarray] = None,
                                 stride: int = 1, dilation: int = 1,
                                 groups: int = 1
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming transposed-conv step, reference cache semantics.

    cache holds floor(d*(k-1)/s) input frames; with torch padding
    p = cache_len*s and output_padding op = s-1+p-d*(k-1) the step emits
    exactly L*s samples (models/hilcodec/causal_layers.py:168-188).
    In lax terms that collapses to padding (d*(k-1) - cache_len*s, s-1)
    on the lhs-dilated conv.
    """
    k = w.shape[-1]
    cache_len = cache.shape[-1]
    xc = jnp.concatenate([cache, x], axis=-1)
    new_cache = xc[:, :, xc.shape[-1] - cache_len:]
    if (_DEPTHWISE_LOWERING == "shift" and dilation == 1 and groups > 1
            and groups == x.shape[1] == w.shape[0] and w.shape[1] == 1):
        # cache_len = floor((k-1)/s) = ceil(k/s)-1 — exactly the polyphase
        # history, so xc is the prepadded input of the batched shift form.
        y = _shift_depthwise_convt(xc, w, stride, prepadded=True)
        if b is not None:
            y = y + b.astype(y.dtype)[None, :, None]
        return y, new_cache
    wc = _convt_weight_as_conv(w, groups)
    rf = dilation * (k - 1)
    y = lax.conv_general_dilated(
        xc, wc.astype(xc.dtype), window_strides=(1,),
        padding=[(rf - cache_len * stride, stride - 1)],
        lhs_dilation=(stride,), rhs_dilation=(dilation,),
        dimension_numbers=_DIMS, feature_group_count=groups)
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    return y, new_cache
