"""Pallas TPU kernel: fused residual vector quantization.

Replaces the reference's 8-12 sequential VQ ONNX graphs (SURVEY.md §2.12 /
§7.1) with ONE kernel that keeps the residual in VMEM across all stages:

  per stage k (unrolled):
    dist   = ||r||^2 - 2 r @ E_k^T + ||E_k||^2     (MXU matmul)
    idx    = argmin(dist)                          (first-index tie-break)
    onehot = (lane == idx)                         (VPU compare)
    q      = onehot @ E_k                          (MXU matmul — gather-free)
    r     -= q

Block over the flattened token axis; codebooks stay resident in VMEM
(n_q * K * C * 4 B = 8 * 1024 * 128 * 4 = 4 MB for the speech config).
Falls back to the lax.scan path (ops/rvq.py) on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rvq as _rvq


def _rvq_kernel(x_ref, books_ref, idx_ref, *, n_q: int, codebook_size: int):
    r = x_ref[:].astype(jnp.float32)                        # [TM, C]
    lanes = jax.lax.broadcasted_iota(jnp.int32,
                                     (1, codebook_size), 1)  # [1, K]
    for k in range(n_q):
        e = books_ref[k].astype(jnp.float32)                # [K, C]
        # distance with the ||r||^2 term (streaming.py:57-64 semantics)
        dist = (jnp.sum(r * r, axis=1, keepdims=True)
                - 2.0 * jnp.dot(r, e.T,
                                preferred_element_type=jnp.float32)
                + jnp.sum(e * e, axis=1)[None, :])          # [TM, K]
        idx = jnp.argmin(dist, axis=1).astype(jnp.int32)    # [TM]
        idx_ref[k, :] = idx
        onehot = (lanes == idx[:, None]).astype(jnp.float32)
        # HIGHEST precision makes the one-hot matmul reconstruct e[idx]
        # bit-exactly, so the residual cascade (and therefore every token)
        # matches the gather-based path in ops/rvq.py. The distance dot
        # above deliberately stays at default precision — that is what the
        # XLA path uses, and the two argmins must see identical floats.
        q = jnp.dot(onehot, e, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        r = r - q


def _rvq_staged_kernel(x_ref, book_ref, idx_ref, r_ref, *,
                       codebook_size: int):
    """One grid step = one VQ stage: only ONE codebook is VMEM-resident.

    The residual lives in a VMEM scratch that persists across grid steps
    (TPU grids run sequentially, innermost axis fastest), so the cascade
    r -= E_k[idx_k] is identical to the resident kernel — just with the
    codebook DMA'd per stage instead of the whole [n_q, K, C] stack held
    at once (encodec n_q=32 is a 16.8 MB stack, over the 16 MB scoped-
    VMEM limit that the resident kernel hit on eval -n 32)."""
    import jax.experimental.pallas as pl

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        r_ref[:] = x_ref[:].astype(jnp.float32)

    r = r_ref[:]                                            # [TM, C]
    e = book_ref[0].astype(jnp.float32)                     # [K, C]
    lanes = jax.lax.broadcasted_iota(jnp.int32,
                                     (1, codebook_size), 1)  # [1, K]
    dist = (jnp.sum(r * r, axis=1, keepdims=True)
            - 2.0 * jnp.dot(r, e.T, preferred_element_type=jnp.float32)
            + jnp.sum(e * e, axis=1)[None, :])              # [TM, K]
    idx = jnp.argmin(dist, axis=1).astype(jnp.int32)        # [TM]
    idx_ref[0, 0, :] = idx
    onehot = (lanes == idx[:, None]).astype(jnp.float32)
    q = jnp.dot(onehot, e, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    r_ref[:] = r - q


# codebook stacks above this stay out of VMEM residency (the scoped limit
# is 16 MB and the resident kernel needs block + temps on top of the stack)
_RESIDENT_BYTES_MAX = 12 * 1024 * 1024


@functools.partial(jax.jit,
                   static_argnames=("n", "block_m", "interpret", "staged"))
def quantize_pallas(x: jnp.ndarray, codebooks: jnp.ndarray,
                    n: Optional[int] = None,
                    block_m: Optional[int] = None,
                    interpret: bool = False,
                    staged: Optional[bool] = None) -> jnp.ndarray:
    """x: [B, T, C]; codebooks: [n_q, K, C] -> indices [n, B, T] (int32).

    Drop-in (token-bit-exact) replacement for ops.rvq.quantize on TPU.
    `interpret=True` runs the kernel in Pallas interpret mode (CPU CI).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_q_total, K, C = codebooks.shape
    n_q = n_q_total if n is None else n
    B, T, _ = x.shape
    M = B * T
    if block_m is None:
        # small per-frame streaming batches: one block, no pad waste
        block_m = min(512, max(8, -(-M // 8) * 8))
    flat = x.reshape(M, C)
    pad = (-M) % block_m
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    Mp = flat.shape[0]

    if staged is None:
        staged = n_q * K * C * 4 > _RESIDENT_BYTES_MAX
    if staged:
        kernel = functools.partial(_rvq_staged_kernel, codebook_size=K)
        # the stage axis rides as a leading size-1 block dim: Mosaic
        # requires the LAST TWO block dims to be (8,128)-divisible or
        # full-extent, so a (1, block_m) block over [n_q, Mp] is illegal
        # while (1, 1, block_m) over [n_q, 1, Mp] is fine: the size-1
        # middle dim is full-extent, and the default block_m is either
        # == Mp (full extent, M <= 512) or 512 (128-divisible).
        idx = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_q, 1, Mp), jnp.int32),
            grid=(Mp // block_m, n_q),
            in_specs=[
                pl.BlockSpec((block_m, C), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, C), lambda i, k: (k, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, block_m), lambda i, k: (k, 0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_m, C), jnp.float32)],
            interpret=interpret,
        )(flat, codebooks[:n_q])
        idx = idx[:, 0]
    else:
        kernel = functools.partial(_rvq_kernel, n_q=n_q, codebook_size=K)
        idx = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_q, Mp), jnp.int32),
            grid=(Mp // block_m,),
            in_specs=[
                pl.BlockSpec((block_m, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_q, K, C), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_q, block_m), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(flat, codebooks[:n_q])
    return idx[:, :M].reshape(n_q, B, T)


def quantize(x: jnp.ndarray, codebooks: jnp.ndarray,
             n: Optional[int] = None) -> jnp.ndarray:
    """Pallas on TPU, lax.scan elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return quantize_pallas(x, codebooks, n)
    return _rvq.quantize(x, codebooks, n)
