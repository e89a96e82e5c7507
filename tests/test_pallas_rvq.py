"""Pallas fused RVQ kernel — interpret-mode correctness on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pallas_rvq_interpret_matches_scan(rng):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools

    from hilcodec_tpu.ops import rvq as Q
    from hilcodec_tpu.ops.pallas_rvq import _rvq_kernel

    n_q, K, C, M = 4, 64, 16, 128
    books = jax.random.normal(jax.random.PRNGKey(0), (n_q, K, C))
    x = jax.random.normal(jax.random.PRNGKey(1), (M, C)) * 2

    kernel = functools.partial(_rvq_kernel, n_q=n_q, codebook_size=K)
    idx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_q, M), jnp.int32),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((M, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, K, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_q, M), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=True,
    )(x, books)

    ref = Q.quantize(x[None], books)  # [n_q, 1, M]
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(ref)[:, 0, :])


def test_pallas_quantize_fallback_on_cpu(rng):
    """The public entry point falls back to the scan path off-TPU."""
    from hilcodec_tpu.ops import pallas_rvq
    from hilcodec_tpu.ops import rvq as Q

    books = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 20, 8))
    out = pallas_rvq.quantize(x, books)
    ref = Q.quantize(x, books)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_streaming_encode_with_pallas_kernel_matches_scan(rng):
    """The codec's wired pallas path: run encode_stream with the kernel in
    interpret mode (what the TPU executes, minus lowering) against the XLA
    scan quantizer within the same program shape — tokens must be equal."""
    import jax
    import jax.numpy as jnp

    from hilcodec_tpu.models.codec import CodecModel
    from hilcodec_tpu.models.hilcodec import HILCodec
    from hilcodec_tpu.ops import pallas_rvq
    from hilcodec_tpu.ops import rvq as Q
    from hilcodec_tpu.ops.rvq import ResidualVQ

    model = CodecModel(
        HILCodec(channels_enc=8, channels_dec=8, n_residual_enc=1,
                 n_residual_dec=1, strides=(4, 2), res_scale_enc=0.577,
                 res_scale_dec=0.577, vq_dim=8),
        ResidualVQ(dim=8, codebook_size=16, num_quantizers=4,
                   kmeans_init=False))
    params, vq_state = model.init(jax.random.PRNGKey(0))
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(
        jax.random.PRNGKey(1), vq_state["embed"].shape, jnp.float32)
    params = model.fold_params(params)

    B, L = 4, 10
    wav = jax.random.normal(jax.random.PRNGKey(2),
                            (B, 1, L * model.hop_length), jnp.float32) * 0.3
    cache, _ = model.init_cache(B)

    # route the dispatcher through the interpret-mode kernel
    orig = pallas_rvq.quantize
    pallas_rvq.quantize = lambda x, books, n=None: \
        pallas_rvq.quantize_pallas(x, books, n, interpret=True)
    try:
        tok_pl, _ = model.encode_stream(params, vq_state, wav, cache)
    finally:
        pallas_rvq.quantize = orig

    pallas_rvq.quantize = lambda x, books, n=None: Q.quantize(x, books, n)
    try:
        tok_xla, _ = model.encode_stream(params, vq_state, wav, cache)
    finally:
        pallas_rvq.quantize = orig

    np.testing.assert_array_equal(np.asarray(tok_pl), np.asarray(tok_xla))
    assert tok_pl.shape == (4, B, L)


def test_pallas_staged_matches_scan(rng):
    """The staged-grid variant (one codebook per grid step, residual in a
    persistent VMEM scratch — used when the [n_q, K, C] stack exceeds
    scoped-VMEM residency, e.g. encodec n_q=32) must be token-bit-exact
    with both the resident kernel and the XLA scan path."""
    from hilcodec_tpu.ops import rvq as Q
    from hilcodec_tpu.ops.pallas_rvq import quantize_pallas

    n_q, K, C = 6, 64, 16
    books = jax.random.normal(jax.random.PRNGKey(0), (n_q, K, C))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 100, C)) * 2

    ref = Q.quantize(x, books)
    staged = quantize_pallas(x, books, interpret=True, staged=True)
    resident = quantize_pallas(x, books, interpret=True, staged=False)
    np.testing.assert_array_equal(np.asarray(staged), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(resident), np.asarray(ref))


def test_pallas_staged_partial_n(rng):
    """staged honors n < n_q (bandwidth dropout at eval)."""
    from hilcodec_tpu.ops import rvq as Q
    from hilcodec_tpu.ops.pallas_rvq import quantize_pallas

    books = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 40, 8))
    ref = Q.quantize(x, books, 3)
    out = quantize_pallas(x, books, 3, interpret=True, staged=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_auto_stages_large_stacks():
    """The dispatcher picks staged automatically above the residency
    threshold (the encodec n_q=32, K=1024, C=128 stack is 16.8 MB, over
    the 16 MB scoped-VMEM limit it OOM'd on at eval -n 32)."""
    from hilcodec_tpu.ops.pallas_rvq import _RESIDENT_BYTES_MAX

    assert 32 * 1024 * 128 * 4 > _RESIDENT_BYTES_MAX      # encodec n=32
    assert 8 * 1024 * 128 * 4 <= _RESIDENT_BYTES_MAX      # hilcodec n=8
