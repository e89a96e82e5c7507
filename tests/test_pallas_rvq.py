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
