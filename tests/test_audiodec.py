import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.models.audiodec import (AudioDec, AudioDecDecoder,
                                          AudioDecEncoder, MultiGroupConv1d)
from hilcodec_tpu.ops import rvq as Q


@pytest.fixture(scope="module")
def tiny():
    return AudioDec(encode_channels=4, enc_ratios=(2, 4), enc_strides=(3, 4),
                    code_dim=8, codebook_num=2, codebook_size=16,
                    decode_channels=16, dec_strides=(4, 3),
                    resblock_kernel_size=5, resblock_dilations=(1, 3))


def test_hop_and_shapes(tiny, rng):
    assert tiny.hop_length == 12
    params = tiny.init(jax.random.PRNGKey(0))
    wav = (rng.standard_normal((2, 1, 12 * 10)) * 0.3).astype(np.float32)
    z = tiny.encoder.apply(params["encoder"], jnp.asarray(wav))
    assert z.shape == (2, 8, 10)
    y = tiny.decoder.apply(params["decoder"], z)
    assert y.shape == (2, 1, 120)


def test_default_config_hop_300():
    m = AudioDec()
    assert m.hop_length == 300
    assert m.code_dim == 64 and m.codebook_num == 8


def test_encoder_stream_equals_batch(tiny, rng):
    params = tiny.init(jax.random.PRNGKey(0))
    wav = (rng.standard_normal((1, 1, 12 * 8)) * 0.3).astype(np.float32)
    full = np.asarray(tiny.encoder.apply(params["encoder"],
                                         jnp.asarray(wav)))
    cache = tiny.encoder.init_cache(1)
    step = jax.jit(tiny.encoder.step)
    outs = []
    for i in range(4):
        xi = jnp.asarray(wav[:, :, i * 24:(i + 1) * 24])
        y, cache = step(params["encoder"], cache, xi)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(full, np.concatenate(outs, -1), rtol=2e-4,
                               atol=2e-4)


def test_decoder_stream_equals_batch(tiny, rng):
    params = tiny.init(jax.random.PRNGKey(0))
    # nontrivial denorm stats
    params["decoder"]["mean"] = jnp.ones(8) * 0.3
    params["decoder"]["scale"] = jnp.ones(8) * 1.7
    z = rng.standard_normal((1, 8, 8)).astype(np.float32)
    full = np.asarray(tiny.decoder.apply(params["decoder"], jnp.asarray(z)))
    cache = tiny.decoder.init_cache(1)
    step = jax.jit(tiny.decoder.step)
    outs = []
    for i in range(4):
        zi = jnp.asarray(z[:, :, i * 2:(i + 1) * 2])
        y, cache = step(params["decoder"], cache, zi)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(full, np.concatenate(outs, -1), rtol=2e-4,
                               atol=2e-4)


def test_end_to_end_tokens(tiny, rng):
    params = tiny.init(jax.random.PRNGKey(0))
    wav = (rng.standard_normal((1, 1, 12 * 6)) * 0.3).astype(np.float32)
    z = tiny.encoder.apply(params["encoder"], jnp.asarray(wav))
    tok = Q.quantize(z.swapaxes(1, 2), params["codebooks"])
    assert tok.shape == (2, 1, 6)
    q = Q.dequantize(tok, params["codebooks"])
    y = tiny.decoder.apply(params["decoder"], q.swapaxes(1, 2))
    assert y.shape == wav.shape
