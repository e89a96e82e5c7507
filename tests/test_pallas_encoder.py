"""Fused Pallas encoder megakernel vs the lax.scan streaming encoder
(interpret mode on the CPU mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from hilcodec_tpu.models.codec import CodecModel
from hilcodec_tpu.models.hilcodec import Encoder, HILCodec
from hilcodec_tpu.ops.pallas_encoder import EncoderMegakernel
from hilcodec_tpu.ops.rvq import ResidualVQ


def test_encoder_megakernel_matches_scan(rng):
    enc = Encoder(dimension=16, n_filters=8, n_fft_base=16,
                  n_residual_layers=2, ratios=(4, 2), res_scale=0.577,
                  spec_means=(-4.5, -4.3, -4.0), spec_stds=(2.8, 2.9, 3.0))
    params = enc.fold_params(enc.init(jax.random.PRNGKey(0)))
    mk = EncoderMegakernel(enc, block_streams=2, interpret=True)
    B, hop = 4, enc.hop_length
    cache_ref = enc.init_cache(B)
    cache_mk = mk.cache_to_time_major(enc.init_cache(B))
    for _ in range(4):
        x = jnp.asarray((rng.standard_normal((B, 1, hop)) * 0.3
                         ).astype(np.float32))
        z_ref, cache_ref = enc.step(params, cache_ref, x)
        z_mk, cache_mk = mk.step(params, cache_mk, x)
        np.testing.assert_allclose(np.asarray(z_mk), np.asarray(z_ref),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(cache_ref, mk.cache_from_time_major(cache_mk)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)


def test_encode_stream_megakernel_token_parity(rng):
    """codec-level: encode_stream(megakernel=True) produces the same token
    stream as the scan path on well-separated inputs (latent fp noise is
    ~1e-7 relative; any disagreement would be an fp tie)."""
    codec = HILCodec(channels_enc=8, channels_dec=8, n_fft_base=16,
                     n_residual_enc=1, n_residual_dec=1, strides=(4, 2),
                     vq_dim=16, res_scale_enc=0.577, res_scale_dec=0.577)
    vq = ResidualVQ(dim=16, codebook_size=32, num_quantizers=2,
                    kmeans_init=False)
    model = CodecModel(codec, vq)
    params, vq_state = model.init(jax.random.PRNGKey(1))
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(jax.random.PRNGKey(2),
                                          vq_state["embed"].shape)
    folded = model.fold_params(params)
    B, L = 4, 6
    wav = jnp.asarray((rng.standard_normal((B, 1, L * codec.hop_length))
                       * 0.3).astype(np.float32))
    cache0, _ = model.init_cache(B)
    tok_ref, cache_ref = model.encode_stream(folded, vq_state, wav, cache0,
                                             megakernel=False)
    tok_mk, cache_mk = model.encode_stream(folded, vq_state, wav, cache0,
                                           megakernel=True,
                                           megakernel_interpret=True)
    np.testing.assert_array_equal(np.asarray(tok_mk), np.asarray(tok_ref))
    for a, b in zip(cache_ref, cache_mk):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
