"""Fused Pallas decoder megakernel vs the lax.scan streaming decoder.

Runs in Pallas interpret mode on the CPU mesh; on TPU the same kernels are
auto-selected by CodecModel.decode_stream (models/codec.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.models.codec import CodecModel, _pick_stream_block
from hilcodec_tpu.models.hilcodec import Decoder, HILCodec
from hilcodec_tpu.ops.pallas_decoder import DecoderMegakernel
from hilcodec_tpu.ops.rvq import ResidualVQ


def test_megakernel_step_matches_scan_decoder(rng):
    """Multi-step cache threading: megakernel wav + caches == Decoder.step
    (folded params) within f32 reassociation noise."""
    dec = Decoder(dimension=16, n_filters=8, n_residual_layers=2,
                  ratios=(4, 2), res_scale=0.577)
    params = dec.fold_params(dec.init(jax.random.PRNGKey(0)))
    mk = DecoderMegakernel(dec, block_streams=2, interpret=True)
    B = 4
    cache_ref = dec.init_cache(B)
    cache_mk = mk.init_cache(B)
    for _ in range(4):
        q = jnp.asarray((rng.standard_normal((B, 16, 1)) * 0.5
                         ).astype(np.float32))
        y_ref, cache_ref = dec.step(params, cache_ref, q)
        y_mk, cache_mk = mk.step(params, cache_mk, q)
        np.testing.assert_allclose(np.asarray(y_mk), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(cache_ref, cache_mk):
            np.testing.assert_allclose(np.asarray(b.transpose(0, 2, 1)),
                                       np.asarray(a), rtol=1e-5, atol=1e-6)


def test_megakernel_segmentation_budget():
    """Full-size speech decoder packs into VMEM-sized weight segments and
    resblocks are never split across segments."""
    dec = Decoder()
    mk = DecoderMegakernel(dec)
    seg_bytes = [sum(o.weight_bytes for o in s) for s in mk._segments]
    assert all(b <= 6.5 * 2 ** 20 for b in seg_bytes), seg_bytes
    for seg in mk._segments:
        groups = [o.atomic_group for o in seg if o.atomic_group >= 0]
        # a resblock's ops all land in one segment
        for g in set(groups):
            total = sum(1 for s in mk._segments for o in s
                        if o.atomic_group == g)
            here = sum(1 for o in seg if o.atomic_group == g)
            assert here in (0, total)


def test_decode_stream_megakernel_matches_scan(rng):
    """codec-level: decode_stream(megakernel=True) equals the scan path
    (identical tokens in, wav out within f32 tolerance, same cache
    layout/order handed back)."""
    codec = HILCodec(channels_enc=8, channels_dec=8, n_fft_base=16,
                     n_residual_enc=1, n_residual_dec=2, strides=(4, 2),
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
    tokens = jnp.asarray(rng.integers(0, 32, size=(2, B, L)), jnp.int32)
    _, cache0 = model.init_cache(B)
    wav_ref, cache_ref = model.decode_stream(folded, vq_state, tokens,
                                             cache0, megakernel=False)
    wav_mk, cache_mk = model.decode_stream(folded, vq_state, tokens,
                                           cache0, megakernel=True,
                                           megakernel_interpret=True)
    np.testing.assert_allclose(np.asarray(wav_mk), np.asarray(wav_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(cache_ref, cache_mk):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("b,expect", [(128, 32), (48, 24), (7, 7), (1, 1)])
def test_pick_stream_block(b, expect):
    assert _pick_stream_block(b) == expect
