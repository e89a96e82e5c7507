import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.models.avocodo import (AvocodoDecoder,
                                         AvocodoDiscriminators,
                                         AvocodoModel, pqmf_targets)
from hilcodec_tpu.train.balancer import SimpleBalancer
from hilcodec_tpu.utils.hparams import load_config


@pytest.fixture(scope="module")
def tiny_dec():
    return AvocodoDecoder(n_filters=8, n_residual_layers=1,
                          ratios=(4, 2, 2), dimension=16, res_scale=0.577)


def test_multiscale_outputs(tiny_dec, rng):
    params = tiny_dec.init(jax.random.PRNGKey(0))
    z = rng.standard_normal((2, 16, 8)).astype(np.float32)
    ys = tiny_dec.apply(params, jnp.asarray(z))
    # heads after stages 1..: rates hop/strides
    assert len(ys) == 2                       # 3 ratios -> heads at i=1,2
    assert ys[0].shape == (2, 1, 8 * 4 * 2)   # half-rate
    assert ys[1].shape == (2, 1, 8 * 16)      # full rate


def test_decoder_stream_equals_batch_full_rate(tiny_dec, rng):
    params = tiny_dec.init(jax.random.PRNGKey(0))
    z = rng.standard_normal((1, 16, 8)).astype(np.float32)
    ys = tiny_dec.apply(params, jnp.asarray(z))
    full = np.asarray(ys[-1])
    cache = tiny_dec.init_cache(1)
    outs = []
    for i in range(4):
        y, cache = tiny_dec.step(params, cache,
                                 jnp.asarray(z[:, :, i * 2:(i + 1) * 2]))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(full, np.concatenate(outs, -1), rtol=2e-4,
                               atol=2e-4)


def test_from_reference_config(reference_dir):
    hp = load_config(os.path.join(reference_dir, "configs",
                                  "avocodo_music.yaml"))
    model = AvocodoModel.from_config(hp.model_kwargs.to_dict())
    assert model.hop_length == 320
    discs = AvocodoDiscriminators(
        combd_kwargs=hp.disc_kwargs.combd_kwargs.to_dict(),
        sbd_kwargs=hp.disc_kwargs.sbd_kwargs.to_dict())
    assert set(discs.discs) == {"combd", "sbd"}


@pytest.mark.slow
def test_combd_sbd_forward(reference_dir, rng):
    hp = load_config(os.path.join(reference_dir, "configs",
                                  "avocodo_music.yaml"))
    discs = AvocodoDiscriminators(
        combd_kwargs=hp.disc_kwargs.combd_kwargs.to_dict(),
        sbd_kwargs=hp.disc_kwargs.sbd_kwargs.to_dict())
    params = discs.init(jax.random.PRNGKey(0))
    wav = (rng.standard_normal((1, 1, 24000)) * 0.3).astype(np.float32)
    pq_cfg = {k: tuple(v)
              for k, v in hp.pqmf_config.to_dict().items()}
    ys = pqmf_targets(jnp.asarray(wav), pq_cfg)
    assert ys[0].shape[-1] == 3000 and ys[1].shape[-1] == 12000
    logits, fmaps = discs.apply(params, ys)
    assert len(logits["combd"]) == 5      # 3 hierarchical + 2 multi-scale
    assert len(logits["sbd"]) == 4
    for v in logits["combd"] + logits["sbd"]:
        assert np.isfinite(np.asarray(v)).all()


def test_simple_balancer():
    sb = SimpleBalancer.from_config(
        {"weights": {"freq": 45, "combd_g": 1.0}, "weight_others": 0.01})
    total = sb.total({"freq": jnp.asarray(2.0), "combd_g": jnp.asarray(3.0)},
                     jnp.asarray(10.0))
    np.testing.assert_allclose(float(total), 45 * 2 + 3 + 0.1, rtol=1e-6)


@pytest.mark.slow
def test_avocodo_codec_streaming_protocol(rng):
    """AvocodoModel wrapped in CodecModel streams the deployment graph:
    encode_stream tokens == offline encode, decode_stream == the batched
    full-rate head with folded params (bench.py --model avocodo path)."""
    from hilcodec_tpu.models.codec import CodecModel
    from hilcodec_tpu.ops.rvq import ResidualVQ

    codec = AvocodoModel(channels_enc=8, channels_dec=8, n_fft_base=16,
                         n_residual_enc=1, n_residual_dec=1,
                         strides=(4, 2, 4, 2), vq_dim=16)
    model = CodecModel(codec, ResidualVQ(dim=16, codebook_size=32,
                                         num_quantizers=4,
                                         kmeans_init=False))
    params, vq_state = model.init(jax.random.PRNGKey(0))
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(
        jax.random.PRNGKey(1), vq_state["embed"].shape, jnp.float32)
    params = model.fold_params(params)

    hop = model.hop_length
    wav = jnp.asarray((rng.standard_normal((2, 1, hop * 6)) * 0.3)
                      .astype(np.float32))
    cache_enc, cache_dec = model.init_cache(2)

    tokens_off = model.encode(params, vq_state, wav)
    tokens, _ = model.encode_stream(params, vq_state, wav, cache_enc)
    np.testing.assert_array_equal(np.asarray(tokens),
                                  np.asarray(tokens_off))

    out, _ = model.decode_stream(params, vq_state, tokens, cache_dec)
    full = codec.decoder.apply(
        params["decoder"],
        __import__("hilcodec_tpu.ops.rvq", fromlist=["dequantize"])
        .dequantize(tokens, vq_state["embed"]).swapaxes(1, 2),
        return_list=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=2e-4, atol=2e-4)
