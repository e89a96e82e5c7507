import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.models.hilcodec import HILCodec, Encoder, Decoder
from hilcodec_tpu.utils.hparams import load_config

RES3 = 0.5773502691896258


@pytest.fixture(scope="module")
def codec():
    return HILCodec(res_scale_enc=RES3, res_scale_dec=RES3)


@pytest.fixture(scope="module")
def params(codec):
    return codec.init(jax.random.PRNGKey(0))


def test_from_reference_config(reference_dir):
    hp = load_config(os.path.join(reference_dir, "configs",
                                  "hilcodec_music.yaml"))
    codec = HILCodec.from_config(hp.model_kwargs.to_dict())
    assert codec.hop_length == 320
    assert codec.encoder.n_filters == 64
    assert codec.decoder.n_filters == 96


def test_enc_cache_layout_matches_reference_npz(codec, reference_dir):
    """Cache pytree must match onnx/hil_speech_cache_enc.npz exactly
    (22 tensors, 32511 floats; SURVEY.md §2.12)."""
    ref = np.load(os.path.join(reference_dir, "onnx",
                               "hil_speech_cache_enc.npz"))
    cache = codec.encoder.init_cache(1)
    assert len(cache) == len(ref.files) == 22
    total = 0
    for i, name in enumerate(sorted(ref.files, key=lambda s: int(s[4:]))):
        assert tuple(cache[i].shape) == ref[name].shape, \
            f"{name}: {cache[i].shape} vs {ref[name].shape}"
        total += cache[i].size
    assert total == 32511


def test_dec_cache_layout_matches_reference_npz(codec, reference_dir):
    ref = np.load(os.path.join(reference_dir, "onnx",
                               "hil_speech_cache_dec.npz"))
    cache = codec.decoder.init_cache(1)
    assert len(cache) == len(ref.files) == 30
    total = 0
    for i, name in enumerate(sorted(ref.files, key=lambda s: int(s[4:]))):
        assert tuple(cache[i].shape) == ref[name].shape, \
            f"{name}: {cache[i].shape} vs {ref[name].shape}"
        total += cache[i].size
    assert total == 43968


def test_encoder_batch_stream_equivalence(codec, params, rng):
    B, hop = 1, codec.hop_length
    n_frames, chunk = 8, 2
    wav = (rng.standard_normal((B, 1, hop * n_frames)) * 0.3).astype(
        np.float32)
    full = np.asarray(codec.encoder.apply(params["encoder"],
                                          jnp.asarray(wav)))
    assert full.shape == (B, 128, n_frames)

    cache = codec.encoder.init_cache(B)
    step = jax.jit(codec.encoder.step)
    outs = []
    for i in range(n_frames // chunk):
        xi = jnp.asarray(wav[:, :, i * chunk * hop:(i + 1) * chunk * hop])
        y, cache = step(params["encoder"], cache, xi)
        outs.append(np.asarray(y))
    stream = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(full, stream, rtol=2e-4, atol=2e-4)


def test_decoder_batch_stream_equivalence(codec, params, rng):
    B, n_frames, chunk = 1, 8, 2
    z = rng.standard_normal((B, 128, n_frames)).astype(np.float32)
    full = np.asarray(codec.decoder.apply(params["decoder"], jnp.asarray(z)))
    assert full.shape == (B, 1, n_frames * codec.hop_length)

    cache = codec.decoder.init_cache(B)
    step = jax.jit(codec.decoder.step)
    outs = []
    for i in range(n_frames // chunk):
        zi = jnp.asarray(z[:, :, i * chunk:(i + 1) * chunk])
        y, cache = step(params["decoder"], cache, zi)
        outs.append(np.asarray(y))
    stream = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(full, stream, rtol=2e-4, atol=2e-4)


def test_fold_params_preserves_forward(codec, params, rng):
    """remove_weight_norm + merge_scaling must not change outputs.

    Random init has res_scale_param == 0 (zero_init), so also perturb the
    scale params to nonzero before folding.
    """
    p = jax.tree.map(lambda x: x, params)  # shallow copy

    def bump_scales(d):
        if isinstance(d, dict):
            for k, v in d.items():
                if k in ("res_scale_param", "scale_param"):
                    d[k] = jnp.ones_like(v) * 0.37
                else:
                    bump_scales(v)
        elif isinstance(d, list):
            for v in d:
                bump_scales(v)

    bump_scales(p)
    folded = codec.fold_params(p)

    B, hop = 1, codec.hop_length
    wav = (rng.standard_normal((B, 1, hop * 4)) * 0.3).astype(np.float32)
    z = np.asarray(codec.encoder.apply(p["encoder"], jnp.asarray(wav)))
    z_f = np.asarray(codec.encoder.apply(folded["encoder"],
                                         jnp.asarray(wav)))
    np.testing.assert_allclose(z, z_f, rtol=2e-4, atol=2e-4)

    y = np.asarray(codec.decoder.apply(p["decoder"], jnp.asarray(z)))
    y_f = np.asarray(codec.decoder.apply(folded["decoder"],
                                         jnp.asarray(z_f)))
    np.testing.assert_allclose(y, y_f, rtol=2e-4, atol=2e-4)

    # folded streaming == folded batch
    cache = codec.encoder.init_cache(B)
    step = jax.jit(codec.encoder.step)
    outs = []
    for i in range(4):
        xi = jnp.asarray(wav[:, :, i * hop:(i + 1) * hop])
        o, cache = step(folded["encoder"], cache, xi)
        outs.append(np.asarray(o))
    np.testing.assert_allclose(z_f, np.concatenate(outs, -1), rtol=2e-4,
                               atol=2e-4)


def test_encoder_l2norm_output_scale(codec, params, rng):
    wav = (rng.standard_normal((2, 1, 320 * 4)) * 0.3).astype(np.float32)
    z = np.asarray(codec.encoder.apply(params["encoder"], jnp.asarray(wav)))
    norms = np.linalg.norm(z, axis=1)
    np.testing.assert_allclose(norms, np.sqrt(128.0), rtol=1e-4)
