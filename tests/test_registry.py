import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.models.registry import build_model


def test_build_hilcodec():
    m = build_model("hilcodec", {"channels_enc": 8, "channels_dec": 8,
                                 "n_fft_base": 16, "n_residual_enc": 1,
                                 "n_residual_dec": 1, "strides": [4, 2],
                                 "res_scale_enc": 0.577,
                                 "res_scale_dec": 0.577,
                                 "vq_kwargs": {"dim": 16,
                                               "codebook_size": 32,
                                               "num_quantizers": 2,
                                               "kmeans_init": False}})
    assert m.hop_length == 8


def test_build_encodec_full_codec_stream(rng):
    """EnCodec through the generic CodecModel: offline == streaming
    (the encodec streaming.py:452-466 full-graph capability)."""
    m = build_model("encodec", {"channels_enc": 8, "channels_dec": 8,
                                "strides": [4, 2], "lstm": 1,
                                "n_residual_layers": 1,
                                "pad_mode": "constant",
                                "vq_kwargs": {"dim": 16,
                                              "codebook_size": 32,
                                              "num_quantizers": 4,
                                              "kmeans_init": False}})
    assert m.hop_length == 8
    params, vq_state = m.init(jax.random.PRNGKey(0))
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(jax.random.PRNGKey(1),
                                          vq_state["embed"].shape) * 2
    wav = (rng.standard_normal((1, 1, 8 * 12)) * 0.3).astype(np.float32)
    tok_off = np.asarray(m.encode(params, vq_state, jnp.asarray(wav)))
    cache_enc, cache_dec = m.init_cache(1)
    tok_st, _ = m.encode_stream(params, vq_state, jnp.asarray(wav),
                                cache_enc)
    assert (tok_off == np.asarray(tok_st)).mean() > 0.99
    wav_off = np.asarray(m.decode(params, vq_state, jnp.asarray(tok_off)))
    wav_st, _ = m.decode_stream(params, vq_state, jnp.asarray(tok_off),
                                cache_dec)
    np.testing.assert_allclose(wav_off, np.asarray(wav_st), rtol=2e-4,
                               atol=2e-4)


def test_build_avocodo_and_audiodec():
    a = build_model("avocodo", {"channels_enc": 8, "channels_dec": 8,
                                "n_fft_base": 16, "n_residual_enc": 1,
                                "n_residual_dec": 1,
                                "strides": [4, 2, 2],
                                "res_scale_enc": 0.577,
                                "res_scale_dec": 0.577,
                                "vq_kwargs": {"dim": 16}})
    assert a.hop_length == 16
    d = build_model("audiodec", {"encode_channels": 4,
                                 "enc_ratios": [2, 4],
                                 "enc_strides": [3, 4], "code_dim": 8,
                                 "codebook_num": 2, "codebook_size": 16,
                                 "decode_channels": 16,
                                 "dec_strides": [4, 3],
                                 "resblock_kernel_size": 5,
                                 "resblock_dilations": [1, 3]})
    assert d.hop_length == 12


def test_unknown_model():
    with pytest.raises(ValueError):
        build_model("nope", {})


def test_vq_config_routing():
    """`vq:` name routing (reference models.py:101-106): "ResidualVQ"
    builds a quantizer, "" runs without one, unknown names are rejected."""
    import jax
    import pytest

    from hilcodec_tpu.models.codec import CodecModel
    from hilcodec_tpu.ops.rvq import NoVQ, ResidualVQ

    kw = dict(channels_enc=8, channels_dec=8, n_residual_enc=1,
              n_residual_dec=1, strides=[4, 2], n_fft_base=16,
              vq_kwargs={"dim": 16, "codebook_size": 32,
                         "num_quantizers": 2, "kmeans_init": False})
    assert isinstance(CodecModel.from_config(dict(kw)).vq, ResidualVQ)

    novq = CodecModel.from_config(dict(kw, vq=""))
    assert isinstance(novq.vq, NoVQ)
    params, vq_state = novq.init(jax.random.PRNGKey(0))
    import jax.numpy as jnp
    wav = jnp.zeros((1, 1, novq.hop_length * 4))
    wav_g, _, loss_vq, n_rep = novq.forward(params, vq_state, wav,
                                            jax.random.PRNGKey(1))
    assert wav_g.shape == wav.shape
    assert float(loss_vq) == 0.0 and n_rep.shape == (0,)
    with pytest.raises(ValueError, match="no quantizer"):
        novq.encode(params, vq_state, wav)

    with pytest.raises(ValueError, match="Unknown vq"):
        CodecModel.from_config(dict(kw, vq="ResidualGainShapeVQ"))


@pytest.mark.slow
def test_build_codec_model_protocol_all_families():
    """build_codec_model returns the full CodecModel protocol for every
    family (infer.py/export.py surface): init -> (params, vq_state),
    streaming caches, fold_params."""
    import jax

    from hilcodec_tpu.models.registry import build_codec_model

    cases = {
        "hilcodec": {"channels_enc": 8, "channels_dec": 8,
                     "n_residual_enc": 1, "n_residual_dec": 1,
                     "strides": [4, 2], "vq_kwargs": {"dim": 16,
                                                      "kmeans_init": False}},
        "avocodo": {"channels_enc": 8, "channels_dec": 8, "n_fft_base": 16,
                    "n_residual_enc": 1, "n_residual_dec": 1,
                    "strides": [4, 2, 4, 2],
                    "vq_kwargs": {"dim": 16, "kmeans_init": False}},
        "audiodec": {},   # shipped defaults (tiny channels break the
                          # per-stage halving math)
    }
    for name, kw in cases.items():
        model = build_codec_model(name, kw)
        assert hasattr(model, "encode_stream"), name
        params, vq_state = model.init(jax.random.PRNGKey(0))
        assert "embed" in vq_state, name
        cache_enc, cache_dec = model.init_cache(1)
        assert len(cache_enc) and len(cache_dec), name
        folded = model.fold_params(params)
        assert folded is not None, name
