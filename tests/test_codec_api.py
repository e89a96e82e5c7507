import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.models.codec import CodecModel
from hilcodec_tpu.utils.hparams import load_config


@pytest.fixture(scope="module")
def model(reference_dir):
    hp = load_config(os.path.join(reference_dir, "configs",
                                  "hilcodec_speech.yaml"))
    return CodecModel.from_config(hp.model_kwargs.to_dict())


@pytest.fixture(scope="module")
def state(model):
    params, vq_state = model.init(jax.random.PRNGKey(0))
    # give the codebooks nonzero content (kmeans_init leaves them zero)
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(
        jax.random.PRNGKey(1), vq_state["embed"].shape) * 2.0
    return params, vq_state


def test_speech_config_shapes(model):
    assert model.vq.num_quantizers == 8
    assert model.vq.dropout_index == (2, 4, 8)
    assert model.hop_length == 320


@pytest.mark.slow
def test_training_forward(model, state, rng):
    params, vq_state = state
    wav = (rng.standard_normal((2, 1, 320 * 8)) * 0.3).astype(np.float32)
    wav_g, new_vq, loss_vq, n_rep = model.forward(
        params, vq_state, jnp.asarray(wav), jax.random.PRNGKey(2),
        n=jnp.asarray(4))
    assert wav_g.shape == wav.shape
    assert wav_g.dtype == jnp.float32
    assert float(loss_vq) >= 0
    assert n_rep.shape == (8,)


def test_offline_roundtrip_shapes(model, state, rng):
    params, vq_state = state
    wav = (rng.standard_normal((1, 1, 320 * 16)) * 0.3).astype(np.float32)
    tok = model.encode(params, vq_state, jnp.asarray(wav), n=4)
    assert tok.shape == (4, 1, 16)
    out = model.decode(params, vq_state, tok)
    assert out.shape == (1, 1, 320 * 16)


@pytest.mark.slow
def test_stream_equals_offline(model, state, rng):
    """Scan-carried streaming tokens == whole-utterance tokens; streaming
    decode == offline decode (the property replacing the reference's manual
    parity notebook, scripts/HILCodec Onnx.ipynb)."""
    params, vq_state = state
    L = 12
    wav = (rng.standard_normal((1, 1, 320 * L)) * 0.3).astype(np.float32)

    tok_off = np.asarray(model.encode(params, vq_state, jnp.asarray(wav)))

    cache_enc, cache_dec = model.init_cache(1)
    tok_st, _ = model.encode_stream(params, vq_state, jnp.asarray(wav),
                                    cache_enc)
    tok_st = np.asarray(tok_st)
    match = (tok_off == tok_st).mean()
    assert match > 0.99, f"stream/offline token match {match}"

    wav_off = np.asarray(model.decode(params, vq_state, jnp.asarray(tok_st)))
    wav_st, _ = model.decode_stream(params, vq_state, jnp.asarray(tok_st),
                                    cache_dec)
    np.testing.assert_allclose(wav_off, np.asarray(wav_st), rtol=2e-4,
                               atol=2e-4)


def test_stream_block_sizes_agree(model, state, rng):
    params, vq_state = state
    L = 12
    wav = (rng.standard_normal((1, 1, 320 * L)) * 0.3).astype(np.float32)
    cache_enc, _ = model.init_cache(1)
    t1, _ = model.encode_stream(params, vq_state, jnp.asarray(wav),
                                cache_enc, frames_per_step=1)
    t4, _ = model.encode_stream(params, vq_state, jnp.asarray(wav),
                                cache_enc, frames_per_step=4)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t4))


@pytest.mark.slow
def test_stream_unroll_parity(model, state, rng):
    """unroll>1 is a pure scheduling hint: tokens and wav bit-match."""
    params, vq_state = state
    L = 12
    wav = (rng.standard_normal((1, 1, 320 * L)) * 0.3).astype(np.float32)
    cache_enc, cache_dec = model.init_cache(1)
    t1, ce1 = model.encode_stream(params, vq_state, jnp.asarray(wav),
                                  cache_enc)
    t4, ce4 = model.encode_stream(params, vq_state, jnp.asarray(wav),
                                  cache_enc, unroll=4)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t4))
    for a, b in zip(ce1, ce4):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    w1, _ = model.decode_stream(params, vq_state, t1, cache_dec)
    w4, _ = model.decode_stream(params, vq_state, t1, cache_dec, unroll=4)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w4), atol=0)


@pytest.mark.slow
def test_stream_chunks_parity(model, state, rng):
    """stream_chunks=G (per-frame chunked group execution) matches the
    flat path: tokens equal, wav and caches allclose."""
    params, vq_state = state
    L, B = 6, 4
    wav = (rng.standard_normal((B, 1, 320 * L)) * 0.3).astype(np.float32)
    cache_enc, cache_dec = model.init_cache(B)
    t1, ce1 = model.encode_stream(params, vq_state, jnp.asarray(wav),
                                  cache_enc)
    t2, ce2 = model.encode_stream(params, vq_state, jnp.asarray(wav),
                                  cache_enc, stream_chunks=2)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    for a, b in zip(ce1, ce2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    w1, cd1 = model.decode_stream(params, vq_state, t1, cache_dec)
    w2, cd2 = model.decode_stream(params, vq_state, t1, cache_dec,
                                  stream_chunks=2)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(cd1, cd2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_fused_encdec_scan_parity(model, state, rng):
    """encode_decode_stream (one scan) == encode_stream then decode_stream
    (two scans): tokens and wav bitwise, caches bitwise."""
    params, vq_state = state
    L, B = 8, 2
    wav = (rng.standard_normal((B, 1, 320 * L)) * 0.3).astype(np.float32)
    cache_enc, cache_dec = model.init_cache(B)
    t1, ce1 = model.encode_stream(params, vq_state, jnp.asarray(wav),
                                  cache_enc, stream_chunks=1)
    w1, cd1 = model.decode_stream(params, vq_state, t1, cache_dec,
                                  stream_chunks=1)
    t2, w2, ce2, cd2 = model.encode_decode_stream(
        params, vq_state, jnp.asarray(wav), cache_enc, cache_dec)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    for a, b in zip(ce1 + cd1, ce2 + cd2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_cast_streaming_params(model, state):
    """kernels_only casts exactly the rank>=3 leaves; full cast casts all;
    the bf16 program runs end-to-end with bf16 caches and f32 tokens."""
    from hilcodec_tpu.models.codec import cast_streaming_params
    params, vq_state = state
    folded = model.fold_params(params)
    pw = cast_streaming_params(folded, jnp.bfloat16, kernels_only=True)
    leaves_w = jax.tree.leaves(pw)
    for x in leaves_w:
        assert x.dtype == (jnp.bfloat16 if x.ndim >= 3 else jnp.float32)
    pf = cast_streaming_params(folded, jnp.bfloat16, kernels_only=False)
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(pf))

    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 1, 320 * 4)) * 0.3, jnp.bfloat16)
    ce, cd = model.init_cache(1, jnp.bfloat16)
    tok, out, ce, cd = model.encode_decode_stream(pf, vq_state, wav, ce, cd)
    assert tok.dtype == jnp.int32
    assert out.dtype == jnp.bfloat16
    assert ce[0].dtype == jnp.bfloat16
    # bf16w with f32 activations also runs (weights upcast at the conv)
    ce32, cd32 = model.init_cache(1)
    tok2, out2, _, _ = model.encode_decode_stream(
        pw, vq_state, wav.astype(jnp.float32), ce32, cd32)
    assert out2.dtype == jnp.float32


def test_stream_chunks_auto_resolution():
    from hilcodec_tpu.models.codec import _resolve_chunks
    assert _resolve_chunks(None, 128) == 1       # peak regime already
    assert _resolve_chunks(None, 256) == 1       # measured within 1% of peak
    assert _resolve_chunks(None, 384) == 3       # groups of 128
    assert _resolve_chunks(None, 512) == 4
    assert _resolve_chunks(None, 200) == 1       # not divisible -> flat
    assert _resolve_chunks(1, 512) == 1          # explicit overrides
    assert _resolve_chunks(8, 512) == 8
