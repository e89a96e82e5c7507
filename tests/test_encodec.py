import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.models.encodec import (EncodecModel, LMModel, SLSTM,
                                         StreamingTransformerEncoder)

torch = pytest.importorskip("torch")


def test_slstm_matches_torch(rng):
    """Batch LSTM vs torch.nn.LSTM with identical weights."""
    H, B, T, layers = 8, 2, 12, 2
    m = SLSTM(H, layers)
    params = m.init(jax.random.PRNGKey(0))

    tl = torch.nn.LSTM(H, H, layers)
    with torch.no_grad():
        for li in range(layers):
            getattr(tl, f"weight_ih_l{li}").copy_(
                torch.from_numpy(np.asarray(params["layers"][li]["w_ih"])))
            getattr(tl, f"weight_hh_l{li}").copy_(
                torch.from_numpy(np.asarray(params["layers"][li]["w_hh"])))
            getattr(tl, f"bias_ih_l{li}").copy_(
                torch.from_numpy(np.asarray(params["layers"][li]["b_ih"])))
            getattr(tl, f"bias_hh_l{li}").copy_(
                torch.from_numpy(np.asarray(params["layers"][li]["b_hh"])))

    x = rng.standard_normal((B, H, T)).astype(np.float32)
    ref, _ = tl(torch.from_numpy(x).permute(2, 0, 1))
    ref = ref.permute(1, 2, 0).detach().numpy() + x  # skip connection

    out = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ref, out, rtol=1e-4, atol=1e-5)


def test_slstm_stream_equals_batch(rng):
    m = SLSTM(8, 2)
    params = m.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((1, 8, 20)).astype(np.float32)
    full = np.asarray(m.apply(params, jnp.asarray(x)))
    cache = m.init_cache(1)
    outs = []
    for i in range(4):
        y, cache = m.step(params, cache, jnp.asarray(x[:, :, i * 5:(i + 1) * 5]))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(full, np.concatenate(outs, -1), rtol=1e-4,
                               atol=1e-5)


@pytest.fixture(scope="module")
def enc_model():
    # pad_mode constant so streaming (zero cache) == batch exactly; the
    # reference's reflect default diverges at the sequence start the same
    # way its own streaming graph does.
    return EncodecModel(channels_enc=8, channels_dec=8, strides=(4, 2),
                        lstm=1, vq_dim=16, n_residual_layers=1,
                        pad_mode="constant")


def test_encodec_forward_shapes(enc_model, rng):
    params = enc_model.init(jax.random.PRNGKey(0))
    wav = (rng.standard_normal((2, 1, 8 * 16)) * 0.3).astype(np.float32)
    z = enc_model.encoder.apply(params["encoder"], jnp.asarray(wav))
    assert z.shape == (2, 16, 16)
    y = enc_model.decoder.apply(params["decoder"], z)
    assert y.shape == (2, 1, 8 * 16)


def test_encodec_stream_equals_batch(enc_model, rng):
    """Streaming incl. LSTM (h,c) carry == batch (streaming.py:262-299)."""
    params = enc_model.init(jax.random.PRNGKey(0))
    wav = (rng.standard_normal((1, 1, 8 * 16)) * 0.3).astype(np.float32)
    z_full = np.asarray(enc_model.encoder.apply(params["encoder"],
                                                jnp.asarray(wav)))
    cache = enc_model.encoder.init_cache(1)
    step = jax.jit(enc_model.encoder.step)
    outs = []
    for i in range(4):
        xi = jnp.asarray(wav[:, :, i * 32:(i + 1) * 32])
        y, cache = step(params["encoder"], cache, xi)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(z_full, np.concatenate(outs, -1), rtol=2e-4,
                               atol=2e-4)

    y_full = np.asarray(enc_model.decoder.apply(params["decoder"],
                                                jnp.asarray(z_full)))
    dcache = enc_model.decoder.init_cache(1)
    dstep = jax.jit(enc_model.decoder.step)
    outs = []
    for i in range(4):
        zi = jnp.asarray(z_full[:, :, i * 4:(i + 1) * 4])
        y, dcache = dstep(params["decoder"], dcache, zi)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(y_full, np.concatenate(outs, -1), rtol=2e-4,
                               atol=2e-4)


def test_streaming_transformer_state_carry(rng):
    tr = StreamingTransformerEncoder(dim=16, num_heads=4, num_layers=2,
                                     past_context=8)
    params = tr.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((1, 12, 16)).astype(np.float32)
    full, _, off = tr.apply(params, jnp.asarray(x))
    assert off == 12
    # chunked with state carry
    y1, st, o1 = tr.apply(params, jnp.asarray(x[:, :6]))
    y2, st, o2 = tr.apply(params, jnp.asarray(x[:, 6:]), st, o1)
    out = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
    # the first chunk's tail and second chunk should match the full pass
    np.testing.assert_allclose(np.asarray(full)[:, 6:], out[:, 6:],
                               rtol=2e-3, atol=2e-3)


def test_lm_model(rng):
    lm = LMModel(n_q=4, card=32, dim=16, num_heads=4, num_layers=1)
    params = lm.init(jax.random.PRNGKey(0))
    idx = rng.integers(0, 33, (2, 4, 10)).astype(np.int32)
    probs, states, off = lm.apply(params, jnp.asarray(idx))
    assert probs.shape == (2, 32, 4, 10)
    np.testing.assert_allclose(np.asarray(probs).sum(1),
                               np.ones((2, 4, 10)), rtol=1e-4)


def test_reflect_pad_mode_differs_only_at_start(rng):
    """EnCodec's reflect padding (reference default) vs constant: outputs
    agree after the encoder warm-up region."""
    kw = dict(channels_enc=8, channels_dec=8, strides=(4, 2), lstm=0,
              vq_dim=16, n_residual_layers=1)
    m_r = EncodecModel(pad_mode="reflect", **kw)
    m_c = EncodecModel(pad_mode="constant", **kw)
    params = m_r.init(jax.random.PRNGKey(0))
    wav = (rng.standard_normal((1, 1, 8 * 64)) * 0.3).astype(np.float32)
    z_r = np.asarray(m_r.encoder.apply(params["encoder"], jnp.asarray(wav)))
    z_c = np.asarray(m_c.encoder.apply(params["encoder"], jnp.asarray(wav)))
    assert not np.allclose(z_r[..., :2], z_c[..., :2])
    np.testing.assert_allclose(z_r[..., 16:], z_c[..., 16:], rtol=1e-4,
                               atol=1e-5)


def test_lm_training_reduces_entropy(rng):
    """A few LM steps on fixed tokens reduce next-step cross-entropy."""
    from hilcodec_tpu.train.lm import lm_cross_entropy, lm_train_step
    from hilcodec_tpu.train.optim import make_optimizer

    lm = LMModel(n_q=2, card=16, dim=16, num_heads=4, num_layers=1,
                 past_context=32)
    params = lm.init(jax.random.PRNGKey(0))
    opt, lr = make_optimizer("Adam", {"lr": 1e-2})
    opt_state = opt.init(params)
    tokens = jnp.asarray(rng.integers(0, 16, (2, 2, 24)).astype(np.int32))

    import jax as _jax
    step = _jax.jit(lambda p, s: lm_train_step(lm, opt, p, s, tokens,
                                               jnp.asarray(lr)))
    first = float(lm_cross_entropy(lm, params, tokens))
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < first
