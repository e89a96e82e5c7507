"""Live per-frame entropy-coded token streaming (serve/entropy_live.py):
the LM-driven arithmetic coder moved from the offline CLI into a
frame-in/bytes-out deployment path (VERDICT r4 item 7).

Pins: (1) the streaming LM step (state carry, T=1) produces the SAME
probabilities as the batched teacher-forced apply — so encoder and decoder
share one probability model; (2) incremental settled-bytes feeding
roundtrips bit-exactly; (3) the decoder makes progress BEFORE the stream
finishes (bounded lag), not just at flush."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.models.encodec import LMModel
from hilcodec_tpu.ops.entropy_coding import ArithmeticEncoder, quantize_cdf
from hilcodec_tpu.serve.entropy_live import (LiveTokenDecoder,
                                             LiveTokenEncoder)

SEG = 8
N_Q, CARD = 3, 32


@pytest.fixture(scope="module")
def lm():
    m = LMModel(n_q=N_Q, card=CARD, dim=16, num_heads=2, num_layers=1,
                past_context=SEG)
    return m, m.init(jax.random.PRNGKey(0))


def _tokens(n_frames, rng):
    return rng.integers(0, CARD, size=(n_frames, N_Q)).astype(np.int64)


def test_live_roundtrip_incremental(lm, rng):
    model, params = lm
    toks = _tokens(3 * SEG + 2, rng)     # crosses two segment resets
    enc = LiveTokenEncoder(model, params, seg_tokens=SEG)
    dec = LiveTokenDecoder(model, params, seg_tokens=SEG)

    got = []
    early = 0
    for t in range(len(toks)):
        dec.feed(enc.push(toks[t]))
        frames = dec.pull()              # only what is safely settled
        early += len(frames)
        got.extend(frames)
    dec.feed(enc.finish(), finished=True)
    got.extend(dec.pull_n(len(toks) - len(got)))

    np.testing.assert_array_equal(np.stack(got), toks)
    # the decoder must have made progress before the flush (live, not
    # batch): with 26 frames x 3 tokens the settled prefix is long
    assert early > 0, "decoder only progressed at flush — not live"


def test_streaming_lm_probs_match_batched(lm, rng):
    """The per-frame state-carried LM step must produce the same coding
    decisions (quantized cdfs) as the batched teacher-forced apply that
    scripts/entropy_code.py uses — one probability model, two drivers."""
    model, params = lm
    toks = _tokens(SEG, rng)

    # batched: inputs[t+1] = tokens[t] + 1, inputs[0] = 0 (missing)
    inputs = np.zeros((1, N_Q, SEG), np.int64)
    inputs[0, :, 1:] = toks[:-1].T + 1
    probs_b, _, _ = model.apply(params, jnp.asarray(inputs))
    probs_b = np.asarray(probs_b, np.float64)[0]      # [card, n_q, T]

    from hilcodec_tpu.serve.entropy_live import _lm_stepper
    run = _lm_stepper(model, params)
    states, offset, prev = None, 0, None
    for t in range(SEG):
        probs, states, offset = run(prev, states, offset)
        for q in range(N_Q):
            np.testing.assert_array_equal(
                quantize_cdf(probs[:, q]),
                quantize_cdf(probs_b[:, q, t]),
                err_msg=f"t={t} q={q}")
        prev = toks[t]


def test_live_bytes_equal_oneshot(lm, rng):
    """settled_bytes + finish_tail == coding all symbols through a plain
    ArithmeticEncoder with the same cdf sequence (no incremental drift)."""
    model, params = lm
    toks = _tokens(SEG + 3, rng)
    enc = LiveTokenEncoder(model, params, seg_tokens=SEG)
    blob = b"".join(enc.push(t) for t in toks) + enc.finish()

    from hilcodec_tpu.serve.entropy_live import _lm_stepper
    run = _lm_stepper(model, params)
    ref = ArithmeticEncoder()
    states, offset, prev, t_in_seg = None, 0, None, 0
    for t in range(len(toks)):
        if t_in_seg == SEG:
            states, offset, prev, t_in_seg = None, 0, None, 0
        probs, states, offset = run(prev, states, offset)
        for q in range(N_Q):
            ref.encode(quantize_cdf(probs[:, q]), int(toks[t, q]))
        prev = toks[t]
        t_in_seg += 1
    assert blob == ref.finish()
