"""Arithmetic coder: exact roundtrips and near-entropy code length.

The reference ships no coder at all (LMModel is defined but tokens always
travel at fixed log2(card) bits); these tests pin the rebuild's coder.
"""

import numpy as np
import pytest

from hilcodec_tpu.ops.entropy_coding import (ArithmeticDecoder,
                                             ArithmeticEncoder,
                                             decode_symbols, encode_symbols,
                                             quantize_cdf)


def test_quantize_cdf_invariants(rng):
    for card in (4, 1024):
        p = rng.dirichlet(np.ones(card) * 0.1)
        cdf = quantize_cdf(p)
        freqs = np.diff(cdf)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        assert freqs.min() >= 1
        # big probabilities keep roughly their mass
        i = int(np.argmax(p))
        assert abs(freqs[i] / (1 << 16) - p[i]) < 2e-2


def test_roundtrip_uniform(rng):
    card = 1024
    cdf = quantize_cdf(np.full(card, 1.0 / card))
    syms = rng.integers(0, card, 500)
    data = encode_symbols(syms, [cdf] * len(syms))
    out = decode_symbols(data, [cdf] * len(syms))
    np.testing.assert_array_equal(syms, out)
    # uniform coding costs ~log2(1024) = 10 bits/symbol
    bits = len(data) * 8 / len(syms)
    assert 9.9 < bits < 10.3


def test_roundtrip_skewed_beats_fixed_rate(rng):
    """A peaky distribution must code FAR below the fixed 10 bits/token."""
    card = 1024
    p = np.full(card, 0.02 / (card - 1))
    p[7] = 0.98
    cdf = quantize_cdf(p)
    syms = rng.choice(card, 2000, p=p / p.sum())
    data = encode_symbols(syms, [cdf] * len(syms))
    out = decode_symbols(data, [cdf] * len(syms))
    np.testing.assert_array_equal(syms, out)
    bits = len(data) * 8 / len(syms)
    entropy = -(p * np.log2(p)).sum()
    assert bits < entropy + 0.3           # near-entropy
    assert bits < 2.0                     # << 10 fixed


def test_roundtrip_varying_cdfs(rng):
    """Per-symbol cdfs (the LM case: a fresh distribution every step)."""
    card = 64
    cdfs, syms = [], []
    for i in range(300):
        p = rng.dirichlet(np.ones(card) * (0.05 + (i % 7) * 0.2))
        cdfs.append(quantize_cdf(p))
        syms.append(rng.choice(card, p=p))
    syms = np.array(syms)
    data = encode_symbols(syms, cdfs)
    np.testing.assert_array_equal(decode_symbols(data, cdfs), syms)


def test_rare_symbol_roundtrip():
    """Symbols the model considers (nearly) impossible still roundtrip —
    the freq>=1 floor in quantize_cdf guarantees decodability."""
    card = 16
    p = np.zeros(card)
    p[0] = 1.0
    cdf = quantize_cdf(p)
    syms = np.array([0, 15, 0, 7, 0])
    data = encode_symbols(syms, [cdf] * len(syms))
    np.testing.assert_array_equal(decode_symbols(data, [cdf] * 5), syms)


def test_lm_causal_bitwise_independence(rng):
    """Position t's LM probabilities are BITWISE independent of positions
    > t (causal masking makes future contributions exact zeros) — the
    property scripts/entropy_code.py relies on to let the encoder
    teacher-force one apply while the decoder re-applies on prefixes."""
    import jax
    import jax.numpy as jnp
    from hilcodec_tpu.models.encodec import LMModel

    lm = LMModel(n_q=2, card=16, dim=16, num_heads=2, num_layers=2,
                 past_context=8)
    params = lm.init(jax.random.PRNGKey(0))
    fn = jax.jit(lambda x: lm.apply(params, x)[0])
    full = rng.integers(0, 17, (1, 2, 6))
    for t in range(6):
        trunc = full.copy()
        trunc[:, :, t + 1:] = 0              # decoder sees 0s past t
        a = np.asarray(fn(jnp.asarray(full)))[:, :, :, t]
        b = np.asarray(fn(jnp.asarray(trunc)))[:, :, :, t]
        np.testing.assert_array_equal(a, b)


def test_lm_driven_roundtrip(rng):
    """End-to-end entropy_code logic on a tiny untrained LM: encode with
    teacher-forced probs, decode with prefix probs, exact token recovery."""
    import jax
    import jax.numpy as jnp
    from hilcodec_tpu.models.encodec import LMModel

    n_q, card, S = 2, 16, 6
    lm = LMModel(n_q=n_q, card=card, dim=16, num_heads=2, num_layers=2,
                 past_context=S)
    params = lm.init(jax.random.PRNGKey(1))
    fn = jax.jit(lambda x: lm.apply(params, x)[0][0])   # [card, n_q, S]
    tokens = rng.integers(0, card, (n_q, S))

    inputs = np.concatenate([np.zeros((1, n_q, 1), np.int64),
                             tokens[None, :, :-1] + 1], axis=2)
    probs = np.asarray(fn(jnp.asarray(inputs)), np.float64)
    enc = ArithmeticEncoder()
    for t in range(S):
        for q in range(n_q):
            enc.encode(quantize_cdf(probs[:, q, t]), int(tokens[q, t]))
    data = enc.finish()

    dec = ArithmeticDecoder(data)
    decoded = np.zeros_like(tokens)
    inp = np.zeros((1, n_q, S), np.int64)
    for t in range(S):
        pr = np.asarray(fn(jnp.asarray(inp)), np.float64)
        for q in range(n_q):
            decoded[q, t] = dec.decode(quantize_cdf(pr[:, q, t]))
        if t + 1 < S:
            inp[0, :, t + 1] = decoded[:, t] + 1
    np.testing.assert_array_equal(decoded, tokens)


def test_streaming_encoder_decoder_objects(rng):
    enc = ArithmeticEncoder()
    card = 32
    p = rng.dirichlet(np.ones(card))
    cdf = quantize_cdf(p)
    syms = rng.integers(0, card, 100)
    for s in syms:
        enc.encode(cdf, int(s))
    data = enc.finish()
    dec = ArithmeticDecoder(data)
    got = [dec.decode(cdf) for _ in range(100)]
    np.testing.assert_array_equal(got, syms)


def test_hilstream_container_roundtrip(rng):
    """utils/bitstream.py: the self-describing container preserves every
    header field and the payload byte-for-byte, and rejects corruption."""
    from hilcodec_tpu.utils.bitstream import (HEADER_BYTES, pack_hilstream,
                                              token_crc32, unpack_hilstream)
    payload = bytes(rng.integers(0, 256, 199, dtype=np.uint8))
    toks = rng.integers(0, 1024, (12, 8, 150))
    meta = dict(n_q=8, card=1024, seg_tokens=150, n_seg=12,
                sampling_rate=24000, hop=320, lm_dim=200, lm_heads=8,
                lm_layers=5, token_crc=token_crc32(toks))
    blob = pack_hilstream(payload, **meta)
    assert len(blob) == HEADER_BYTES + len(payload)
    got, got_payload = unpack_hilstream(blob)
    assert got_payload == payload
    assert got.pop("version") == 2
    assert got == meta
    # the checksum is layout- and value-sensitive
    assert token_crc32(toks) == token_crc32(toks.astype(np.int32))
    toks2 = toks.copy()
    toks2[0, 0, 0] ^= 1
    assert token_crc32(toks2) != meta["token_crc"]

    with pytest.raises(ValueError, match="magic"):
        unpack_hilstream(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        unpack_hilstream(blob[: HEADER_BYTES - 1])
    with pytest.raises(ValueError, match="version"):
        unpack_hilstream(blob[:4] + bytes([99]) + blob[5:])
    with pytest.raises(ValueError, match="missing"):
        pack_hilstream(payload, n_q=8)
    with pytest.raises(ValueError, match="unknown"):
        pack_hilstream(payload, bogus=1, **meta)


def test_hilstream_file_io(tmp_path, rng):
    from hilcodec_tpu.utils.bitstream import (read_hilstream,
                                              write_hilstream)
    payload = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    path = str(tmp_path / "s.hilstream")
    n = write_hilstream(path, payload, n_q=3, card=32, seg_tokens=8,
                        n_seg=4, sampling_rate=16000, hop=64, lm_dim=16,
                        lm_heads=4, lm_layers=1, token_crc=0xDEADBEEF)
    import os
    assert os.path.getsize(path) == n
    meta, got = read_hilstream(path)
    assert got == payload and meta["card"] == 32


def test_native_coder_bit_identical(rng):
    """The C++ backend (csrc/rangecoder.cpp) must produce the IDENTICAL
    bitstream to the Python format reference, and each side must decode
    the other's output — per-symbol varying cdfs, skewed and near-uniform."""
    from hilcodec_tpu.ops import native_coder
    if not native_coder.available():
        pytest.skip("g++ unavailable — native coder not built")
    for card, n in ((32, 500), (1024, 300)):
        cdfs = []
        syms = np.empty(n, np.int64)
        for i in range(n):
            alpha = 0.05 if i % 2 else 5.0
            p = rng.dirichlet(np.ones(card) * alpha)
            cdfs.append(quantize_cdf(p))
            syms[i] = rng.choice(card, p=p)
        py = encode_symbols(syms, cdfs, native=False)
        nat = encode_symbols(syms, cdfs, native=True)
        assert nat == py                       # bit-identical format
        np.testing.assert_array_equal(
            decode_symbols(py, cdfs, native=True), syms)
        np.testing.assert_array_equal(
            decode_symbols(nat, cdfs, native=False), syms)


def test_native_coder_throughput(rng):
    """Sanity (not a perf assert): the native path should beat the Python
    loop by a wide margin; log the ratio for the record."""
    import time
    from hilcodec_tpu.ops import native_coder
    if not native_coder.available():
        pytest.skip("g++ unavailable — native coder not built")
    card, n = 1024, 3000
    p = rng.dirichlet(np.ones(card) * 0.3)
    cdf = quantize_cdf(p)
    cdfs = [cdf] * n
    syms = rng.choice(card, size=n, p=p).astype(np.int64)
    # warm both paths (lib load, page faults) then best-of-3 each — a cold
    # first call used to flip the comparison
    encode_symbols(syms, cdfs, native=True)
    encode_symbols(syms[:64], cdfs[:64], native=False)

    def best_of(k, fn):
        ts = []
        for _ in range(k):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    t_nat, nat = best_of(3, lambda: encode_symbols(syms, cdfs, native=True))
    t_py, py = best_of(3, lambda: encode_symbols(syms, cdfs, native=False))
    assert nat == py
    # native must at least not be slower; typical ratio is >10x
    assert t_nat < t_py, (t_nat, t_py)
    print(f"\nnative {n/t_nat:,.0f} sym/s vs python {n/t_py:,.0f} sym/s "
          f"({t_py/t_nat:.0f}x)")
