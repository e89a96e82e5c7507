"""Slot-batched serving: engine parity + TCP protocol end-to-end.

The load-bearing property: a client stream multiplexed through the S-slot
batched engine — attaching mid-flight, skipping ticks, sharing steps with
other streams, reusing a slot another stream dirtied — must produce tokens
and PCM bitwise identical to running that stream ALONE through the plain
streaming drivers (encode_stream/decode_stream)."""

import asyncio
import json
import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.models.codec import CodecModel
from hilcodec_tpu.models.hilcodec import HILCodec
from hilcodec_tpu.ops.rvq import ResidualVQ
from hilcodec_tpu.serve import CodecServer, SlotEngine

HOP = 4 * 2 * 4  # strides (4, 2) * n_fft_base//2


@pytest.fixture(scope="module")
def tiny():
    codec = HILCodec(channels_enc=8, channels_dec=8, n_residual_enc=1,
                     n_residual_dec=1, strides=(4, 2), n_fft_base=16,
                     vq_dim=16, res_scale_enc=0.577, res_scale_dec=0.577)
    vq = ResidualVQ(dim=16, codebook_size=32, num_quantizers=3,
                    kmeans_init=False, decay=0.99, ema_num_threshold=0.5,
                    ema_num_initial=0.5, dropout=False)
    model = CodecModel(codec, vq)
    params, vq_state = model.init(jax.random.PRNGKey(0))
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(
        jax.random.PRNGKey(1), vq_state["embed"].shape) * 2.0
    return model, params, vq_state


def _stream_ref(model, params, vq_state, wav, mode="roundtrip"):
    """Single-stream oracle via the plain scan drivers (folded params,
    matching the engine's fold=True default)."""
    fp = model.fold_params(params)
    hop = model.hop_length
    ce, cd = model.init_cache(1)
    tok, _ = model.encode_stream(fp, vq_state, wav[None, None, :], ce)
    if mode == "encode":
        return np.asarray(tok)[:, 0, :]
    out, _ = model.decode_stream(fp, vq_state, tok, cd)
    return np.asarray(tok)[:, 0, :], np.asarray(out)[0, 0]


def _q16(x):
    """Host-side int16 wire quantization (identical to the device enc16:
    scaling by 2**15 is exact in f32/f64, np.round == jnp.round ==
    round-half-even, so the two sides agree bitwise)."""
    return np.clip(np.round(np.asarray(x, np.float64) * 32768.0),
                   -32768, 32767).astype(np.int16)


def _dq16(x16):
    return x16.astype(np.float32) / 32768.0


def _frames(wav, hop):
    return [wav[i * hop:(i + 1) * hop] for i in range(len(wav) // hop)]


def test_engine_parity_staggered_streams(tiny, rng):
    """Three streams attach at different ticks, skip ticks, and detach at
    different times; each one's tokens+PCM must equal its solo run."""
    model, params, vq_state = tiny
    hop = model.hop_length
    eng = SlotEngine(model, params, vq_state, slots=4, mode="roundtrip")

    wavs = {name: (rng.standard_normal(hop * 6) * 0.3).astype(np.float32)
            for name in "abc"}
    # the engine's wire format is int16: the solo oracle must see the same
    # dequantized floats, and PCM compares exactly at 16-bit
    refs = {k: _stream_ref(model, params, vq_state, _dq16(_q16(w)))
            for k, w in wavs.items()}
    frames = {k: _frames(w, hop) for k, w in wavs.items()}
    got = {k: {"tokens": [], "pcm": []} for k in wavs}

    # schedule: a starts at tick 0, b at tick 1, c at tick 3; b skips
    # tick 4 entirely (its cache must hold); a ends first
    slot_of = {}
    schedule = [("a",), ("a", "b"), ("a", "b"), ("a", "b", "c"),
                ("a", "c"), ("a", "b", "c"), ("b", "c"), ("b", "c"),
                ("c",)]
    cursor = {k: 0 for k in wavs}
    for tick_streams in schedule:
        for k in tick_streams:
            if k not in slot_of:
                slot_of[k] = eng.attach()
            eng.submit(slot_of[k], frames[k][cursor[k]])
            cursor[k] += 1
        out = eng.tick()
        for k in tick_streams:
            res = out[slot_of[k]]
            got[k]["tokens"].append(res["tokens"])
            got[k]["pcm"].append(res["pcm"])
        for k, n in cursor.items():
            if k in slot_of and n == len(frames[k]):
                eng.detach(slot_of.pop(k))

    for k in wavs:
        ref_tok, ref_pcm = refs[k]
        tok = np.stack(got[k]["tokens"], axis=1)      # [n_q, L]
        pcm = np.concatenate(got[k]["pcm"])
        np.testing.assert_array_equal(tok, ref_tok)
        np.testing.assert_array_equal(pcm, _q16(ref_pcm))


def test_engine_slot_reuse_is_clean(tiny, rng):
    """A fresh stream in a slot another stream dirtied must match a fresh
    solo run exactly — the masked reset wipes residual cache state."""
    model, params, vq_state = tiny
    hop = model.hop_length
    eng = SlotEngine(model, params, vq_state, slots=1, mode="roundtrip")

    dirty = (rng.standard_normal(hop * 3) * 0.5).astype(np.float32)
    s = eng.attach()
    for f in _frames(dirty, hop):
        eng.submit(s, f)
        eng.tick()
    eng.detach(s)

    fresh = (rng.standard_normal(hop * 4) * 0.3).astype(np.float32)
    ref_tok, ref_pcm = _stream_ref(model, params, vq_state,
                                   _dq16(_q16(fresh)))
    s2 = eng.attach()
    assert s2 == s  # same physical slot row
    toks, pcms = [], []
    for f in _frames(fresh, hop):
        eng.submit(s2, f)
        res = eng.tick()[s2]
        toks.append(res["tokens"])
        pcms.append(res["pcm"])
    np.testing.assert_array_equal(np.stack(toks, axis=1), ref_tok)
    np.testing.assert_array_equal(np.concatenate(pcms), _q16(ref_pcm))


def test_engine_decode_mode(tiny, rng):
    model, params, vq_state = tiny
    hop = model.hop_length
    wav = (rng.standard_normal(hop * 5) * 0.3).astype(np.float32)
    ref_tok, ref_pcm = _stream_ref(model, params, vq_state, wav)

    eng = SlotEngine(model, params, vq_state, slots=2, mode="decode")
    s = eng.attach()
    pcms = []
    for t in range(ref_tok.shape[1]):
        eng.submit(s, ref_tok[:, t])
        pcms.append(eng.tick()[s]["pcm"])
    np.testing.assert_array_equal(np.concatenate(pcms), _q16(ref_pcm))


def test_engine_mesh_sharded_parity(tiny, rng):
    """Slots sharded over the 8-device CPU mesh: per-stream outputs must
    still equal the solo oracle bitwise — serving is embarrassingly
    parallel over streams (zero collectives in the compiled step)."""
    from hilcodec_tpu.parallel.mesh import data_parallel_mesh

    model, params, vq_state = tiny
    hop = model.hop_length
    mesh = data_parallel_mesh()
    eng = SlotEngine(model, params, vq_state, slots=8, mode="roundtrip",
                     mesh=mesh)

    wav = (rng.standard_normal(hop * 5) * 0.3).astype(np.float32)
    ref_tok, ref_pcm = _stream_ref(model, params, vq_state,
                                   _dq16(_q16(wav)))
    # occupy two slots on different devices; the second mirrors the first
    s1, s2 = eng.attach(), eng.attach()
    toks, pcms = [], []
    for f in _frames(wav, hop):
        eng.submit(s1, f)
        eng.submit(s2, f)
        out = eng.tick()
        toks.append(out[s1]["tokens"])
        pcms.append(out[s1]["pcm"])
        np.testing.assert_array_equal(out[s2]["tokens"],
                                      out[s1]["tokens"])
    np.testing.assert_array_equal(np.stack(toks, axis=1), ref_tok)
    np.testing.assert_array_equal(np.concatenate(pcms), _q16(ref_pcm))


def test_engine_slots_exhausted(tiny):
    model, params, vq_state = tiny
    eng = SlotEngine(model, params, vq_state, slots=1, mode="encode")
    eng.attach()
    with pytest.raises(RuntimeError):
        eng.attach()


# --------------------------------------------------------------------- TCP

_LEN = struct.Struct("<I")


async def _client_roundtrip(port, pcm16_frames, n_q, hop):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    writer.write(b'{"mode": "auto"}\n')
    hdr = json.loads((await reader.readline()).decode())
    assert hdr["ok"], hdr
    assert hdr["hop"] == hop and hdr["n_q"] == n_q
    toks, pcms = [], []
    for f in pcm16_frames:
        writer.write(_LEN.pack(f.nbytes) + f.tobytes())
        await writer.drain()
        (ln,) = _LEN.unpack(await reader.readexactly(4))
        payload = await reader.readexactly(ln)
        arr = np.frombuffer(payload, np.int16)
        toks.append(arr[:n_q].copy())
        pcms.append(arr[n_q:].copy())
    writer.close()
    return np.stack(toks, axis=1), np.concatenate(pcms)


def test_tcp_two_concurrent_clients(tiny, rng):
    """Two clients over real localhost sockets, interleaved on the shared
    engine: token streams must equal their solo oracles (PCM goes through
    int16 on the wire, so it is compared at 16-bit precision)."""
    model, params, vq_state = tiny
    hop = model.hop_length
    eng = SlotEngine(model, params, vq_state, slots=4, mode="roundtrip")

    wav_a = (rng.standard_normal(hop * 6) * 0.3).astype(np.float32)
    wav_b = (rng.standard_normal(hop * 6) * 0.3).astype(np.float32)

    async def go():
        srv = CodecServer(eng, sr=24000, port=0)
        await srv.start()
        try:
            fa = [(np.clip(np.round(f * 32768), -32768, 32767)
                   .astype(np.int16)) for f in _frames(wav_a, hop)]
            fb = [(np.clip(np.round(f * 32768), -32768, 32767)
                   .astype(np.int16)) for f in _frames(wav_b, hop)]
            return await asyncio.gather(
                _client_roundtrip(srv.port, fa, eng.n_q, hop),
                _client_roundtrip(srv.port, fb, eng.n_q, hop))
        finally:
            await srv.stop()

    (tok_a, pcm_a), (tok_b, pcm_b) = asyncio.run(go())

    for wav, tok, pcm in ((wav_a, tok_a, pcm_a), (wav_b, tok_b, pcm_b)):
        # the wire quantizes input PCM to int16 — the oracle must see the
        # same dequantized floats the server saw
        ref_tok, ref_pcm = _stream_ref(model, params, vq_state,
                                       _dq16(_q16(wav)))
        np.testing.assert_array_equal(tok, ref_tok)
        np.testing.assert_array_equal(pcm, _q16(ref_pcm))

    assert eng.stats["frames"] == 12
    assert not eng.pending()


def test_tcp_malformed_frame_rejected_without_collateral(tiny, rng):
    """A short frame payload must get an error + close for THAT client
    only — it must not reach the tick loop and stall other streams
    (the round-4 advisor's high-severity finding)."""
    model, params, vq_state = tiny
    hop = model.hop_length
    eng = SlotEngine(model, params, vq_state, slots=4, mode="roundtrip")
    wav = (rng.standard_normal(hop * 4) * 0.3).astype(np.float32)

    async def bad_client(port):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b'{"mode": "auto"}\n')
        hdr = json.loads((await reader.readline()).decode())
        assert hdr["ok"]
        short = np.zeros(hop // 2, np.int16).tobytes()  # wrong length
        writer.write(_LEN.pack(len(short)) + short)
        await writer.drain()
        (ln,) = _LEN.unpack(await reader.readexactly(4))
        err = json.loads(await reader.readexactly(ln))
        writer.close()
        return err

    async def go():
        srv = CodecServer(eng, sr=24000, port=0)
        await srv.start()
        try:
            frames = [_q16(f) for f in _frames(wav, hop)]
            good, err = await asyncio.gather(
                _client_roundtrip(srv.port, frames, eng.n_q, hop),
                bad_client(srv.port))
            return good, err
        finally:
            await srv.stop()

    (tok, pcm), err = asyncio.run(go())
    assert err["ok"] is False and "payload" in err["error"]
    ref_tok, ref_pcm = _stream_ref(model, params, vq_state,
                                   _dq16(_q16(wav)))
    np.testing.assert_array_equal(tok, ref_tok)
    np.testing.assert_array_equal(pcm, _q16(ref_pcm))
    # the bad client's slot was freed (no leak)
    assert len(eng._free) == eng.slots


def test_tcp_mode_mismatch_rejected(tiny):
    model, params, vq_state = tiny
    eng = SlotEngine(model, params, vq_state, slots=1, mode="encode")

    async def go():
        srv = CodecServer(eng, sr=24000, port=0)
        await srv.start()
        try:
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", srv.port)
            writer.write(b'{"mode": "decode"}\n')
            hdr = json.loads((await reader.readline()).decode())
            writer.close()
            return hdr
        finally:
            await srv.stop()

    hdr = asyncio.run(go())
    assert hdr["ok"] is False and "encode" in hdr["error"]
