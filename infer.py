"""Streaming inference driver: the test_onnx.py equivalent.

Frame-by-frame (hop-sized) streaming encode/decode of a wav file through the
jit-compiled scan path, reporting per-side real-time factors and writing the
token stream (int16 [n_q, B, T], like onnx/hil_speech_quantized.npy) and the
reconstructed waveform.

Usage:
  python infer.py -c CONFIG -i input.wav [-o out_prefix] [--ckpt PATH]
                  [-n NUM_QUANTIZERS] [-f FRAMES_PER_STEP]
"""

import argparse
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", default="streamed")
    p.add_argument("--ckpt", default=None)
    p.add_argument("-n", "--num_quantizers", type=int, default=None)
    p.add_argument("-f", "--frames_per_step", type=int, default=1,
                   help="frames per streaming step (latency granularity)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace into DIR")
    p.add_argument("--latency", action="store_true",
                   help="measure per-step latency histogram (dispatching "
                        "one step at a time instead of one fused scan)")
    p.add_argument("--entropy-stream", default=None, metavar="LM_CKPT",
                   help="live entropy-coded streaming: per-frame tokens "
                        "-> LM-driven arithmetic bitstream -> live decode "
                        "back, bit-exact; writes OUTPUT.hilstream and "
                        "reports kbps + per-frame coder latency + decoder "
                        "lag (serve/entropy_live.py)")
    p.add_argument("--lm-arch", default="200,8,5,150",
                   help="dim,heads,layers,seg_tokens of the LM checkpoint")
    ns = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hilcodec_tpu.models.registry import build_codec_model
    from hilcodec_tpu.utils.hparams import load_config
    from hilcodec_tpu.utils.wavio import read_wav, write_wav

    hps = load_config(ns.config)
    model = build_codec_model(hps.get("model", "hilcodec"),
                        hps.model_kwargs.to_dict())
    sr = hps.data.sampling_rate

    key = jax.random.PRNGKey(0)
    params, vq_state = model.init(key)
    vq_state = dict(vq_state)
    if ns.ckpt:
        from hilcodec_tpu.utils.checkpoint import load_checkpoint
        from hilcodec_tpu.train.loop import build_trainer
        trainer = build_trainer(hps)
        state, _ = load_checkpoint(ns.ckpt,
                                   trainer.init_state(jax.random.PRNGKey(0)))
        params, vq_state = state.params_g, dict(state.vq_state)
    else:
        vq_state["embed"] = jax.random.normal(
            jax.random.PRNGKey(1), vq_state["embed"].shape, jnp.float32)
    if hasattr(model, "fold_params"):
        params = model.fold_params(params)

    wav, in_sr = read_wav(ns.input)
    assert in_sr == sr, f"expected {sr} Hz input, got {in_sr}"
    hop = model.hop_length
    L = len(wav) // hop
    wav = wav[: L * hop][None, None, :]

    cache_enc, cache_dec = model.init_cache(1)
    n = ns.num_quantizers

    @jax.jit
    def encode(wav, cache):
        return model.encode_stream(params, vq_state, wav, cache, n=n,
                                   frames_per_step=ns.frames_per_step)

    @jax.jit
    def decode(tokens, cache):
        return model.decode_stream(params, vq_state, tokens, cache,
                                   frames_per_step=ns.frames_per_step)

    # compile
    tokens, _ = encode(jnp.asarray(wav), cache_enc)
    out, _ = decode(tokens, cache_dec)
    jax.block_until_ready(out)

    if ns.latency:
        _latency_histogram(model, params, vq_state, jnp.asarray(wav),
                           ns.frames_per_step, n, hop, sr)

    if ns.profile:
        with jax.profiler.trace(ns.profile):
            tokens, _ = encode(jnp.asarray(wav), cache_enc)
            out, _ = decode(tokens, cache_dec)
            jax.block_until_ready(out)
        print(f"profiler trace written to {ns.profile}")

    t0 = time.perf_counter()
    tokens, _ = encode(jnp.asarray(wav), cache_enc)
    tokens.block_until_ready()
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    out, _ = decode(tokens, cache_dec)
    jax.block_until_ready(out)
    t_dec = time.perf_counter() - t0

    seconds = L * hop / sr
    print(f"encoder RTF: {seconds / t_enc:8.2f}x realtime "
          f"({t_enc * 1000:.1f} ms for {seconds:.2f} s)")
    print(f"decoder RTF: {seconds / t_dec:8.2f}x realtime "
          f"({t_dec * 1000:.1f} ms)")

    np.save(f"{ns.output}_quantized.npy",
            np.asarray(tokens).astype(np.int16))
    write_wav(f"{ns.output}_output.wav", np.asarray(out)[0, 0], sr)
    print(f"wrote {ns.output}_quantized.npy "
          f"{tuple(np.asarray(tokens).shape)} and {ns.output}_output.wav")

    if ns.entropy_stream:
        _live_entropy_stream(ns, model, np.asarray(tokens), sr, hop)


def _live_entropy_stream(ns, model, tokens, sr, hop):
    """Per-frame token -> bitstream -> token live roundtrip (VERDICT r4
    item 7): the LM + arithmetic coder moved from the offline
    scripts/entropy_code.py into the streaming path, with the latency cost
    and the decoder's settled-bits lag measured. Writes a .hilstream
    (live (t, q) symbol order; see serve/entropy_live.py docstring)."""
    import jax

    from hilcodec_tpu.models.encodec import LMModel
    from hilcodec_tpu.serve.entropy_live import (LiveTokenDecoder,
                                                 LiveTokenEncoder)
    from hilcodec_tpu.utils.bitstream import token_crc32, write_hilstream
    from hilcodec_tpu.utils.checkpoint import load_checkpoint

    dim, heads, layers, seg = (int(v) for v in ns.lm_arch.split(","))
    n_q = tokens.shape[0]
    card = int(model.vq.codebook_size)
    lm = LMModel(n_q=n_q, card=card, dim=dim, num_heads=heads,
                 num_layers=layers, past_context=seg)
    lm_params = lm.init(jax.random.PRNGKey(0))
    if ns.entropy_stream != "random":
        lm_params, _ = load_checkpoint(ns.entropy_stream, lm_params)

    frames = tokens[:, 0, :].T                      # [T, n_q]
    enc = LiveTokenEncoder(lm, lm_params, seg_tokens=seg)
    dec = LiveTokenDecoder(lm, lm_params, seg_tokens=seg)

    blob = bytearray()
    got = []
    lat_ms = []
    lags = []
    for t in range(len(frames)):
        t0 = time.perf_counter()
        settled = enc.push(frames[t])
        lat_ms.append((time.perf_counter() - t0) * 1e3)
        if settled:
            blob.extend(settled)
            dec.feed(settled)
            got.extend(dec.pull())
        lags.append(t + 1 - len(got))               # frames behind
    tail = enc.finish()
    blob.extend(tail)
    dec.feed(tail, finished=True)
    got.extend(dec.pull_n(len(frames) - len(got)))

    exact = bool((np.stack(got) == frames).all())
    seconds = len(frames) * hop / sr
    kbps = len(blob) * 8 / seconds / 1000
    lat = np.sort(np.asarray(lat_ms))
    out_path = f"{ns.output}.hilstream"
    n_seg = max(1, len(frames) // seg)
    write_hilstream(out_path, bytes(blob), n_q=n_q, card=card,
                    seg_tokens=seg, n_seg=n_seg, sampling_rate=sr, hop=hop,
                    lm_dim=dim, lm_heads=heads, lm_layers=layers,
                    token_crc=token_crc32(np.stack(got)))
    print(f"live entropy stream: roundtrip_exact={exact}  "
          f"{kbps:.3f} kbps ({len(blob)} bytes / {seconds:.2f} s)  "
          f"vs fixed-rate {n_q * np.log2(card) * sr / hop / 1000:.2f} kbps")
    print(f"  per-frame coder latency: p50 "
          f"{lat[len(lat) // 2]:.2f} ms  p99 "
          f"{lat[min(int(0.99 * len(lat)), len(lat) - 1)]:.2f} ms "
          f"(budget {hop / sr * 1e3:.2f} ms)")
    print(f"  decoder settled-bits lag: mean {np.mean(lags):.1f} frames "
          f"({np.mean(lags) * hop / sr * 1e3:.0f} ms), max {max(lags)}")
    print(f"  wrote {out_path}")
    if not exact:
        raise SystemExit("LIVE ROUNDTRIP MISMATCH")


def _latency_histogram(model, params, vq_state, wav, fps, n, hop, sr):
    """Per-step wall latency (one dispatch per step, the worst-case
    interactive serving pattern) — p50/p90/p99 + budget headroom."""
    import jax
    import jax.numpy as jnp

    cache_enc, cache_dec = model.init_cache(wav.shape[0])

    @jax.jit
    def one_step(w, ce, cd):
        tok, ce = model.encode_stream(params, vq_state, w, ce, n=n,
                                      frames_per_step=fps)
        out, cd = model.decode_stream(params, vq_state, tok, cd,
                                      frames_per_step=fps)
        return tok, out, ce, cd

    step_samples = fps * hop
    n_steps = min(wav.shape[-1] // step_samples, 200)
    # warm up
    _, o, ce, cd = one_step(wav[:, :, :step_samples], cache_enc, cache_dec)
    jax.block_until_ready(o)
    lats = []
    for i in range(n_steps):
        chunk = wav[:, :, i * step_samples:(i + 1) * step_samples]
        t0 = time.perf_counter()
        _, o, ce, cd = one_step(chunk, ce, cd)
        jax.block_until_ready(o)
        lats.append((time.perf_counter() - t0) * 1e3)
    lats = np.sort(np.asarray(lats))
    budget = step_samples / sr * 1e3
    p = lambda q: lats[min(int(q * len(lats)), len(lats) - 1)]
    print(f"per-step enc+dec latency over {n_steps} steps "
          f"(budget {budget:.2f} ms): "
          f"p50 {p(0.5):.2f}  p90 {p(0.9):.2f}  p99 {p(0.99):.2f} ms"
          f"  ({'REAL-TIME' if p(0.99) < budget else 'over budget'})")


if __name__ == "__main__":
    main()
