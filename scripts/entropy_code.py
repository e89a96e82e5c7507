"""Entropy-code a wav's RVQ tokens into an actual bitstream with the
trained token LM + arithmetic coder, decode it back, and verify the exact
roundtrip.

The reference defines the LM entropy model
(/root/reference/models/encodec/models.py:21-56) but ships NO coder: its
tokens always travel at fixed log2(card) bits. This CLI closes that loop
end-to-end, in two modes:

  encode (default): wav -> codec encode -> LM-driven arithmetic coding ->
      self-describing `.hilstream` container (utils/bitstream.py) -> an
      in-process arithmetic decode verifies the exact roundtrip.
  --decode STREAM:  standalone decoder — reads the container header
      (token geometry + LM architecture), entropy-decodes the tokens,
      runs the codec decoder, writes the wav. Proves encode and decode
      work as SEPARATE processes sharing only the file + checkpoints.

Determinism: encoder and decoder step the SAME compiled batched function
over timesteps on bit-identical inputs (the decoded prefix equals the true
prefix; future positions hold the reserved 0 index), so both sides
quantize identical cdfs. Segments are independent LM contexts and batch
together, so each direction costs S dispatches total instead of
n_seg x S — symbols interleave time-major (t, segment, q).

Usage:
  python scripts/entropy_code.py -c logs/synth/config.yaml \
      --ckpt logs/synth/00025.ckpt.npz --lm logs/synth_lm/03000.ckpt.npz \
      -i input.wav [-n N_Q] [--seg-tokens 150] [--out stream.hilstream]
  python scripts/entropy_code.py -c ... --ckpt ... --lm ... \
      --decode stream.hilstream --out-wav decoded.wav
"""

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _batched_prob_fn(lm, lm_params):
    """One compiled LM forward, sliced at timestep t: the shared
    probability model both coder directions must evaluate identically."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def lm_probs_at(inputs, t):           # [B, n_q, S], t -> [B, card, n_q]
        probs, _, _ = lm.apply(lm_params, inputs)   # [B, card, n_q, S]
        return jax.lax.dynamic_slice_in_dim(probs, t, 1, axis=3)[..., 0]

    return lm_probs_at


def entropy_encode_segments(lm_probs_at, segs: np.ndarray) -> bytes:
    """segs [n_seg, n_q, S] int64 -> arithmetic-coded bytes, symbols
    time-major (t, segment, q), one batched LM dispatch per timestep."""
    import jax.numpy as jnp

    from hilcodec_tpu.ops.entropy_coding import (ArithmeticEncoder,
                                                 quantize_cdf)
    n_seg, n_q, S = segs.shape
    Bp = 1 << max(0, n_seg - 1).bit_length()  # pad batch, bound recompiles
    enc = ArithmeticEncoder()
    inputs = np.zeros((Bp, n_q, S), np.int64)            # 0 = missing
    for t in range(S):
        probs = np.asarray(lm_probs_at(jnp.asarray(inputs), t),
                           np.float64)                   # [Bp, card, n_q]
        for s in range(n_seg):
            for q in range(n_q):
                cdf = quantize_cdf(probs[s, :, q])
                enc.encode(cdf, int(segs[s, q, t]))
        if t + 1 < S:
            inputs[:n_seg, :, t + 1] = segs[:, :, t] + 1
    return enc.finish()


def entropy_decode_segments(lm_probs_at, data: bytes, n_seg: int,
                            n_q: int, S: int) -> np.ndarray:
    """bytes -> segs [n_seg, n_q, S]; same compiled fn, same batching,
    stepped on the growing decoded prefix."""
    import jax.numpy as jnp

    from hilcodec_tpu.ops.entropy_coding import (ArithmeticDecoder,
                                                 quantize_cdf)
    Bp = 1 << max(0, n_seg - 1).bit_length()
    dec = ArithmeticDecoder(data)
    dec_segs = np.zeros((n_seg, n_q, S), np.int64)
    inputs = np.zeros((Bp, n_q, S), np.int64)
    for t in range(S):
        probs = np.asarray(lm_probs_at(jnp.asarray(inputs), t), np.float64)
        for s in range(n_seg):
            for q in range(n_q):
                cdf = quantize_cdf(probs[s, :, q])
                dec_segs[s, q, t] = dec.decode(cdf)
        if t + 1 < S:
            inputs[:n_seg, :, t + 1] = dec_segs[:, :, t] + 1
    return dec_segs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--lm", required=True, help="LM checkpoint (train_lm.py)")
    p.add_argument("-i", "--input", default=None, help="wav to encode")
    p.add_argument("--decode", default=None, metavar="STREAM",
                   help="decode this .hilstream instead of encoding")
    p.add_argument("-n", "--n-q", type=int, default=None)
    p.add_argument("--seg-tokens", type=int, default=150)
    p.add_argument("--dim", type=int, default=200)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--out", default=None, help="write the bitstream here")
    p.add_argument("--out-wav", default=None,
                   help="decode mode: write the reconstructed wav here")
    ns = p.parse_args()
    if (ns.input is None) == (ns.decode is None):
        p.error("exactly one of -i/--input (encode) or --decode required")

    import jax
    import jax.numpy as jnp

    from hilcodec_tpu.models.encodec import LMModel
    from hilcodec_tpu.models.registry import build_codec_model
    from hilcodec_tpu.train.loop import build_trainer
    from hilcodec_tpu.utils.bitstream import (HEADER_BYTES, read_hilstream,
                                              token_crc32, write_hilstream)
    from hilcodec_tpu.utils.checkpoint import load_checkpoint
    from hilcodec_tpu.utils.hparams import load_config
    from hilcodec_tpu.utils.wavio import read_wav, write_wav

    hps = load_config(ns.config)
    model = build_codec_model(hps.get("model", "hilcodec"),
                              hps.model_kwargs.to_dict())
    trainer = build_trainer(hps)
    state, _ = load_checkpoint(ns.ckpt,
                               trainer.init_state(jax.random.PRNGKey(0)))
    params, vq_state = state.params_g, dict(state.vq_state)
    if hasattr(model, "fold_params"):
        params = model.fold_params(params)

    card = int(vq_state["embed"].shape[1])
    hop = model.hop_length
    sr = hps.data.sampling_rate
    fps = sr / hop

    if ns.decode:
        meta, data = read_hilstream(ns.decode)
        n_q, S, n_seg = meta["n_q"], meta["seg_tokens"], meta["n_seg"]
        assert meta["card"] == card, (meta["card"], card)
        assert meta["hop"] == hop, (meta["hop"], hop)
        lm_dim, lm_heads, lm_layers = (meta["lm_dim"], meta["lm_heads"],
                                       meta["lm_layers"])
    else:
        n_q = ns.n_q or int(vq_state["embed"].shape[0])
        S = ns.seg_tokens
        lm_dim, lm_heads, lm_layers = ns.dim, ns.heads, ns.layers

    lm = LMModel(n_q=n_q, card=card, dim=lm_dim, num_heads=lm_heads,
                 num_layers=lm_layers, past_context=S)
    lm_params, _ = load_checkpoint(ns.lm, lm.init(jax.random.PRNGKey(0)))
    # checkpoints load as numpy; LMModel.apply gathers embeddings by
    # tracer index (emb[k][indices]), which numpy arrays reject — and
    # numpy closure constants get baked into the lowered program. Put
    # everything on device once.
    lm_params = jax.tree_util.tree_map(jnp.asarray, lm_params)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    vq_state = jax.tree_util.tree_map(jnp.asarray, vq_state)
    lm_probs_at = _batched_prob_fn(lm, lm_params)

    if ns.decode:
        # ---- standalone decoder: header + bytes -> tokens -> wav ----
        segs = entropy_decode_segments(lm_probs_at, data, n_seg, n_q, S)
        got_crc = token_crc32(segs)
        if got_crc != meta["token_crc"]:
            sys.exit(f"TOKEN CRC MISMATCH: decoded {got_crc:#010x} != "
                     f"header {meta['token_crc']:#010x} — the decoder's LM "
                     "probabilities diverge from the encoder's (different "
                     "platform/XLA build?); output would be garbage")
        # [n_seg, n_q, S] -> [n_q, 1, T] in segment-time order
        tokens = np.concatenate(list(segs), axis=-1)[:, None, :]
        T = tokens.shape[-1]
        if T > 512:
            # long-token path: stream the decoder (length-independent
            # program; the batched graph grows with T)
            @jax.jit
            def decode(tok, cache):
                out, _ = model.decode_stream(params, vq_state, tok, cache,
                                             megakernel=False)
                return out
            wav = np.asarray(decode(jnp.asarray(tokens),
                                    model.init_cache(1)[1]))
        else:
            wav = np.asarray(jax.jit(
                lambda tok: model.decode(params, vq_state, tok)
            )(jnp.asarray(tokens)))
        out_wav = ns.out_wav or (ns.decode + ".wav")
        write_wav(out_wav, wav[0, 0], sr)
        print(json.dumps({
            "decoded_seconds": round(T * hop / sr, 2),
            "n_q": n_q, "tokens": int(n_seg * n_q * S),
            "stream_bytes": len(data),
            "kbps_entropy_coded": round(
                len(data) * 8 / (T * hop / sr) / 1000, 3),
            "output_wav": out_wav,
        }))
        return

    wav, file_sr = read_wav(ns.input)
    assert file_sr == sr, (file_sr, sr)
    n_seg = len(wav) // (S * hop)
    assert n_seg > 0, "input shorter than one LM segment"
    wav = wav[: n_seg * S * hop].astype(np.float32)

    if len(wav) // hop > 512:
        # long-input path: stream the encoder (the batched program's size
        # grows with length and can blow the compile-request limit; the
        # scan program is length-independent and bit-identical)
        @jax.jit
        def encode(w, cache):
            toks, _ = model.encode_stream(params, vq_state, w, cache,
                                          n=n_q, megakernel=False)
            return toks
        tokens = np.asarray(encode(jnp.asarray(wav[None, None]),
                                   model.init_cache(1)[0]))
    else:
        encode = jax.jit(
            lambda w: model.encode(params, vq_state, w, n=n_q))
        tokens = np.asarray(encode(jnp.asarray(wav[None, None])))
    tokens = tokens[:, 0].astype(np.int64)          # [n_q,1,T] -> [n_q, T]

    # tokens [n_q, T] -> per-segment [n_seg, n_q, S]
    segs = np.stack([tokens[:, s * S:(s + 1) * S] for s in range(n_seg)])

    data = entropy_encode_segments(lm_probs_at, segs)
    # in-process verification decode (the standalone path is --decode)
    dec_segs = entropy_decode_segments(lm_probs_at, data, n_seg, n_q, S)

    exact = bool((dec_segs == segs).all())
    n_symbols = n_seg * n_q * S
    bits = len(data) * 8
    bits_per_token = bits / n_symbols
    raw_bits = math.log2(card)
    out = {
        "input_seconds": round(len(wav) / sr, 2),
        "n_q": n_q, "tokens": int(n_symbols),
        "roundtrip_exact": exact,
        "bits_per_token": round(bits_per_token, 4),
        "raw_bits_per_token": round(raw_bits, 1),
        "kbps_entropy_coded": round(bits_per_token * n_q * fps / 1000, 3),
        "kbps_fixed_rate": round(raw_bits * n_q * fps / 1000, 3),
        "saved_pct": round((1 - bits_per_token / raw_bits) * 100, 2),
        "stream_bytes": len(data),
    }
    if ns.out:
        out["file_bytes"] = write_hilstream(
            ns.out, data, n_q=n_q, card=card, seg_tokens=S, n_seg=n_seg,
            sampling_rate=sr, hop=hop, lm_dim=lm_dim, lm_heads=lm_heads,
            lm_layers=lm_layers, token_crc=token_crc32(segs))
        assert out["file_bytes"] == len(data) + HEADER_BYTES
        out["stream_file"] = ns.out
    print(json.dumps(out))
    if not exact:
        sys.exit("ROUNDTRIP MISMATCH")


if __name__ == "__main__":
    main()
