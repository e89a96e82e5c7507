"""Train the EnCodec token LM (entropy model) on a trained codec's tokens.

The reference defines `LMModel` (models/encodec/models.py:21-56) as an
entropy model over RVQ token streams but ships no way to train it. This CLI
closes that loop: it tokenizes a corpus with a trained codec checkpoint,
trains the LM with next-step cross-entropy (`hilcodec_tpu.train.lm`), and
reports the entropy-coded bitrate the LM achieves on held-out tokens vs the
raw log2(card) bits/token fixed-rate coding the codec ships with.

Usage:
  python scripts/train_lm.py -c logs/synth/config.yaml \
      --ckpt logs/synth/00025.ckpt.npz --data data/synth \
      [--steps 3000] [--dim 200 --layers 5 --heads 8] [--out logs/synth_lm]
"""

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tokenize_dir(model, params, vq_state, wav_dir, seg_tokens, hop, n_q,
                 batch=32, stride_tokens=None):
    """Encode every wav under wav_dir into seg_tokens-frame token segments
    (stride_tokens < seg_tokens = overlapping segments, used for the train
    split so short-utterance corpora aren't mostly discarded). Returns
    int32 [N_seg, n_q, seg_tokens]."""
    import jax
    import jax.numpy as jnp

    from hilcodec_tpu.utils.wavio import read_wav

    seg_samples = seg_tokens * hop
    stride = (stride_tokens or seg_tokens) * hop
    segs = []
    for root, _dirs, files in os.walk(wav_dir):
        for f in sorted(files):
            if not f.lower().endswith(".wav"):
                continue
            wav, _sr = read_wav(os.path.join(root, f))
            for i in range(0, len(wav) - seg_samples + 1, stride):
                segs.append(wav[i:i + seg_samples])
    if not segs:
        raise SystemExit(f"no usable wavs under {wav_dir}")
    segs = np.stack(segs).astype(np.float32)[:, None, :]  # [N, 1, T]

    encode = jax.jit(lambda w: model.encode(params, vq_state, w, n=n_q))
    out = []
    pad = (-len(segs)) % batch
    padded = np.concatenate([segs, segs[:pad]]) if pad else segs
    for i in range(0, len(padded), batch):
        toks = np.asarray(encode(jnp.asarray(padded[i:i + batch])))
        out.append(toks.transpose(1, 0, 2))            # [B, n_q, T']
    toks = np.concatenate(out)[: len(segs)]
    return toks.astype(np.int32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data", default="data/synth",
                   help="corpus root with train/ and eval/ wav dirs")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seg-tokens", type=int, default=150,
                   help="LM context length in frames (150 = 2 s @ 75 fps; "
                   "train segments stride seg/2 for coverage of "
                   "short-utterance corpora)")
    p.add_argument("--n-q", type=int, default=None,
                   help="quantizers to model (default: codec's full ladder)")
    p.add_argument("--dim", type=int, default=200)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--out", default=None, help="save LM params here")
    ns = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hilcodec_tpu.models.encodec import LMModel
    from hilcodec_tpu.models.registry import build_codec_model
    from hilcodec_tpu.train.lm import lm_cross_entropy, lm_train_step
    from hilcodec_tpu.train.loop import build_trainer
    from hilcodec_tpu.train.optim import make_optimizer
    from hilcodec_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from hilcodec_tpu.utils.hparams import load_config

    hps = load_config(ns.config)
    model = build_codec_model(hps.get("model", "hilcodec"),
                              hps.model_kwargs.to_dict())
    trainer = build_trainer(hps)
    state, _ = load_checkpoint(ns.ckpt,
                               trainer.init_state(jax.random.PRNGKey(0)))
    params, vq_state = state.params_g, dict(state.vq_state)
    if hasattr(model, "fold_params"):
        params = model.fold_params(params)

    n_q = ns.n_q or int(vq_state["embed"].shape[0])
    card = int(vq_state["embed"].shape[1])
    hop = model.hop_length
    fps = hps.data.sampling_rate / hop
    raw_bits = math.log2(card)

    print(f"tokenizing: n_q={n_q} card={card} hop={hop} "
          f"seg={ns.seg_tokens} tokens")
    train_toks = tokenize_dir(model, params, vq_state,
                              os.path.join(ns.data, "train"),
                              ns.seg_tokens, hop, n_q,
                              stride_tokens=max(1, ns.seg_tokens // 2))
    eval_toks = tokenize_dir(model, params, vq_state,
                             os.path.join(ns.data, "eval"),
                             ns.seg_tokens, hop, n_q)
    print(f"  train segments: {train_toks.shape}, eval: {eval_toks.shape}")

    lm = LMModel(n_q=n_q, card=card, dim=ns.dim, num_heads=ns.heads,
                 num_layers=ns.layers, past_context=ns.seg_tokens)
    lm_params = lm.init(jax.random.PRNGKey(0))
    opt, _lr = make_optimizer("Adam", {"lr": ns.lr, "betas": [0.9, 0.98]})
    opt_state = opt.init(lm_params)

    # lm_train_step expects tokens [n_q, B, T]
    step = jax.jit(lambda p, s, t, lr: lm_train_step(lm, opt, p, s, t, lr))
    ce = jax.jit(lambda p, t: lm_cross_entropy(lm, p, t))

    def eval_bits(p):
        vals, nb = [], 16
        for i in range(0, len(eval_toks), nb):
            t = jnp.asarray(eval_toks[i:i + nb].transpose(1, 0, 2))
            vals.append((float(ce(p, t)), t.shape[1]))
        nats = sum(v * w for v, w in vals) / sum(w for _, w in vals)
        return nats / math.log(2)

    bits0 = eval_bits(lm_params)
    print(f"step 0: held-out {bits0:.3f} bits/token (raw {raw_bits:.1f})")

    rng = np.random.default_rng(0)
    warmup = min(500, ns.steps // 10)
    t0 = time.time()
    for it in range(1, ns.steps + 1):
        idx = rng.integers(0, len(train_toks), ns.batch)
        toks = jnp.asarray(train_toks[idx].transpose(1, 0, 2))
        lr = ns.lr * min(1.0, it / max(warmup, 1)) * 0.5 * (
            1 + math.cos(math.pi * max(0, it - warmup)
                         / max(1, ns.steps - warmup)))
        lm_params, opt_state, loss = step(lm_params, opt_state, toks,
                                          jnp.asarray(lr, jnp.float32))
        if it % 200 == 0 or it == ns.steps:
            bits = eval_bits(lm_params)
            print(f"step {it}: train {float(loss)/math.log(2):.3f} "
                  f"bits/token, held-out {bits:.3f}, "
                  f"{(time.time()-t0)/it*1000:.0f} ms/step")

    bits = eval_bits(lm_params)
    kbps_raw = raw_bits * n_q * fps / 1000
    kbps_lm = bits * n_q * fps / 1000
    print(f"FINAL: held-out {bits:.3f} bits/token vs raw {raw_bits:.1f} "
          f"=> entropy-coded {kbps_lm:.2f} kbps vs {kbps_raw:.2f} kbps "
          f"fixed-rate ({(1 - bits / raw_bits) * 100:.1f}% saved) "
          f"at n_q={n_q}, {fps:.0f} fps")
    if ns.out:
        os.makedirs(ns.out, exist_ok=True)
        save_checkpoint(ns.out, ns.steps, lm_params)
        print(f"saved LM params under {ns.out}")


if __name__ == "__main__":
    main()
