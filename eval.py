"""Offline objective evaluation with confidence intervals.

The reference computes PESQ/STOI offline with scipy t-interval CIs in
`scripts/PESQ STOI.ipynb` (cell 1); this is that notebook as a CLI. Two
modes:

  model mode:    run wavs through the codec (offline encode->decode at a
                 chosen number of quantizers) and score reconstruction
    python eval.py -c CONFIG --ckpt CKPT -i FILELIST_OR_DIR [-n N_Q]

  degraded mode: score pre-decoded wavs against references directly
    python eval.py -i REF_DIR -d DEG_DIR

Reports per-metric mean, 95% t-interval, and per-file values (--verbose).
"""

import argparse
import math
import os
import sys

import numpy as np


def collect_wavs(path):
    """Single .wav, FILELIST (.txt of `relative/path.wav|` lines,
    filelists/*.txt format) or directory -> sorted list of wav paths."""
    if path.lower().endswith(".wav") and os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        out = []
        for root, _dirs, files in os.walk(path):
            out.extend(os.path.join(root, f) for f in files
                       if f.lower().endswith(".wav"))
        return sorted(out)
    base = os.path.dirname(os.path.abspath(path))
    out = []
    with open(path) as f:
        for line in f:
            rel = line.strip().split("|")[0]
            if rel:
                out.append(rel if os.path.isabs(rel)
                           else os.path.join(base, rel))
    return out


def t_interval(values, confidence=0.95):
    """Mean and half-width of the t-distribution CI (the notebook's
    scipy.stats.t.interval on the per-file scores)."""
    values = np.asarray(values, np.float64)
    n = len(values)
    mean = float(values.mean())
    if n < 2:
        return mean, float("nan")
    sem = float(values.std(ddof=1)) / math.sqrt(n)
    try:
        from scipy.stats import t
        half = float(t.ppf((1 + confidence) / 2, n - 1)) * sem
    except ImportError:
        half = 1.96 * sem
    return mean, half


def score_pair(ref, deg, sr, metrics):
    """Per-file metric dict. Uses the training-path backends."""
    from scipy.signal import resample_poly

    from hilcodec_tpu.train.metrics import (_RESAMPLE_RATES, _pesq_backend,
                                            mcd, measure_visqol, sisdr, stoi)
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]
    out = {}
    for name in metrics:
        sr_t = _RESAMPLE_RATES[name]
        if sr_t is None:
            r_t, d_t, sr_t = ref, deg, sr
        else:
            g = math.gcd(sr, sr_t)
            r_t = resample_poly(ref, sr_t // g, sr // g)
            d_t = resample_poly(deg, sr_t // g, sr // g)
        try:
            if name == "stoi":
                out[name] = float(stoi(r_t, d_t, sr_t))
            elif name == "sisdr":
                out[name] = float(sisdr(r_t, d_t))
            elif name == "mcd":
                out[name] = float(mcd(r_t, d_t, sr_t))
            elif name == "pesq":
                out[name] = float(_pesq_backend(r_t, d_t, sr_t))
            else:
                mode = "speech" if name == "visqol" else "audio"
                out[name] = float(measure_visqol(r_t, d_t, sr_t, mode))
        except Exception as e:
            print(f"  {name} failed: {e}", file=sys.stderr)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--input", required=True,
                   help="reference wavs: filelist .txt or directory")
    p.add_argument("-d", "--degraded", default=None,
                   help="degraded wav dir (skip the model, score directly)")
    p.add_argument("-c", "--config", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("-n", "--num_quantizers", type=int, default=None)
    p.add_argument("-m", "--metrics", default="pesq,stoi,sisdr,mcd",
                   help="comma list of pesq,stoi,sisdr,mcd,visqol,"
                        "visqol_audio")
    p.add_argument("--sr", type=int, default=None,
                   help="sample rate override (default: config or wav)")
    p.add_argument("--max-files", type=int, default=None)
    p.add_argument("--stream", action="store_true",
                   help="force the streaming scan path for every input "
                        "(length-independent program; use when the batched "
                        "graph is too big for the compile service)")
    p.add_argument("-v", "--verbose", action="store_true")
    ns = p.parse_args()
    metrics = [m.strip() for m in ns.metrics.split(",") if m.strip()]
    known = ("pesq", "stoi", "sisdr", "mcd", "visqol", "visqol_audio")
    bad = [m for m in metrics if m not in known]
    if bad:
        sys.exit(f"error: unknown metric(s) {bad}; choose from {known}")
    if ns.degraded is not None and not os.path.isdir(ns.degraded):
        sys.exit(f"error: degraded dir {ns.degraded!r} does not exist")

    from hilcodec_tpu.utils.wavio import read_wav

    refs = collect_wavs(ns.input)
    if ns.max_files:
        refs = refs[: ns.max_files]
    if not refs:
        sys.exit(f"error: no wav files found under {ns.input!r}")

    run_model = None
    sr_cfg = ns.sr
    if ns.degraded is None:
        if not ns.config:
            sys.exit("error: need -c CONFIG (or -d DEG_DIR for "
                     "degraded mode)")
        import jax
        import jax.numpy as jnp

        from hilcodec_tpu.models.registry import build_model
        from hilcodec_tpu.utils.hparams import load_config

        hps = load_config(ns.config)
        sr_cfg = sr_cfg or hps.data.sampling_rate
        model_name = hps.get("model", "hilcodec")
        model = build_model(model_name, hps.model_kwargs.to_dict())
        if model_name == "avocodo":
            # the avocodo generator has no token encode/decode API; wrap
            # it in the trainer's CodecModel facade and reconstruct via
            # forward at the chosen bitrate (step_avocodo.py)
            from hilcodec_tpu.models.registry import _vq_from_kwargs
            from hilcodec_tpu.train.step_avocodo import AvocodoCodecModel
            model = AvocodoCodecModel(
                model, _vq_from_kwargs(
                    hps.model_kwargs.to_dict().get("vq_kwargs", {})))
        params, vq_state = model.init(jax.random.PRNGKey(0))
        vq_state = dict(vq_state)
        if ns.ckpt:
            from hilcodec_tpu.train.loop import build_trainer
            from hilcodec_tpu.utils.checkpoint import load_checkpoint
            trainer = build_trainer(hps)
            state, _ = load_checkpoint(
                ns.ckpt, trainer.init_state(jax.random.PRNGKey(0)))
            params, vq_state = state.params_g, dict(state.vq_state)
        else:
            print("warning: no --ckpt, scoring randomly initialized "
                  "weights", file=sys.stderr)
            if "embed" in vq_state:
                vq_state["embed"] = jax.random.normal(
                    jax.random.PRNGKey(1), vq_state["embed"].shape,
                    jnp.float32)
        if hasattr(model, "fold_params"):
            params = model.fold_params(params)
        # checkpoints load as numpy; closed-over numpy constants get baked
        # into the lowered MLIR (an encodec n=32 program serialized at
        # 76 MB and crashed the compile service). Put params on device
        # once so the program references them as runtime arguments.
        params = jax.tree_util.tree_map(jnp.asarray, params)
        vq_state = jax.tree_util.tree_map(jnp.asarray, vq_state)
        hop = model.hop_length

        # quantizers without a Euclidean codebook (shape-gain, NoVQ) have
        # no token encode/decode API — reconstruct via forward, like the
        # avocodo facade above
        forward_only = "embed" not in vq_state

        @jax.jit
        def code(wav):
            if forward_only:
                n = (jnp.asarray(ns.num_quantizers)
                     if ns.num_quantizers else None)
                wav_g, _, _, _ = model.forward(
                    params, vq_state, wav, jax.random.PRNGKey(0), n=n,
                    training=False)
                return wav_g
            tokens = model.encode(params, vq_state, wav,
                                  n=ns.num_quantizers)
            return model.decode(params, vq_state, tokens)

        @jax.jit
        def code_stream(wav, cache_enc, cache_dec):
            # long-input path: the batched graph's size grows with input
            # length (round-4: a 30 s wav's program blew the remote-compile
            # request limit), while the scan program is length-independent
            # per hop-count bucket. stream == batch is bit-exact on
            # hop-multiple inputs (tests/test_codec_api.py).
            tokens, cache_enc = model.encode_stream(
                params, vq_state, wav, cache_enc, n=ns.num_quantizers,
                megakernel=False)
            out, cache_dec = model.decode_stream(
                params, vq_state, tokens, cache_dec, megakernel=False)
            return out

        def run_model(wav):
            # pad to a fixed power-of-two hop count to bound recompiles
            L = len(wav) // hop * hop
            Lp = hop * (1 << max(0, (L // hop - 1)).bit_length())
            x = np.zeros((1, 1, Lp), np.float32)
            x[0, 0, :L] = wav[:L]
            if (ns.stream or Lp // hop > 512) and not forward_only:
                ce, cd = model.init_cache(1)
                y = code_stream(jnp.asarray(x), ce, cd)
            else:
                y = code(jnp.asarray(x))
            return np.asarray(y[0, 0, :L])

    per_file = {m: [] for m in metrics}
    for i, path in enumerate(refs):
        ref, sr = read_wav(path)
        sr = sr_cfg or sr
        if ns.degraded is not None:
            dpath = os.path.join(ns.degraded, os.path.basename(path))
            if not os.path.exists(dpath):
                print(f"skip (no degraded): {path}", file=sys.stderr)
                continue
            deg, _ = read_wav(dpath)
        else:
            deg = run_model(ref)
        scores = score_pair(np.asarray(ref), np.asarray(deg), sr, metrics)
        for k, v in scores.items():
            per_file[k].append(v)
        if ns.verbose:
            line = "  ".join(f"{k}={v:.4f}" for k, v in scores.items())
            print(f"[{i + 1}/{len(refs)}] {os.path.basename(path)}: "
                  f"{line}")

    print(f"\n== {len(refs)} files ==")
    for m in metrics:
        vals = per_file[m]
        if not vals:
            print(f"{m}: no results")
            continue
        mean, half = t_interval(vals)
        print(f"{m}: {mean:.4f} +/- {half:.4f} (95% CI, n={len(vals)})")


if __name__ == "__main__":
    main()
