"""scripts/train_lm.py end-to-end on CPU: trained-codec tokens -> LM ->
entropy-coded bitrate report.

The reference defines LMModel (models/encodec/models.py:21-56) but ships no
trainer for it; this pins the rebuild's LM training CLI contract (tokenize
corpus with a codec checkpoint, next-step CE training, held-out bits/token
vs the raw log2(card) fixed rate).
"""
import os
import runpy
import sys

import numpy as np
import pytest
import yaml

import jax

from hilcodec_tpu.utils.checkpoint import save_checkpoint
from hilcodec_tpu.utils.wavio import write_wav

from test_train_loop import tiny_hps

pytestmark = pytest.mark.slow


def test_train_lm_cli(tmp_path, monkeypatch, capsys, rng):
    # corpus layout train_lm.py expects: DATA/{train,eval}/*.wav
    for split, n in (("train", 3), ("eval", 2)):
        d = tmp_path / "corpus" / split
        d.mkdir(parents=True)
        for i in range(n):
            x = (rng.standard_normal(4096) * 0.2).astype(np.float32)
            write_wav(str(d / f"{split}{i}.wav"), x, 24000)

    hps = tiny_hps(tmp_path)
    cfg = tmp_path / "config.yaml"
    cfg.write_text(yaml.safe_dump(hps.to_dict(), sort_keys=False))

    # a (untrained) checkpoint in the TrainState layout the CLI loads
    from hilcodec_tpu.train.loop import build_trainer
    trainer = build_trainer(hps)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = save_checkpoint(str(tmp_path / "run"), 1, state)

    out_dir = str(tmp_path / "lm")
    monkeypatch.setattr(sys, "argv", [
        "train_lm.py", "-c", str(cfg), "--ckpt", ckpt,
        "--data", str(tmp_path / "corpus"), "--steps", "6", "--batch", "2",
        "--seg-tokens", "16", "--dim", "16", "--heads", "4", "--layers", "1",
        "--out", out_dir])
    runpy.run_path("scripts/train_lm.py", run_name="__main__")

    out = capsys.readouterr().out
    assert "FINAL:" in out
    final = [l for l in out.splitlines() if l.startswith("FINAL:")][0]
    # tiny codec: 3 quantizers, codebook 32 -> raw 5 bits/token
    assert "raw 5.0" in final and "n_q=3" in final
    bits = float(final.split("held-out ")[1].split(" bits")[0])
    assert np.isfinite(bits) and 0.0 < bits < 16.0
    assert os.path.exists(os.path.join(out_dir, "00006.ckpt.npz"))


def test_entropy_code_cli_roundtrip(tmp_path, monkeypatch, capsys, rng):
    """scripts/entropy_code.py end-to-end on CPU with n_seg >> 1: the
    time-major batched coder (one LM dispatch per timestep across all
    segments) must produce a roundtrip-exact bitstream and a finite
    bits/token below the raw rate + headroom."""
    import json

    hps = tiny_hps(tmp_path)
    cfg = tmp_path / "config.yaml"
    cfg.write_text(yaml.safe_dump(hps.to_dict(), sort_keys=False))

    from hilcodec_tpu.models.encodec import LMModel
    from hilcodec_tpu.train.loop import build_trainer
    trainer = build_trainer(hps)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = save_checkpoint(str(tmp_path / "run"), 1, state)

    # untrained LM in the layout the CLI loads (dims must match argv)
    lm = LMModel(n_q=3, card=32, dim=16, num_heads=4, num_layers=1,
                 past_context=8)
    lm_ckpt = save_checkpoint(str(tmp_path / "lm"), 1,
                              lm.init(jax.random.PRNGKey(1)))

    # hop 8, seg 8 tokens -> 64 samples/segment; 2048 samples = 32 segments
    wav_path = str(tmp_path / "in.wav")
    write_wav(wav_path,
              (rng.standard_normal(2048) * 0.2).astype(np.float32), 24000)
    stream = str(tmp_path / "out.hilstream")

    monkeypatch.setattr(sys, "argv", [
        "entropy_code.py", "-c", str(cfg), "--ckpt", ckpt, "--lm", lm_ckpt,
        "-i", wav_path, "--seg-tokens", "8", "--dim", "16", "--heads", "4",
        "--layers", "1", "--out", stream])
    runpy.run_path("scripts/entropy_code.py", run_name="__main__")

    out = json.loads([l for l in capsys.readouterr().out.splitlines()
                      if l.startswith("{")][-1])
    assert out["roundtrip_exact"] is True
    assert out["tokens"] == 32 * 3 * 8       # n_seg * n_q * S
    assert out["raw_bits_per_token"] == 5.0  # log2(32)
    # an untrained LM is ~uniform: bits/token near raw, and the container
    # must exist: 24-byte header + the reported payload bytes
    assert 0.0 < out["bits_per_token"] < 8.0
    from hilcodec_tpu.utils.bitstream import HEADER_BYTES, read_hilstream
    assert os.path.getsize(stream) == out["stream_bytes"] + HEADER_BYTES
    assert os.path.getsize(stream) == out["file_bytes"]
    meta, payload = read_hilstream(stream)
    assert (meta["n_q"], meta["card"], meta["seg_tokens"],
            meta["n_seg"]) == (3, 32, 8, 32)
    assert len(payload) == out["stream_bytes"]

    # ---- standalone decode: a SEPARATE CLI invocation that shares only
    # the .hilstream file + the two checkpoints with the encoder ----
    out_wav = str(tmp_path / "decoded.wav")
    monkeypatch.setattr(sys, "argv", [
        "entropy_code.py", "-c", str(cfg), "--ckpt", ckpt, "--lm", lm_ckpt,
        "--decode", stream, "--out-wav", out_wav])
    runpy.run_path("scripts/entropy_code.py", run_name="__main__")
    dec = json.loads([l for l in capsys.readouterr().out.splitlines()
                      if l.startswith("{")][-1])
    assert dec["tokens"] == out["tokens"]
    assert dec["stream_bytes"] == out["stream_bytes"]
    from hilcodec_tpu.utils.wavio import read_wav
    wav_dec, sr_dec = read_wav(out_wav)
    assert sr_dec == 24000 and len(wav_dec) == 2048  # n_seg * S * hop
