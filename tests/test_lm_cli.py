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
