"""export.py end-to-end: deploy npz + zero caches in the reference layout.

Reference: scripts/HILCodec Onnx.ipynb -> onnx/hil_speech_cache_{enc,dec}.npz
(22 tensors / 32,511 f32 enc; 30 / 43,968 dec for the shipped speech
topology — BASELINE.md "Streaming state per stream").
"""
import os
import runpy
import sys

import numpy as np


def test_export_cli_writes_reference_cache_layout(tmp_path, monkeypatch):
    out = str(tmp_path / "hil")
    monkeypatch.setattr(sys, "argv", [
        "export.py", "-c", "configs/hilcodec_speech_synth.yaml",
        "-o", out])
    runpy.run_path("export.py", run_name="__main__")

    deploy = np.load(out + "_deploy.npz")
    assert "codebooks" in deploy
    # folded params: no weight-norm {v,g} pairs survive the fold
    assert not any(k.endswith("/v") and k[:-2] + "/g" in deploy.files
                   for k in deploy.files)

    enc = np.load(out + "_cache_enc.npz")
    dec = np.load(out + "_cache_dec.npz")
    assert list(enc.files) == [f"e_in{i}" for i in range(len(enc.files))]
    assert list(dec.files) == [f"d_in{i}" for i in range(len(dec.files))]
    n_enc = sum(int(np.prod(enc[k].shape)) for k in enc.files)
    n_dec = sum(int(np.prod(dec[k].shape)) for k in dec.files)
    # the reference onnx/hil_speech_* layout, exactly
    assert (len(enc.files), n_enc) == (22, 32511)
    assert (len(dec.files), n_dec) == (30, 43968)
    assert all(not enc[k].any() for k in enc.files)
    assert os.path.getsize(out + "_deploy.npz") > 10_000


def test_export_cli_avocodo_family(tmp_path, monkeypatch):
    """export.py works for the avocodo family via build_codec_model
    (previously crashed: the bare AvocodoModel has no (params, vq_state)
    init)."""
    out = str(tmp_path / "avo")
    monkeypatch.setattr(sys, "argv", [
        "export.py", "-c", "configs/avocodo_synth.yaml", "-o", out])
    runpy.run_path("export.py", run_name="__main__")
    enc = np.load(out + "_cache_enc.npz")
    dec = np.load(out + "_cache_dec.npz")
    deploy = np.load(out + "_deploy.npz")
    assert "codebooks" in deploy
    assert len(enc.files) and len(dec.files)
    assert all(not enc[k].any() for k in enc.files)
