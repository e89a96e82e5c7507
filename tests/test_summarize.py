"""utils/summarize.py: TB bundle writing, spec image, hist guards, terminal.

Reference: utils/summarize.py (scalars/hists/specs/audio + the NaN/Inf
histogram guard at :16-39), utils/terminal.py.
"""
import io
import os

import numpy as np
import pytest

from hilcodec_tpu.utils import summarize as S


def test_summarize_writes_event_file(tmp_path, capsys):
    writer = S.get_writer(str(tmp_path))
    S.summarize(
        writer, epoch=3,
        scalars={"loss/freq": 1.25},
        scalars_not_to_print={"lr": 5e-4},
        specs={"valid/spec": np.random.default_rng(0).random((16, 40))},
        audios={"valid/audio": np.sin(np.linspace(0, 50, 2400))},
        hists={"g/w": np.random.default_rng(1).standard_normal(64)},
        sampling_rate=24000)
    writer.close()
    events = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert events, "no TensorBoard event file written"
    assert os.path.getsize(tmp_path / events[0]) > 100
    # echo line prints the printable scalars only
    out = capsys.readouterr().out
    assert "loss/freq" in out and "lr" not in out


def test_plot_spectrogram_to_numpy_shape():
    img = S.plot_spectrogram_to_numpy(
        np.random.default_rng(0).random((8, 20)))
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8


def test_plot_param_and_grad_guards_nonfinite():
    params = {"a": np.ones((4,), np.float32),
              "bad": np.array([1.0, np.nan], np.float32),
              "empty": np.zeros((0,), np.float32)}
    grads = {"a": np.full((4,), np.inf, np.float32),
             "bad": np.ones((2,), np.float32),
             "empty": np.zeros((0,), np.float32)}
    hists = {}
    S.plot_param_and_grad(hists, params, grads, prefix="m")
    # finite leaves kept, NaN/Inf and empty leaves dropped (reference
    # utils/summarize.py:16-39 guard)
    assert set(hists) == {"m/a", "m_grad/bad"}


def test_terminal_helpers():
    buf = io.StringIO()
    S.progress_line("step 1/10", file=buf)
    S.clear_current_line(file=buf)
    s = buf.getvalue()
    assert "step 1/10" in s and s.count("\r\033[K") == 2


def test_debug_helpers(tmp_path):
    """utils/debug.py: non-finite scanner, zero-grad finder, file logger
    (reference utils/debug.py NaN scanner / DDP unused-param finder)."""
    from hilcodec_tpu.utils import debug as Dbg

    tree = {"ok": np.ones((3,), np.float32),
            "nan": np.array([1.0, np.nan], np.float32),
            "zero": np.zeros((4,), np.float32)}
    assert Dbg.find_nonfinite(tree) == ["nan"]
    assert Dbg.find_zero_grads(tree) == ["zero"]

    logger = Dbg.FileLogger(str(tmp_path / "run.log"))
    logger.log("hello")
    logger.log("world")
    lines = open(tmp_path / "run.log").read().splitlines()
    assert len(lines) == 2 and lines[0].endswith("hello") \
        and lines[0].startswith("[")
