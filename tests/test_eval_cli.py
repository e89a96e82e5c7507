"""eval.py CLI: offline metric evaluation with confidence intervals
(scripts/`PESQ STOI.ipynb` equivalent)."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_wavs(tmp_path, n=3, sr=24000, seconds=0.5):
    sys.path.insert(0, REPO)
    from hilcodec_tpu.utils.wavio import write_wav

    ref_dir = tmp_path / "ref"
    deg_dir = tmp_path / "deg"
    ref_dir.mkdir()
    deg_dir.mkdir()
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * seconds)) / sr
    for i in range(n):
        # speech proxy: amplitude-modulated broadband noise (a pure tone
        # occupies one third-octave band and breaks STOI)
        clean = (0.3 * rng.standard_normal(len(t)) *
                 (0.5 + 0.5 * np.sin(2 * np.pi * 4 * t))).astype(
                     np.float32)
        noisy = (clean + 0.02 * rng.standard_normal(len(t))).astype(
            np.float32)
        write_wav(str(ref_dir / f"f{i}.wav"), clean, sr)
        write_wav(str(deg_dir / f"f{i}.wav"), noisy, sr)
    return ref_dir, deg_dir


def _run(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "eval.py"), *args],
        capture_output=True, text=True, timeout=600, env=env)


def test_degraded_mode_reports_ci(tmp_path):
    ref_dir, deg_dir = _make_wavs(tmp_path)
    r = _run(["-i", str(ref_dir), "-d", str(deg_dir), "-m", "stoi", "-v"])
    assert r.returncode == 0, r.stderr
    assert "3 files" in r.stdout
    assert "stoi:" in r.stdout and "95% CI, n=3" in r.stdout
    # lightly-noised sine must score near-perfect intelligibility
    val = float(r.stdout.split("stoi:")[1].split("+/-")[0])
    assert val > 0.85


def test_filelist_input(tmp_path):
    ref_dir, deg_dir = _make_wavs(tmp_path, n=2)
    fl = tmp_path / "list.txt"
    fl.write_text("".join(f"ref/f{i}.wav|\n" for i in range(2)))
    r = _run(["-i", str(fl), "-d", str(deg_dir), "-m", "stoi"])
    assert r.returncode == 0, r.stderr
    assert "n=2" in r.stdout


def test_missing_input_errors():
    r = _run(["-i", "/nonexistent/dir12345", "-d", "/tmp"])
    assert r.returncode != 0


def test_model_mode_random_weights(tmp_path):
    """Model mode end to end on CPU with a random-weight codec: metrics
    must compute (scores will be poor) and the run must warn."""
    ref_dir, _ = _make_wavs(tmp_path, n=1, seconds=0.3)
    cfg = os.path.join(REPO, "configs", "hilcodec_speech.yaml")
    r = _run(["-i", str(ref_dir), "-c", cfg, "-m", "stoi", "-n", "2"])
    assert r.returncode == 0, r.stderr
    assert "randomly initialized" in r.stderr
    assert "stoi:" in r.stdout
