"""Behavioral pins for the in-env numpy PESQ-wb oracle (train/pesq_np.py).

The ITU reference binary cannot run in this environment, so instead of
bit-parity these tests pin the properties that make the metric usable:
fixed anchors, strict monotonicity in degradation, level invariance, and
the asymmetry property (additive artifacts hurt more than omissions)."""

import numpy as np
import pytest

from hilcodec_tpu.train.pesq_np import SR, pesq_wb


@pytest.fixture(scope="module")
def speechish():
    """Deterministic harmonic test signal with f0 + energy contours."""
    t = np.arange(SR * 3) / SR
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 3 * t))
    x = np.sin(2 * np.pi * np.cumsum(f0) / SR)
    for k in (2, 3, 4):
        x += np.sin(2 * np.pi * np.cumsum(k * f0) / SR) / k
    x *= (0.5 + 0.5 * np.sin(2 * np.pi * 4 * t)) ** 2
    return (x / np.abs(x).max() * 0.5).astype(np.float64)


def _awgn(x, snr_db, rng):
    n = rng.standard_normal(len(x))
    return x + n * np.sqrt((x ** 2).mean() / 10 ** (snr_db / 10)
                           / (n ** 2).mean())


def test_identical_is_max(speechish):
    assert pesq_wb(speechish, speechish) > 4.6   # wb mapping tops at 4.64


def test_level_invariance(speechish):
    """The fixed listening-level alignment removes global gain."""
    base = pesq_wb(speechish, speechish)
    assert abs(pesq_wb(speechish, speechish * 2.0) - base) < 0.02
    assert abs(pesq_wb(speechish, speechish * 0.316) - base) < 0.02


def test_snr_ladder_anchors(speechish):
    """Strictly monotone in AWGN SNR with sane absolute anchors
    (published PESQ-wb AWGN behavior: ~4.5 at 30 dB down to <2 at 0 dB)."""
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(len(speechish))

    def at(snr):
        n = noise * np.sqrt((speechish ** 2).mean() / 10 ** (snr / 10)
                            / (noise ** 2).mean())
        return pesq_wb(speechish, speechish + n)

    scores = [at(s) for s in (30, 20, 10, 0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 4.2          # 30 dB: barely audible
    assert 3.0 < scores[1] < 4.4    # 20 dB
    assert 1.4 < scores[2] < 2.8    # 10 dB
    assert scores[3] < 2.0          # 0 dB: bad


def test_asymmetry_additive_worse_than_attenuation(speechish):
    """P.862's asymmetry factor: introduced spectral content (codec
    artifacts, noise) is penalized harder than removed content."""
    add = pesq_wb(speechish, speechish
                  + 0.3 * np.roll(speechish, 800))   # additive echo
    att = pesq_wb(speechish, speechish * 0.7)         # pure attenuation
    assert att > add + 0.5, (att, add)


def test_distinguishes_distortion_severity(speechish):
    """Quantization-style distortion (what a codec produces) ranks by
    severity."""
    def quantized(bits):
        q = 2.0 ** -(bits - 1)
        return np.round(speechish / q) * q

    s = [pesq_wb(speechish, quantized(b)) for b in (8, 5, 3)]
    assert s[0] > s[1] > s[2], s
    assert s[0] > 4.0 and s[2] < 3.5


def test_short_input():
    """One-frame-minimum inputs work; sub-frame raises cleanly."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(SR // 4)
    assert 1.0 <= pesq_wb(x, x) <= 5.0
    with pytest.raises(ValueError):
        pesq_wb(x[:256], x[:256])


def test_metrics_backend_falls_back(speechish, monkeypatch):
    """_pesq_backend uses pesq_np when the ITU package is absent."""
    import builtins
    from hilcodec_tpu.train.metrics import _pesq_backend
    real_import = builtins.__import__

    def no_pesq(name, *a, **k):
        if name == "pesq":
            raise ImportError("pesq gated off for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_pesq)
    v = _pesq_backend(speechish, speechish, 16000)
    assert v > 4.6
