"""Behavioral pins for the in-env numpy ViSQOL oracle (train/visqol_np.py).

The visqol package / bazel binary cannot run in this environment, so as
with the PESQ oracle (tests/test_pesq_np.py) these tests pin the
properties that make the metric usable in-repo: fixed anchors, strict
monotonicity in degradation, level invariance, bandwidth-loss ordering,
and both operating modes (speech @16 kHz, audio @48 kHz)."""

import numpy as np
import pytest

from hilcodec_tpu.train.visqol_np import _mean_patch_nsim, visqol_np

SR = 16000


@pytest.fixture(scope="module")
def broadband():
    """Deterministic harmonic probe + pink-tilted noise floor so every
    ERB band carries reference energy (a pure harmonic stack leaves the
    upper bands empty and bandwidth tests vacuous)."""
    t = np.arange(SR * 3) / SR
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 3 * t))
    x = np.sin(2 * np.pi * np.cumsum(f0) / SR)
    for k in (2, 3, 4):
        x += np.sin(2 * np.pi * np.cumsum(k * f0) / SR) / k
    env = (0.5 + 0.5 * np.sin(2 * np.pi * 4 * t)) ** 2
    x *= env
    rng = np.random.default_rng(3)
    hf = rng.standard_normal(len(x))
    spec = np.fft.rfft(hf)
    freqs = np.fft.rfftfreq(len(x), 1 / SR)
    spec *= 1.0 / np.sqrt(1 + (freqs / 500) ** 1.5)
    hf = np.fft.irfft(spec, len(x))
    hf /= np.abs(hf).max()
    x = x / np.abs(x).max() * 0.5 + 0.05 * hf * env
    return x.astype(np.float64)


def _awgn(x, snr_db, noise):
    return x + noise * np.sqrt((x ** 2).mean() / 10 ** (snr_db / 10)
                               / (noise ** 2).mean())


def _lowpass(x, frac):
    spec = np.fft.rfft(x)
    spec[int(len(spec) * frac):] = 0
    return np.fft.irfft(spec, len(x))


def test_identity_is_cap(broadband):
    assert visqol_np(broadband, broadband, SR) == 5.0
    assert visqol_np(broadband, broadband, SR, "audio") == pytest.approx(
        4.732)


def test_level_invariance(broadband):
    """Degraded level is normalized to the reference before similarity."""
    for g in (2.0, 0.316):
        assert visqol_np(broadband, broadband * g, SR) == 5.0


def test_snr_ladder_anchors(broadband):
    """Strictly monotone in AWGN SNR with the calibrated anchors
    (visqol_np.py module docstring): ~4.3 @35 dB down to <2 @0 dB."""
    noise = np.random.default_rng(7).standard_normal(len(broadband))
    scores = [visqol_np(broadband, _awgn(broadband, s, noise), SR)
              for s in (35, 30, 20, 10, 0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 4.1           # 35 dB: barely audible
    assert 2.6 < scores[2] < 3.5     # 20 dB
    assert scores[4] < 2.0           # 0 dB: bad


def test_bandwidth_loss_ordering(broadband):
    """Wider surviving bandwidth scores higher; any lowpass < identity."""
    lp2k = visqol_np(broadband, _lowpass(broadband, 0.25), SR)
    lp4k = visqol_np(broadband, _lowpass(broadband, 0.50), SR)
    assert lp2k < lp4k < 5.0
    assert lp2k < 4.2                # losing 6 kHz is clearly audible


def test_audio_mode_48k(broadband):
    """Audio mode: 32 ERB bands to 24 kHz, 4.732 cap, still monotone."""
    x48 = np.repeat(broadband, 3)
    noise = np.repeat(
        np.random.default_rng(7).standard_normal(len(broadband)), 3)
    s20 = visqol_np(x48, _awgn(x48, 20, noise), 48000, "audio")
    s5 = visqol_np(x48, _awgn(x48, 5, noise), 48000, "audio")
    assert s5 < s20 < 4.732


def test_short_input_does_not_crash(broadband):
    s = broadband[:800]              # shorter than one 80 ms window
    assert visqol_np(s, s, SR) == 5.0


def test_nsim_bounds(broadband):
    noise = np.random.default_rng(11).standard_normal(len(broadband))
    s = _mean_patch_nsim(broadband, _awgn(broadband, 10, noise), SR)
    assert 0.0 < s < 1.0


def test_metrics_dispatch_falls_back_to_oracle(broadband):
    """measure_visqol: package absent + binary absent -> numpy oracle."""
    from hilcodec_tpu.train.metrics import measure_visqol
    try:
        import visqol  # noqa: F401
        pytest.skip("real visqol package present; fallback not in play")
    except ImportError:
        pass
    got = measure_visqol(broadband, broadband, SR, "speech",
                         binary="definitely-not-a-real-binary")
    assert got == 5.0
