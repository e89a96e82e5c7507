"""Behavioral pins for the in-env numpy YIN pitch tracker
(data/pitch_np.py) and its extract_pitch integration (the parselmouth
backend is absent here, so the fallback is the live path)."""

import numpy as np

from hilcodec_tpu.data.datasets import extract_pitch
from hilcodec_tpu.data.pitch_np import pitch_np

SR = 16000
HOP = 256


def _tone(f0, seconds=1.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * f0 * t).astype(np.float64)


def test_pure_tone_accuracy():
    for f0 in (110.0, 220.0, 330.0):
        track = pitch_np(_tone(f0), SR, HOP)
        voiced = track[track > 0]
        assert voiced.size > 0.8 * track.size
        assert abs(np.median(voiced) - f0) / f0 < 0.01, (f0, np.median(voiced))


def test_chirp_tracks():
    t = np.arange(SR) / SR
    f_inst = 100 + 200 * t                      # 100 -> 300 Hz linear
    x = np.sin(2 * np.pi * np.cumsum(f_inst) / SR)
    track = pitch_np(x, SR, HOP)
    n = track.size
    head = np.median(track[n // 8: n // 4])
    tail = np.median(track[-n // 4: -n // 8])
    assert head < tail
    assert abs(head - f_inst[n // 8 * HOP]) < 20
    assert abs(tail - f_inst[min(len(f_inst) - 1, (n - n // 8) * HOP)]) < 30


def test_noise_and_silence_unvoiced():
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(SR)
    assert np.mean(pitch_np(noise, SR, HOP) == 0) > 0.8
    assert np.all(pitch_np(np.zeros(SR), SR, HOP) == 0)


def test_frame_count_contract():
    for n in (SR, SR + 1, SR + HOP - 1, 2 * SR):
        assert pitch_np(np.zeros(n), SR, HOP).size == n // HOP + 1


def test_extract_pitch_integration():
    """The datasets.extract_pitch tail: voiced flags + interpolation over
    unvoiced gaps + optional log — through the numpy backend."""
    x = np.concatenate([_tone(220, 0.4), np.zeros(int(0.2 * SR)),
                        _tone(220, 0.4)])
    pitch, voiced = extract_pitch(x, SR, HOP)
    assert pitch.dtype == np.float32 and voiced.dtype == np.float32
    assert set(np.unique(voiced)) <= {0.0, 1.0}
    assert np.all(pitch > 0)                     # gaps interpolated
    assert abs(np.median(pitch[voiced > 0]) - 220) < 5
    log_pitch, _ = extract_pitch(x, SR, HOP, log_pitch=True)
    assert abs(np.median(log_pitch) - np.log(220)) < 0.1
