"""Native C++ WAV reader: parity with the Python path + batched reads."""

import numpy as np
import pytest

from hilcodec_tpu.data import native
from hilcodec_tpu.utils.wavio import read_wav, write_wav

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


@pytest.fixture()
def wavs(tmp_path, rng):
    paths = []
    for i in range(3):
        x = (rng.standard_normal(24000 + i * 100) * 0.2).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, x, 24000)
        paths.append(p)
    return paths


def test_info_matches_python(wavs):
    from hilcodec_tpu.utils.wavio import wav_info as py_info
    for p in wavs:
        assert native.wav_info(p) == py_info(p)


def test_segment_matches_python(wavs):
    full_py, sr = read_wav(wavs[0])
    full_c = native.read_segment(wavs[0])
    np.testing.assert_array_equal(full_py, full_c)

    seg_py, _ = read_wav(wavs[0], start=1000, frames=320)
    seg_c = native.read_segment(wavs[0], start=1000, frames=320)
    np.testing.assert_array_equal(seg_py, seg_c)


def test_batched_read(wavs):
    out = native.read_batch(wavs, [0, 100, 200], 4800, threads=3)
    assert out.shape == (3, 4800)
    for i, p in enumerate(wavs):
        ref, _ = read_wav(p, start=i * 100, frames=4800)
        np.testing.assert_array_equal(ref, out[i])


def test_short_read_zero_padded(wavs):
    n, _, _ = native.wav_info(wavs[0])
    out = native.read_batch([wavs[0]], [n - 100], 320)
    assert out.shape == (1, 320)
    assert np.all(out[0, 100:] == 0)


def test_reference_golden_wav(reference_dir):
    import os
    path = os.path.join(reference_dir, "onnx", "input_speech.wav")
    n, sr, ch = native.wav_info(path)
    assert (n, sr, ch) == (734760, 24000, 1)
    ref, _ = read_wav(path, start=5000, frames=1000)
    out = native.read_segment(path, 5000, 1000)
    np.testing.assert_array_equal(ref, out)
