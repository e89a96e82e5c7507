import os

import numpy as np
import pytest

from hilcodec_tpu.utils.onnx_reader import (load_reference_codebooks,
                                            read_onnx_graph)
from hilcodec_tpu.utils.wavio import read_wav, write_wav


def test_extract_vq_codebooks(reference_dir):
    books = load_reference_codebooks(
        os.path.join(reference_dir, "onnx"), "hil_speech", 8)
    assert books.shape == (8, 1024, 128)
    assert books.dtype == np.float32
    # vq and deq graphs must embed the same trained codebooks
    g = read_onnx_graph(os.path.join(reference_dir, "onnx",
                                     "hil_speech_deq3.onnx"))
    assert np.array_equal(g["initializers"]["embed"], books[3])
    # transposed matmul initializer consistent with embed
    g0 = read_onnx_graph(os.path.join(reference_dir, "onnx",
                                      "hil_speech_vq0.onnx"))
    assert np.array_equal(g0["initializers"]["onnx::MatMul_42"].T, books[0])


def test_music_codebooks(reference_dir):
    books = load_reference_codebooks(
        os.path.join(reference_dir, "onnx"), "hil_music", 12)
    assert books.shape == (12, 1024, 128)


def test_golden_tokens_range(reference_dir):
    tok = np.load(os.path.join(reference_dir, "onnx",
                               "hil_speech_quantized.npy"))
    assert tok.shape[0] == 8 and tok.shape[1] == 1
    assert tok.min() >= 0 and tok.max() < 1024


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(4800) * 0.1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 24000)
    y, sr = read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(x, y, atol=1.0 / 32768)


def test_wav_segment_read(reference_dir):
    path = os.path.join(reference_dir, "onnx", "input_speech.wav")
    full, sr = read_wav(path)
    seg, _ = read_wav(path, start=1000, frames=320)
    assert sr == 24000
    np.testing.assert_array_equal(full[1000:1320], seg)
