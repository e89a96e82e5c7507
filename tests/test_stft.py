import numpy as np
import pytest

import jax.numpy as jnp

from hilcodec_tpu.ops import stft as S
from hilcodec_tpu.ops import mel as M

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _ref_causal_stft(x, n_fft, hop, eps=1e-12):
    """Torch re-statement of the reference CausalSTFT conv
    (models/hilcodec/modules/conv.py:329-358)."""
    import math
    window = torch.hann_window(n_fft)
    n = torch.arange(n_fft).view(1, 1, n_fft)
    k = torch.arange(n_fft // 2 + 1).view(-1, 1, 1)
    cos = torch.cos(-2 * math.pi / n_fft * k * n)
    sin = torch.sin(-2 * math.pi / n_fft * k * n)
    weight = torch.cat([cos, sin], dim=0) * window
    xt = torch.from_numpy(x).unsqueeze(1)
    xt = F.pad(xt, (n_fft - 1, 0))
    y = F.conv1d(xt, weight, None, stride=hop)
    B, C, T = y.shape
    y = y.view(B, 2, C // 2, T)
    return y.square().sum(dim=1).clamp_min(eps).sqrt().numpy()


@pytest.mark.parametrize("n_fft,hop", [(64, 1), (128, 8), (512, 160),
                                       (1024, 320)])
def test_causal_stft_matches_reference_conv(n_fft, hop, rng):
    B, L = 2, 8
    x = rng.standard_normal((B, hop * L)).astype(np.float32)
    ref = _ref_causal_stft(x, n_fft, hop)
    out = np.asarray(S.causal_stft_mag(jnp.asarray(x), n_fft, hop))
    assert out.shape == ref.shape == (B, n_fft // 2 + 1, L)
    np.testing.assert_allclose(ref, out, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("n_fft,hop", [(64, 1), (256, 40)])
def test_causal_stft_learnable_basis_matches(n_fft, hop, rng):
    x = rng.standard_normal((1, hop * 6)).astype(np.float32)
    ref = _ref_causal_stft(x, n_fft, hop)
    w = jnp.asarray(S.causal_stft_basis(n_fft))
    out = np.asarray(S.causal_stft_mag_learnable(jnp.asarray(x), w, hop))
    np.testing.assert_allclose(ref, out, rtol=5e-3, atol=5e-3)


def test_causal_stft_streaming_suffix(rng):
    """Streaming: magnitude with explicit history == batch suffix."""
    n_fft, hop, L = 128, 8, 10
    x = rng.standard_normal((1, hop * L)).astype(np.float32)
    full = np.asarray(S.causal_stft_mag(jnp.asarray(x), n_fft, hop))
    # feed last 3 frames with explicit cache (n_fft-1 history samples)
    tail = 3
    start = hop * (L - tail)
    hist = np.pad(x, ((0, 0), (n_fft - 1, 0)))[:, start:start + n_fft - 1 + hop * tail]
    out = np.asarray(S.causal_stft_mag(jnp.asarray(hist), n_fft, hop,
                                       pad=False))
    np.testing.assert_allclose(full[:, :, -tail:], out, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 256, 1024), (512, 128, 512),
                                           (32, 8, 32)])
def test_stft_matches_torch(n_fft, hop, win, rng):
    B, T = 2, 4096
    x = (rng.standard_normal((B, T)) * 0.2).astype(np.float32)
    # reference path: reflect pad (n_fft-hop)/2 then center=False torch.stft
    p = (n_fft - hop) // 2
    xt = F.pad(torch.from_numpy(x).unsqueeze(0), (p, p), mode="reflect")
    xt = xt.squeeze(0)
    ref = torch.stft(xt, n_fft, hop_length=hop, win_length=win,
                     window=torch.hann_window(win), center=False,
                     onesided=True, return_complex=True)
    ref_mag = ref.abs().numpy()

    out = np.asarray(S.stft(jnp.asarray(x), n_fft, hop, win))
    assert out.shape == ref_mag.shape
    np.testing.assert_allclose(ref_mag, out, rtol=1e-3, atol=1e-4)

    out_c = np.asarray(S.stft(jnp.asarray(x), n_fft, hop, win,
                              magnitude=False))
    ref_c = torch.view_as_real(ref).numpy()
    np.testing.assert_allclose(ref_c, out_c, rtol=1e-3, atol=1e-4)


def test_istft_roundtrip(rng):
    n_fft, hop, win = 512, 128, 512
    x = (rng.standard_normal((2, 4096)) * 0.3).astype(np.float32)
    spec = S.stft(jnp.asarray(x), n_fft, hop, win, center=True,
                  magnitude=False)
    y = np.asarray(S.istft(spec, n_fft, hop, win, center=True))
    np.testing.assert_allclose(x[:, :y.shape[-1]], y, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_invariants():
    fb = M.mel_filterbank(24000, 1024, 80)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()
    # slaney norm: equal-area triangles => peak decreases with bandwidth
    fb_unnorm = M.mel_filterbank(24000, 1024, 80, norm=None)
    # unnormalized triangles peak at 1 (where bins are dense enough)
    assert fb_unnorm.max() <= 1.0 + 1e-6
    # slaney mel scale: first ~1kHz filters are linearly spaced
    centers = fb_unnorm.argmax(axis=1)
    assert centers[0] < centers[10] < centers[40]


def test_mel_matches_slaney_formula():
    # spot values of the slaney scale
    np.testing.assert_allclose(M.hz_to_mel(1000.0), 15.0, atol=1e-9)
    np.testing.assert_allclose(M.mel_to_hz(15.0), 1000.0, atol=1e-6)
    np.testing.assert_allclose(M.hz_to_mel(200.0 / 3), 1.0, atol=1e-9)
    f = np.array([0.0, 500.0, 6400.0])
    np.testing.assert_allclose(M.mel_to_hz(M.hz_to_mel(f)), f, atol=1e-6)


def test_n_mels_without_zero_filters():
    # small n_fft: 128 mels cannot all be nonzero with 33 bins
    n = M.n_mels_without_zero_filters(24000, 64, 128)
    fb = M.mel_filterbank(24000, 64, n)
    assert (fb.sum(axis=1) > 0).all()
    n_plus = M.mel_filterbank(24000, 64, n + 1)
    assert not (n_plus.sum(axis=1) > 0).all()
