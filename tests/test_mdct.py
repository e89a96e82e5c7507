import math

import numpy as np
import pytest

import jax.numpy as jnp

from hilcodec_tpu.ops import mdct as M

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_stdct(y, N, hop, center=False):
    window = torch.hann_window(N)
    n = torch.arange(N).view(1, 1, N).float()
    k = n.view(N, 1, 1)
    filt = torch.cos(math.pi / N * k * (n + 0.5)) * math.sqrt(2 / N)
    filt[0, 0, :] /= math.sqrt(2)
    filt = filt * window.view(1, 1, N)
    pad = N // 2 if center else (N - hop) // 2
    return F.conv1d(torch.from_numpy(y), filt, None, stride=hop,
                    padding=pad).numpy()


@pytest.mark.parametrize("N,hop", [(64, 16), (32, 8)])
def test_stdct_matches_torch(N, hop, rng):
    y = (rng.standard_normal((2, 1, hop * 20)) * 0.3).astype(np.float32)
    ref = _torch_stdct(y, N, hop)
    out = np.asarray(M.stdct(jnp.asarray(y), N, hop))
    np.testing.assert_allclose(ref, out, rtol=1e-4, atol=1e-5)


def test_stdct_istdct_roundtrip(rng):
    N, hop = 64, 16
    y = (rng.standard_normal((1, 1, hop * 40)) * 0.3).astype(np.float32)
    spec = M.stdct(jnp.asarray(y), N, hop)
    rec = np.asarray(M.istdct(spec, N, hop))
    # interior reconstruction is exact (NOLA normalized)
    d = N
    np.testing.assert_allclose(y[0, 0, d:-d], rec[0, 0, d:-d], rtol=1e-3,
                               atol=1e-4)


def _torch_mdct(y, N, normalize=False):
    k = torch.arange(N).view(N, 1, 1).float()
    n = torch.arange(2 * N).view(1, 1, 2 * N).float()
    filt = torch.cos(math.pi / N * (n + 0.5 + N / 2) * (k + 0.5))
    if normalize:
        filt = filt / math.sqrt(N)
    return F.conv1d(torch.from_numpy(y), filt, None, stride=N,
                    padding=N).numpy()


@pytest.mark.parametrize("N", [32, 64])
def test_mdct_matches_torch(N, rng):
    y = (rng.standard_normal((2, 1, N * 12)) * 0.3).astype(np.float32)
    ref = _torch_mdct(y, N)
    out = np.asarray(M.mdct(jnp.asarray(y), N))
    assert out.shape == ref.shape == (2, N, 13)
    np.testing.assert_allclose(ref, out, rtol=2e-3, atol=2e-3)


def test_mdct_imdct_roundtrip(rng):
    """MDCT TDAC: imdct(mdct(x)) == x up to boundary frames."""
    N = 32
    y = (rng.standard_normal((1, 1, N * 16)) * 0.3).astype(np.float32)
    spec = M.mdct(jnp.asarray(y), N)
    rec = np.asarray(M.imdct(spec, N))
    assert rec.shape == y.shape
    np.testing.assert_allclose(y[0, 0, N:-N], rec[0, 0, N:-N], rtol=1e-3,
                               atol=1e-4)
