import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.models import discriminators as D
from hilcodec_tpu.models import losses as Lo
from hilcodec_tpu.ops import pqmf as P

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_pqmf_analysis_matches_torch(rng):
    """PQMF conv vs torch restatement of functional/audio_modules.py:272-293."""
    import math
    subbands, taps, beta, cutoff = 4, 62, 9.0, 0.142
    x = rng.standard_normal((2, 1, 256)).astype(np.float32)
    w = P.pqmf_filter(subbands, taps, cutoff, beta)
    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w), None,
                   stride=subbands, padding=taps // 2).numpy()
    out = np.asarray(P.analysis(jnp.asarray(x), subbands, taps, cutoff,
                                beta))
    np.testing.assert_allclose(ref, out, rtol=1e-4, atol=1e-5)


def test_pqmf_synthesis_matches_torch(rng):
    subbands, taps, beta, cutoff = 4, 62, 9.0, 0.142
    x = rng.standard_normal((1, subbands, 64)).astype(np.float32)
    w = P.pqmf_filter(subbands, taps, cutoff, beta)
    ref = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w), None,
                             stride=subbands, padding=taps // 2,
                             output_padding=subbands - 1).numpy()
    out = np.asarray(P.synthesis(jnp.asarray(x), subbands, taps, cutoff,
                                 beta))
    np.testing.assert_allclose(ref, out, rtol=1e-4, atol=1e-5)


def test_pqmf_near_perfect_reconstruction(rng):
    x = rng.standard_normal((1, 1, 1024)).astype(np.float32) * 0.3
    sub = P.analysis(jnp.asarray(x), 4)
    y = np.asarray(P.synthesis(sub, 4))
    # PQMF delay = taps; compare interior
    d = 62 // 2 * 2
    err = np.abs(y[0, 0, d:-d] - x[0, 0, d // 1:-d if d else None][:y.shape[-1] - 2 * d])
    assert np.median(err) < 0.05


@pytest.fixture(scope="module")
def shipped_discs():
    """The shipped config's discriminator set (configs/hilcodec_music.yaml:39-56)."""
    return D.Discriminators(
        mfbd_kwargs={"use": True, "channels": [32, 128, 512, 1024, 1024],
                     "kernel_sizes": [5, 5, 5, 5, 5],
                     "strides": [3, 3, 3, 3, 1]},
        mstftd_kwargs={"use": True, "magnitude": False,
                       "n_ffts": [128, 256, 512, 1024],
                       "hop_lengths": [32, 64, 128, 256],
                       "win_lengths": [128, 256, 512, 1024],
                       "filters": 16, "filters_scale": 2},
    )


@pytest.mark.slow
def test_shipped_discriminators_forward(shipped_discs, rng):
    params = shipped_discs.init(jax.random.PRNGKey(0))
    x = (rng.standard_normal((2, 1, 4800)) * 0.3).astype(np.float32)
    logits, fmaps = shipped_discs.apply(params, jnp.asarray(x))
    assert set(logits) == {"mfbd", "mstftd"}
    assert len(logits["mfbd"]) == 6      # periods 1,2,3,5,7,11
    assert len(logits["mstftd"]) == 4    # 4 resolutions
    assert len(fmaps["mfbd"]) == 6 * 6   # 5 convs + post per sub-disc
    assert len(fmaps["mstftd"]) == 4 * 5
    for v in logits["mfbd"] + logits["mstftd"]:
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_gan_losses_on_disc_output(shipped_discs, rng):
    params = shipped_discs.init(jax.random.PRNGKey(0))
    xg = (rng.standard_normal((1, 1, 2400)) * 0.3).astype(np.float32)
    xr = (rng.standard_normal((1, 1, 2400)) * 0.3).astype(np.float32)
    lg, fg = shipped_discs.apply(params, jnp.asarray(xg))
    lr, fr = shipped_discs.apply(params, jnp.asarray(xr))
    d_loss = Lo.discriminator_loss(lg, lr)
    g_loss = Lo.generator_loss(lg)
    fm = Lo.feature_loss_normalized(fg, fr)
    assert np.isfinite(float(d_loss))
    assert set(g_loss) == {"mfbd_g", "mstftd_g"}
    assert set(fm) == {"mfbd_fm", "mstftd_fm"}
    for v in list(g_loss.values()) + list(fm.values()):
        assert np.isfinite(float(v))


def test_mpd_msd_forward(rng):
    discs = D.Discriminators(mpd_kwargs={"use": True},
                             msd_kwargs={"use": True})
    params = discs.init(jax.random.PRNGKey(1))
    x = (rng.standard_normal((1, 1, 2400)) * 0.3).astype(np.float32)
    logits, fmaps = discs.apply(params, jnp.asarray(x))
    assert len(logits["mpd"]) == 5
    assert len(logits["msd"]) == 3
    assert len(fmaps["msd"]) == 3 * 8
    for v in logits["mpd"] + logits["msd"]:
        assert np.isfinite(np.asarray(v)).all()


def test_stft_disc_matches_torchaudio_spec(rng):
    """The complex-spectrogram front end matches
    torchaudio.Spectrogram(normalized=True, center=False, power=None)."""
    n_fft, hop, win = 128, 32, 128
    x = (rng.standard_normal((1, 1, 1024)) * 0.3).astype(np.float32)
    xt = torch.from_numpy(x).squeeze(1)
    win_t = torch.hann_window(win)
    spec = torch.stft(xt, n_fft, hop_length=hop, win_length=win,
                      window=win_t, center=False, normalized=False,
                      onesided=True, return_complex=True)
    # torchaudio's normalized=True is *window* normalization: / sqrt(sum w^2)
    ref = torch.view_as_real(spec).numpy() / np.sqrt(float(
        (win_t ** 2).sum()))
    out = np.asarray(D._stft_nopad(jnp.asarray(x), n_fft, hop, win))
    out = out / np.sqrt(float((win_t ** 2).sum()))
    np.testing.assert_allclose(ref, out, rtol=1e-3, atol=1e-4)


def test_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 3, 64)).astype(np.float32)
    ref = torch.nn.AvgPool1d(4, 2, padding=1)(torch.from_numpy(x)).numpy()
    out = np.asarray(D._avg_pool1d(jnp.asarray(x)))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fbd_bands1d_lowering_matches_conv2d(shipped_discs, rng):
    """The bands-in-batch conv1d lowering of the FilterBank discriminators
    (every conv has kh=1, so the period axis never mixes) must reproduce
    the conv2d path exactly — logits, every fmap, and gradients."""
    mfbd = shipped_discs.discs["mfbd"]
    params = mfbd.init(jax.random.PRNGKey(3))
    x = jnp.asarray((rng.standard_normal((2, 1, 4800)) * 0.3)
                    .astype(np.float32))

    def run(mode):
        D.set_fbd_lowering(mode)
        try:
            logits, fmaps = mfbd.apply(params, x)
            g = jax.grad(lambda p: sum(jnp.sum(jnp.square(l))
                                       for l in mfbd.apply(p, x)[0]))(params)
            return logits, fmaps, g
        finally:
            D.set_fbd_lowering("conv2d")

    ref_l, ref_f, ref_g = run("conv2d")
    got_l, got_f, got_g = run("bands1d")
    for i, (a, b) in enumerate(zip(got_l, ref_l)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"logit {i}")
    assert len(got_f) == len(ref_f)
    for i, (a, b) in enumerate(zip(got_f, ref_f)):
        assert a.shape == b.shape, f"fmap {i} shape"
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"fmap {i}")
    for (pa, a), (pb, b) in zip(
            zip(map(str, jax.tree_util.tree_leaves_with_path(got_g)),
                jax.tree.leaves(got_g)),
            zip(map(str, jax.tree_util.tree_leaves_with_path(ref_g)),
                jax.tree.leaves(ref_g))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5, err_msg=pa)
