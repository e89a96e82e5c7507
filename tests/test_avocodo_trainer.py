import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.models.avocodo import AvocodoDiscriminators, AvocodoModel
from hilcodec_tpu.models.losses import MelLoss
from hilcodec_tpu.ops.rvq import ResidualVQ
from hilcodec_tpu.train.balancer import SimpleBalancer
from hilcodec_tpu.train.optim import make_optimizer
from hilcodec_tpu.train.schedulers import EmptyScheduler
from hilcodec_tpu.train.step_avocodo import (AvocodoCodecModel,
                                             AvocodoTrainer)


@pytest.mark.slow
def test_avocodo_train_step(rng):
    # strides chosen so the 3 decoder heads land on 1/8, 1/2, full rate
    # (matching the PQMF lv2/lv1 target ladder like the shipped [8,5,4,2])
    model = AvocodoModel(channels_enc=8, channels_dec=8, n_fft_base=16,
                         n_residual_enc=1, n_residual_dec=1,
                         strides=(4, 2, 4, 2), vq_dim=16,
                         res_scale_enc=0.577, res_scale_dec=0.577)
    vq = ResidualVQ(dim=16, codebook_size=32, num_quantizers=2,
                    kmeans_init=False)
    disc = AvocodoDiscriminators(
        combd_kwargs={"use": True, "h": {
            "combd_h_u": [[4, 8], [4, 8], [4, 8]],
            "combd_d_k": [[7, 5], [11, 5], [15, 5]],
            "combd_d_s": [[1, 1], [1, 1], [1, 1]],
            "combd_d_d": [[1, 1], [1, 1], [1, 1]],
            "combd_d_g": [[1, 1], [1, 1], [1, 1]],
            "combd_d_p": [[3, 2], [5, 2], [7, 2]],
            "combd_op_f": [1, 1, 1], "combd_op_k": [3, 3, 3],
            "combd_op_g": [1, 1, 1],
            "pqmf_config": {"lv1": [2, 256, 0.25, 10.0],
                            "lv2": [8, 256, 0.067, 10.0]}}})
    opt_g, lr = make_optimizer("AdamP", {"lr": 5e-4, "betas": [0.5, 0.9]})
    opt_d, _ = make_optimizer("AdamP", {"lr": 5e-4, "betas": [0.5, 0.9]})
    trainer = AvocodoTrainer(
        model=AvocodoCodecModel(model, vq), disc=disc,
        mel_loss=MelLoss(24000, n_mels_max=8),
        balancer=SimpleBalancer.from_config(
            {"weights": {"freq": 45, "combd_g": 1.0, "combd_fm": 2.0},
             "weight_others": 0.01}),
        optim_g=opt_g, optim_d=opt_d, sched_g=EmptyScheduler(),
        sched_d=EmptyScheduler(), lr_g=lr, lr_d=lr,
        pqmf_config={"lv1": (2, 256, 0.25, 10.0),
                     "lv2": (8, 256, 0.067, 10.0)})

    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 32)) * 0.3).astype(np.float32)
    step = jax.jit(trainer.train_step)
    new_state, m = step(state, jnp.asarray(wav), jax.random.PRNGKey(1))
    assert int(new_state.iteration) == 1
    for k in ("loss/freq", "loss/combd_g", "loss/combd_fm", "loss/d",
              "loss/vq"):
        assert np.isfinite(float(m[k])), k
    # leaf 0 can be a zero-init scale whose upstream grad is blocked at
    # init, so require a global parameter movement instead of one leaf
    delta = sum(float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).sum())
                for a, b in zip(jax.tree.leaves(state.params_g),
                                jax.tree.leaves(new_state.params_g)))
    assert delta > 0.0


@pytest.mark.slow
def test_avocodo_under_hilcodec_trainer(rng):
    """`train.trainer: hilcodec` routes the avocodo generator (full-rate
    head) through the standard balancer GAN trainer — the controlled
    ablation for the avocodo quality gap (VERDICT r3 weak #6). One tiny
    train step must run, update params, and keep every loss finite."""
    from hilcodec_tpu.train.loop import build_trainer
    from hilcodec_tpu.train.step import Trainer
    from hilcodec_tpu.utils.hparams import HParams

    hps = HParams(
        model="avocodo",
        model_kwargs={
            "channels_enc": 8, "channels_dec": 8, "n_fft_base": 16,
            "n_residual_enc": 1, "n_residual_dec": 1,
            "strides": [4, 2, 4, 2],
            "res_scale_enc": 0.577, "res_scale_dec": 0.577,
            "vq_kwargs": {"dim": 16, "codebook_size": 32,
                          "num_quantizers": 2, "kmeans_init": False}},
        disc_kwargs={"mstftd_kwargs": {
            "use": True, "n_ffts": [64], "hop_lengths": [16],
            "win_lengths": [64], "filters": 4}},
        data={"sampling_rate": 24000},
        train={"trainer": "hilcodec", "batch_size": 2,
               "n_mels_max": 8,
               "balancer_kwargs": {"weights": {"freq": 1.0,
                                               "mstftd_g": 1.0,
                                               "mstftd_fm": 1.0},
                                   "weight_others": 0.01},
               "optimizer": "AdamP",
               "optimizer_kwargs": {"lr": 5e-4, "betas": [0.5, 0.9]}})
    trainer = build_trainer(hps)
    assert isinstance(trainer, Trainer)          # NOT AvocodoTrainer
    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 32)) * 0.3).astype(np.float32)
    new_state, m = jax.jit(trainer.train_step)(state, jnp.asarray(wav),
                                               jax.random.PRNGKey(1))
    assert int(new_state.iteration) == 1
    for k in ("loss/freq", "loss/mstftd_g", "loss/mstftd_fm", "loss/vq"):
        assert np.isfinite(float(m[k])), k
    # leaf 0 can be a zero-init scale whose upstream grad is blocked at
    # init, so require a global parameter movement instead of one leaf
    delta = sum(float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).sum())
                for a, b in zip(jax.tree.leaves(state.params_g),
                                jax.tree.leaves(new_state.params_g)))
    assert delta > 0.0


def test_avocodo_codec_forward_single_scale(rng):
    """The infer/pesq reconstruction path uses forward(), which must return
    the full-rate head only (ys[-1]) — not the multi-scale list the
    training step consumes (regression: epoch-10 infer crash)."""
    model = AvocodoModel(channels_enc=8, channels_dec=8, n_fft_base=16,
                         n_residual_enc=1, n_residual_dec=1,
                         strides=(4, 2, 4, 2), vq_dim=16,
                         res_scale_enc=0.577, res_scale_dec=0.577)
    vq = ResidualVQ(dim=16, codebook_size=32, num_quantizers=2,
                    kmeans_init=False)
    codec = AvocodoCodecModel(model, vq)
    params, vq_state = codec.init(jax.random.PRNGKey(0))
    hop = codec.hop_length
    wav = jnp.asarray((rng.standard_normal((2, 1, hop * 8)) * 0.3)
                      .astype(np.float32))
    wav_g, _, loss_vq, _ = codec.forward(params, vq_state, wav,
                                         jax.random.PRNGKey(1),
                                         training=False)
    assert isinstance(wav_g, jnp.ndarray)
    assert wav_g.shape == wav.shape
    assert np.isfinite(float(loss_vq))


def test_avocodo_codec_encode_decode(rng):
    """eval.py scores the avocodo family through the CodecModel token
    protocol: encode -> int tokens [n, B, T'], decode -> full-rate wav
    whose quantized path matches forward() with a trained codebook."""
    model = AvocodoModel(channels_enc=8, channels_dec=8, n_fft_base=16,
                         n_residual_enc=1, n_residual_dec=1,
                         strides=(4, 2, 4, 2), vq_dim=16,
                         res_scale_enc=0.577, res_scale_dec=0.577)
    vq = ResidualVQ(dim=16, codebook_size=32, num_quantizers=2,
                    kmeans_init=False)
    codec = AvocodoCodecModel(model, vq)
    params, vq_state = codec.init(jax.random.PRNGKey(0))
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(
        jax.random.PRNGKey(1), vq_state["embed"].shape, jnp.float32)
    hop = codec.hop_length
    wav = jnp.asarray((rng.standard_normal((2, 1, hop * 8)) * 0.3)
                      .astype(np.float32))
    tokens = codec.encode(params, vq_state, wav)
    assert tokens.shape == (2, 2, 8)
    assert jnp.issubdtype(tokens.dtype, jnp.integer)
    out = codec.decode(params, vq_state, tokens)
    assert out.shape == wav.shape
    assert np.all(np.isfinite(np.asarray(out)))
