"""End-to-end TrainLoop smoke test on a synthetic corpus (tiny model)."""

import os

import numpy as np
import pytest

import jax

from hilcodec_tpu.utils.hparams import HParams
from hilcodec_tpu.utils.wavio import write_wav
from hilcodec_tpu.utils.checkpoint import latest_checkpoint


@pytest.fixture()
def corpus(tmp_path, rng):
    d = tmp_path / "audio"
    d.mkdir()
    for i in range(4):
        x = (rng.standard_normal(24000) * 0.2).astype(np.float32)
        write_wav(str(d / f"a{i}.wav"), x, 24000)
    (tmp_path / "valid.txt").write_text("audio/a0.wav|\naudio/a1.wav|\n")
    (tmp_path / "infer.txt").write_text("audio/a2.wav|\n")
    (tmp_path / "pesq.txt").write_text("audio/a3.wav|\n")
    return tmp_path


def tiny_hps(root):
    return HParams(
        model="hilcodec",
        model_kwargs={
            "channels_enc": 8, "channels_dec": 8, "n_fft_base": 16,
            "n_residual_enc": 1, "n_residual_dec": 1,
            "res_scale_enc": 0.577, "res_scale_dec": 0.577,
            "strides": [4, 2], "kernel_size": 5, "last_kernel_size": 5,
            "residual_kernel_size": 5, "dilation_base": 1,
            "skip": "identity", "final_activation": "Tanh",
            "act_all": False, "encoder_l2norm": True, "causal": True,
            "zero_init": True, "inout_norm": True, "spec": "stft",
            "spec_compression": "log", "spec_learnable": False,
            "vq_kwargs": {
                "dim": 16, "codebook_size": 32, "num_quantizers": 3,
                "kmeans_init": True, "decay": 0.99,
                "ema_num_threshold": 0.5, "ema_num_initial": 0.5,
                "dropout": True, "dropout_index": [1, 2, 3]},
        },
        disc_kwargs={
            "mfbd_kwargs": {"use": True, "periods": [1, 2], "taps": 16,
                            "cutoff_freqs": [0.0, 0.25],
                            "channels": [4, 8], "kernel_sizes": [5, 5],
                            "strides": [3, 1]},
            "mstftd_kwargs": {"use": True, "filters": 4, "n_ffts": [64],
                              "hop_lengths": [16], "win_lengths": [64]},
        },
        data={
            "dataset": {"train": "DirectoriesDataset", "valid": "Dataset",
                        "infer": "Dataset", "pesq": "Dataset"},
            "classes": {"all": {"directories_to_include":
                                [str(root / "audio")],
                                "extension": ".wav", "probability": 1.0}},
            "transforms": {"RandomGain": {"low_db": -10, "high_db": 6}},
            "length": 8, "wav_dir": str(root), "extension": "",
            "num_infer": 1,
            "filelists": {"valid": str(root / "valid.txt"),
                          "infer": str(root / "infer.txt"),
                          "pesq": str(root / "pesq.txt")},
            "filter": {"train": False, "valid": False},
            "segment_size": 1024, "sampling_rate": 24000,
            "normalize_method": "random_gain",
            "random_gain_low": 0.316, "random_gain_high": 2.0,
            "channels": 1, "clip_val": 1.0e-5,
            "n_fft": 64, "hop_size": 8, "win_size": 64,
        },
        train={
            "batch_size": 2, "max_epochs": 2, "num_workers": 0,
            "seed": 1, "save_interval": 1, "infer_n": 2, "n_mels_max": 8,
            "use_lsgan": False, "use_normalized_fm_loss": True,
            "balancer_kwargs": {
                "weights": {"freq": 0.48, "mfbd_g": 1.1, "mfbd_fm": 1.1,
                            "mstftd_g": 1.1, "mstftd_fm": 1.1},
                "weight_others": 0.01, "ema_decay": 0.99},
            "optimizer": "AdamP",
            "optimizer_kwargs": {"lr": 5.0e-4, "betas": [0.5, 0.9],
                                 "weight_decay": 1.0e-5},
            "scheduler": "CosineAnnealingWarmup",
            "scheduler_kwargs": {"warmup_iterations": 5,
                                 "eta_min": 1.0e-6},
        },
        valid={"batch_size": 2},
        infer={"interval": 2, "batch_size": 1},
        pesq={"interval": 1000, "batch_size": 1, "num_workers": 0,
              "metrics_to_calculate": {"stoi": True}},
    )


def test_train_loop_two_epochs(corpus, tmp_path):
    from hilcodec_tpu.train.loop import TrainLoop

    hps = tiny_hps(corpus)
    run_dir = str(tmp_path / "run")
    loop = TrainLoop(hps, run_dir=run_dir)
    loop.init_or_resume()
    assert not bool(np.asarray(loop.state.vq_state["initted"]))
    loop.run(max_epochs=2)

    # kmeans init happened, two epochs ran, checkpoints written
    assert bool(np.asarray(loop.state.vq_state["initted"]))
    assert loop.epoch == 2
    ep, path = latest_checkpoint(run_dir)
    assert ep == 2

    # resume restores epoch + state
    loop2 = TrainLoop(hps, run_dir=run_dir)
    loop2.init_or_resume()
    assert loop2.epoch == 2
    for a, b in zip(jax.tree.leaves(loop.state.params_g),
                    jax.tree.leaves(loop2.state.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pesq_epoch_stoi(corpus, tmp_path):
    """The objective-metric epoch end to end with the numpy STOI backend
    (wrapper.py:364-380 + metrics.py protocol)."""
    from hilcodec_tpu.train.loop import TrainLoop

    hps = tiny_hps(corpus)
    hps.data.filter = {"train": False, "valid": False, "pesq": True}
    loop = TrainLoop(hps, run_dir=str(tmp_path / "run2"))
    loop.init_or_resume()
    out = loop.pesq_epoch()
    assert "stoi" in out
    assert 0.0 <= out["stoi"] <= 1.0 or np.isnan(out["stoi"]) is False
    assert loop.metrics.best["stoi"] == out["stoi"]
