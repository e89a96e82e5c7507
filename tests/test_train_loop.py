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


@pytest.mark.slow
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


def avocodo_hps(root):
    """Tiny avocodo family config (model-zoo dispatch: reference
    models/__init__.py:4-11 -> models/avocodo/wrapper.py)."""
    hps = tiny_hps(root)
    hps.model = "avocodo"
    hps.model_kwargs = type(hps.model_kwargs)(**{
        "channels_enc": 8, "channels_dec": 8, "n_fft_base": 16,
        "n_residual_enc": 1, "n_residual_dec": 1,
        "res_scale_enc": 0.577, "res_scale_dec": 0.577,
        # 3 decoder heads land on 1/8, 1/2, full rate (PQMF lv2/lv1 ladder)
        "strides": [4, 2, 4, 2],
        "vq_kwargs": {"dim": 16, "codebook_size": 32, "num_quantizers": 2,
                      "kmeans_init": True, "decay": 0.99,
                      "ema_num_threshold": 0.5, "ema_num_initial": 0.5},
    })
    hps.disc_kwargs = type(hps.disc_kwargs)(**{
        "combd_kwargs": {"use": True, "h": {
            "combd_h_u": [[4, 8], [4, 8], [4, 8]],
            "combd_d_k": [[7, 5], [11, 5], [15, 5]],
            "combd_d_s": [[1, 1], [1, 1], [1, 1]],
            "combd_d_d": [[1, 1], [1, 1], [1, 1]],
            "combd_d_g": [[1, 1], [1, 1], [1, 1]],
            "combd_d_p": [[3, 2], [5, 2], [7, 2]],
            "combd_op_f": [1, 1, 1], "combd_op_k": [3, 3, 3],
            "combd_op_g": [1, 1, 1],
            "pqmf_config": {"lv1": [2, 256, 0.25, 10.0],
                            "lv2": [8, 256, 0.067, 10.0]}}},
    })
    hps.pqmf_config = type(hps.disc_kwargs)(**{
        "lv1": [2, 256, 0.25, 10.0], "lv2": [8, 256, 0.067, 10.0]})
    hps.train.use_lsgan = True
    hps.train.use_normalized_fm_loss = False
    hps.train.balancer_kwargs = type(hps.train.balancer_kwargs)(**{
        "weights": {"freq": 45, "combd_g": 1.0, "combd_fm": 2.0},
        "weight_others": 0.01})
    hps.data.segment_size = 2048
    return hps


@pytest.mark.slow
def test_train_loop_avocodo_family(corpus, tmp_path):
    """`model: avocodo` trains through the real epoch loop with CoMBD
    losses, checkpoints, and resumes (VERDICT item 2)."""
    from hilcodec_tpu.train.loop import TrainLoop
    from hilcodec_tpu.train.step_avocodo import AvocodoTrainer

    hps = avocodo_hps(corpus)
    run_dir = str(tmp_path / "avo_run")
    loop = TrainLoop(hps, run_dir=run_dir)
    assert isinstance(loop.trainer, AvocodoTrainer)
    loop.init_or_resume()
    loop.run(max_epochs=1)
    assert loop.epoch == 1
    ep, path = latest_checkpoint(run_dir)
    assert ep == 1
    # CoMBD losses flowed through valid as well
    valid = loop.valid_epoch()
    assert any(k.startswith("loss/combd") for k in valid), valid

    loop2 = TrainLoop(hps, run_dir=run_dir)
    loop2.init_or_resume()
    assert loop2.epoch == 1
    for a, b in zip(jax.tree.leaves(loop.state.params_g),
                    jax.tree.leaves(loop2.state.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_train_loop_encodec_family(corpus, tmp_path):
    """`model: encodec` trains through the generic balancer trainer."""
    from hilcodec_tpu.train.loop import TrainLoop
    from hilcodec_tpu.models.encodec import EncodecModel

    hps = tiny_hps(corpus)
    hps.model = "encodec"
    hps.model_kwargs = type(hps.model_kwargs)(**{
        "channels_enc": 4, "channels_dec": 4, "n_residual_layers": 1,
        "strides": [4, 2], "kernel_size": 7, "last_kernel_size": 7,
        "residual_kernel_size": 3, "dilation_base": 2, "true_skip": False,
        "compress": 2, "lstm": 1,
        "vq_kwargs": {"dim": 16, "codebook_size": 32,
                      "num_quantizers": 2, "kmeans_init": False,
                      "dropout": True},
    })
    hps.train.balancer_kwargs = type(hps.train.balancer_kwargs)(**{
        "weights": {"freq": 0.48, "mfbd_g": 1.1, "mfbd_fm": 1.1,
                    "mstftd_g": 1.1, "mstftd_fm": 1.1},
        "weight_others": 0.01, "ema_decay": 0.99})
    run_dir = str(tmp_path / "enc_run")
    loop = TrainLoop(hps, run_dir=run_dir)
    assert isinstance(loop.trainer.model.codec, EncodecModel)
    loop.init_or_resume()
    loop.run(max_epochs=1)
    assert loop.epoch == 1
    assert latest_checkpoint(run_dir)[0] == 1


@pytest.mark.slow
def test_train_loop_plateau_and_hists(corpus, tmp_path):
    """ReduceLROnPlateau decays TrainState.lr_scale from the valid metric,
    and plot_param_and_grad dumps histograms (VERDICT item 5)."""
    from hilcodec_tpu.train.loop import TrainLoop

    hps = tiny_hps(corpus)
    hps.train.scheduler = "ReduceLROnPlateau"
    hps.train.scheduler_kwargs = type(hps.train.scheduler_kwargs)(**{
        "factor": 0.5, "patience": 0, "threshold": 1.0})
    hps.train.plot_param_and_grad = True
    loop = TrainLoop(hps, run_dir=str(tmp_path / "plat_run"))
    loop.init_or_resume()
    # threshold=1.0 (rel) makes every epoch "not better" (a < best*0 never
    # holds for positive losses), so patience=0 decays the scale each epoch
    loop.run(max_epochs=2)
    assert loop.plateau_state["scale"] < 1.0
    assert float(loop.state.lr_scale) == loop.plateau_state["scale"]
    # histograms were dumped for params and grads of both networks
    hists = {}
    loop.train_epoch(hists=hists)
    assert any(k.startswith("model/") for k in hists)
    assert any(k.startswith("model_grad/") for k in hists)
    assert any(k.startswith("disc_grad/") for k in hists)
