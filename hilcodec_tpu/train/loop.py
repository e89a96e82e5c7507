"""Training orchestration: the ModelWrapper + epoch-loop equivalent.

Reference: models/hilcodec/wrapper.py + train.py. One JAX process drives all
local TPU devices through a shard_map'ed train step (1 process = N chips
replaces 1 process = 1 GPU); epochs alternate train / valid / infer / pesq
phases with TensorBoard summaries, checkpoint/resume, and the
warm-up initialization pass (VQ k-means) of wrapper.initialize().
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.loader import get_dataset_dataloader
from ..models.codec import CodecModel
from ..models.discriminators import Discriminators
from ..models.losses import HifiGANMelLoss, MelGradLoss, MelLoss
from ..utils import checkpoint as ckpt
from ..utils import summarize as S
from .balancer import Balancer
from .metrics import Metrics
from .optim import make_optimizer
from .schedulers import make_scheduler
from .step import Trainer, TrainState, make_parallel_train_step


def build_trainer(hps, axis_name: Optional[str] = None) -> Trainer:
    """Construct the Trainer from a reference-format config
    (wrapper.py:33-145)."""
    model = CodecModel.from_config(hps.model_kwargs.to_dict())
    disc = Discriminators(**{k: v.to_dict() if hasattr(v, "to_dict") else v
                             for k, v in hps.disc_kwargs.items()})
    hp = hps.train
    sr = hps.data.sampling_rate
    if hp.get("hifigan_mel_loss", False):
        mel = HifiGANMelLoss(sr, hps.data.clip_val, hps.data.n_fft,
                             hps.data.get("num_mels", 80),
                             hps.data.hop_size, hps.data.win_size)
    elif hp.get("mel_grad_function", False):
        mel = MelGradLoss(sr, hps.data.clip_val,
                          hp.get("n_mels_max", 80), hp.get("mel_norm"))
    else:
        mel = MelLoss(sr, hps.data.clip_val,
                      no_zero=hp.get("no_zero_at_mel_filter", True),
                      n_mels_max=hp.get("n_mels_max", 80))
    balancer = Balancer.from_config(hp.balancer_kwargs.to_dict())

    opt_groups = [g.to_dict() if hasattr(g, "to_dict") else g
                  for g in hp.get("optimizer_groups", [])] or None
    optim_g, lr_g = make_optimizer(hp.optimizer,
                                   hp.optimizer_kwargs.to_dict(), opt_groups)
    optim_d, lr_d = make_optimizer(hp.optimizer,
                                   hp.optimizer_kwargs.to_dict(), opt_groups)
    if hp.get("disc_lr_ratio"):
        lr_d = lr_g * hp.disc_lr_ratio
    sched = make_scheduler(hp.get("scheduler"),
                           hp.get("scheduler_kwargs", {}).to_dict()
                           if hasattr(hp.get("scheduler_kwargs", {}),
                                      "to_dict")
                           else hp.get("scheduler_kwargs", {}),
                           hp.max_epochs)
    return Trainer(
        model=model, disc=disc, mel_loss=mel, balancer=balancer,
        optim_g=optim_g, optim_d=optim_d, sched_g=sched, sched_d=sched,
        lr_g=lr_g, lr_d=lr_d, use_lsgan=hp.get("use_lsgan", False),
        use_normalized_fm=hp.get("use_normalized_fm_loss", True),
        lookahead=hp.get("lookahead", 0),
        disc_update_ratio=tuple(hp.get("disc_update_ratio", (1, 1))),
        axis_name=axis_name)


class TrainLoop:
    def __init__(self, hps, run_dir: Optional[str] = None):
        self.hps = hps
        self.run_dir = run_dir or hps.get("model_dir", "logs/run")
        self.devices = jax.local_devices()
        self.n_dev = len(self.devices)
        self.mesh = Mesh(np.array(self.devices), ("dp",))
        self.trainer = build_trainer(hps, axis_name="dp")
        self.step_fn = make_parallel_train_step(self.trainer, self.mesh,
                                                "dp")
        self.valid_fn = jax.jit(self.trainer.valid_step)
        self.seed = hps.train.get("seed", 1)
        self.hop = self.trainer.model.hop_length
        self.epoch = 0
        self.state: Optional[TrainState] = None
        self.metrics = Metrics(
            hps.get("pesq", {}).get("metrics_to_calculate", {}) or {},
            sampling_rate=hps.data.sampling_rate,
            num_workers=hps.get("pesq", {}).get("num_workers_executor", 4))

        self.train_ds, self.train_loader = get_dataset_dataloader(
            hps, "train", ["wav"], num_shards=1, shard=0)
        # config batch_size is per device (reference: per GPU); one host
        # feeds all local chips
        self.train_loader.batch_size *= self.n_dev
        try:
            self.valid_ds, self.valid_loader = get_dataset_dataloader(
                hps, "valid", ["wav"], num_shards=1, shard=0)
        except (FileNotFoundError, KeyError):
            self.valid_ds = self.valid_loader = None
        try:
            self.infer_ds, self.infer_loader = get_dataset_dataloader(
                hps, "infer", ["wav", "filename"], num_shards=1, shard=0)
        except (FileNotFoundError, KeyError):
            self.infer_ds = self.infer_loader = None

        self.writer_train = None
        self.writer_valid = None

    # -- state management ---------------------------------------------------
    def init_or_resume(self) -> None:
        self.state = self.trainer.init_state(jax.random.PRNGKey(self.seed))
        latest = ckpt.latest_checkpoint(self.run_dir)
        if latest is not None:
            epoch, path = latest
            self.state, extras = ckpt.load_checkpoint(path, self.state)
            self.epoch = int(extras.get("epoch", epoch))
            self.metrics.load_state_dict(
                {k[5:]: float(v) for k, v in extras.items()
                 if k.startswith("best_")})
            print(f"resumed from {path} (epoch {self.epoch})")

    def save(self) -> str:
        extra = {"epoch": self.epoch}
        for k, v in self.metrics.state_dict().items():
            extra[f"best_{k}"] = v
        return ckpt.save_checkpoint(self.run_dir, self.epoch, self.state,
                                    extra)

    # -- warm-up initialization (wrapper.initialize) ------------------------
    def initialize_vq(self, wav: np.ndarray) -> None:
        """k-means VQ init on the first batch (wrapper.py:169-206)."""
        if not self.trainer.model.vq.kmeans_init:
            return
        if bool(np.asarray(self.state.vq_state["initted"])):
            return

        @jax.jit
        def encode(params, wav):
            return self.trainer.model.codec.encoder.apply(
                params["encoder"], wav)

        z = encode(self.state.params_g, jnp.asarray(wav))
        vq_state = self.trainer.model.vq.kmeans_init_state(
            self.state.vq_state, z, jax.random.PRNGKey(self.seed + 7))
        self.state = self.state._replace(vq_state=jax.tree.map(
            jnp.asarray, vq_state))

    # -- epochs -------------------------------------------------------------
    def _batch_wav(self, batch: Dict[str, Any]) -> np.ndarray:
        wav = batch["wav"]
        if wav.ndim == 2:
            wav = wav[:, None, :]
        # pad the batch to a multiple of n_dev for even sharding
        b = wav.shape[0]
        rem = (-b) % self.n_dev
        if rem:
            wav = np.concatenate([wav, np.zeros((rem,) + wav.shape[1:],
                                                wav.dtype)])
        return wav

    def train_epoch(self) -> Dict[str, float]:
        t0 = time.time()
        sums: Dict[str, float] = {}
        n_items = 0
        n_steps = len(self.train_loader)
        replaces_total = None
        for idx, batch in enumerate(self.train_loader, start=1):
            wav = self._batch_wav(batch)
            if idx == 1:
                self.initialize_vq(wav)
            key = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                     int(self.state.iteration))
            self.state, m = self.step_fn(self.state, jnp.asarray(wav), key)
            bsz = batch["wav"].shape[0]
            n_items += bsz
            for k, v in m.items():
                if k.startswith("loss/"):
                    sums[k] = sums.get(k, 0.0) + float(v) * bsz
            if replaces_total is None:
                replaces_total = np.asarray(m["num_replaces"])
            else:
                replaces_total = replaces_total + np.asarray(
                    m["num_replaces"])
            if idx % 10 == 0 or idx == n_steps:
                line = f"Epoch {self.epoch} - Train {idx}/{n_steps}"
                for k, v in sums.items():
                    line += f"  {k.split('/')[1]}: {v / n_items:.3f}"
                line += f"  lr: {float(m['lr']):.2e}"
                S.progress_line(line)
        print()
        scalars = {k: v / max(n_items, 1) for k, v in sums.items()}
        scalars["lr"] = float(m["lr"]) if n_steps else 0.0
        scalars["epoch_time"] = time.time() - t0
        if replaces_total is not None:
            for i, r in enumerate(replaces_total):
                scalars[f"n_replaces/{i}"] = float(r)
        # advance the per-epoch scheduler clock
        self.state = self.state._replace(epoch=self.state.epoch + 1)
        return scalars

    def valid_epoch(self) -> Dict[str, float]:
        if self.valid_loader is None:
            return {}
        sums: Dict[str, float] = {}
        n_items = 0
        for batch in self.valid_loader:
            wav = batch["wav"]
            if wav.ndim == 2:
                wav = wav[:, None, :]
            losses = self.valid_fn(self.state, jnp.asarray(wav),
                                   jax.random.PRNGKey(0))
            bsz = wav.shape[0]
            n_items += bsz
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(v) * bsz
        return {k: v / max(n_items, 1) for k, v in sums.items()}

    def infer_epoch(self) -> Dict[str, np.ndarray]:
        """Reconstruct the infer filelist at infer_n bitrate for TensorBoard
        audio (wrapper.py:382-405)."""
        if self.infer_loader is None:
            return {}
        n = self.hps.train.get("infer_n", None)
        audios = {}
        model = self.trainer.model

        @jax.jit
        def reconstruct(state, wav):
            wav_g, _, _, _ = model.forward(
                state.params_g, state.vq_state, wav, jax.random.PRNGKey(0),
                n=jnp.asarray(n) if n else None, training=False)
            return wav_g

        for i, batch in enumerate(self.infer_loader):
            wav = batch["wav"]
            if wav.ndim == 2:
                wav = wav[:, None, :]
            wav_g = np.asarray(reconstruct(self.state, jnp.asarray(wav)))
            audios[f"infer/gen_{i}"] = wav_g[0, 0]
            if self.epoch == 0:
                audios[f"infer/real_{i}"] = wav[0, 0]
        return audios

    def pesq_epoch(self) -> Dict[str, float]:
        if not self.metrics.enabled:
            return {}
        try:
            _, loader = get_dataset_dataloader(self.hps, "pesq", ["wav"])
        except (FileNotFoundError, KeyError):
            return {}
        n = self.hps.train.get("infer_n", None)
        model = self.trainer.model
        self.metrics.initialize()

        @jax.jit
        def reconstruct(state, wav):
            wav_g, _, _, _ = model.forward(
                state.params_g, state.vq_state, wav, jax.random.PRNGKey(0),
                n=jnp.asarray(n) if n else None, training=False)
            return wav_g

        for batch in loader:
            wav = batch["wav"]
            if wav.ndim == 2:
                wav = wav[:, None, :]
            wav_g = np.asarray(reconstruct(self.state, jnp.asarray(wav)))
            self.metrics.submit(wav[:, 0], wav_g[:, 0])
        return self.metrics.retrieve()

    # -- the driver ---------------------------------------------------------
    def run(self, max_epochs: Optional[int] = None) -> None:
        hps = self.hps
        max_epochs = max_epochs or hps.train.max_epochs
        if self.state is None:
            self.init_or_resume()
        if self.writer_train is None:
            self.writer_train = S.get_writer(
                os.path.join(self.run_dir, "train"))
            self.writer_valid = S.get_writer(
                os.path.join(self.run_dir, "valid"))

        infer_interval = hps.get("infer", {}).get("interval", 10)
        pesq_interval = hps.get("pesq", {}).get("interval", 1000)
        save_interval = hps.train.get("save_interval", 1)

        while self.epoch < max_epochs:
            self.epoch += 1
            if hasattr(self.train_ds, "shuffle"):
                self.train_ds.shuffle(self.seed + self.epoch)
            scalars = self.train_epoch()
            S.summarize(self.writer_train, self.epoch, scalars, echo=False)

            valid = self.valid_epoch()
            if valid:
                S.summarize(self.writer_valid, self.epoch, valid,
                            echo=False)
            if self.epoch % pesq_interval == 0:
                for k, v in self.pesq_epoch().items():
                    self.writer_valid.add_scalar(f"metric/{k}", v,
                                                 self.epoch)
            if self.epoch % infer_interval == 0:
                audios = self.infer_epoch()
                if audios:
                    S.summarize(self.writer_valid, self.epoch,
                                audios=audios,
                                sampling_rate=hps.data.sampling_rate,
                                echo=False)
            if self.epoch % save_interval == 0:
                self.save()


def check_replica_consistency(state: TrainState) -> None:
    """End-of-epoch replica-divergence check (wrapper.py:306-314)."""
    from ..parallel.mesh import assert_replicas_consistent
    assert_replicas_consistent(state.params_d)
