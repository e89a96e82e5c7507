"""Avocodo GAN train step: simple weighted-sum balancer, multi-scale targets.

Reference: models/avocodo/wrapper.py:215-280 — the discriminator is updated
BEFORE the generator from the same forward's logits (retain_graph), losses
are combined by a plain weighted sum (balancer.py:46-54), the generator
output list is trained against PQMF-decomposed real targets, and
discriminators run in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import losses as Lo
from ..models.avocodo import (AvocodoDiscriminators, AvocodoModel,
                              pqmf_targets)
from ..ops.rvq import ResidualVQ
from .balancer import SimpleBalancer


class AvocodoTrainState(NamedTuple):
    params_g: Any
    params_d: Any
    vq_state: Any
    opt_g: Any
    opt_d: Any
    iteration: jnp.ndarray
    epoch: jnp.ndarray
    lr_scale: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class AvocodoCodecModel:
    """CodecModel-protocol facade over (AvocodoModel, ResidualVQ) so the
    generic TrainLoop epochs (VQ k-means warmup, infer/pesq reconstruction)
    drive the avocodo family unchanged; `forward` returns the full-rate
    head (ys[-1], models/avocodo/models.py:111-119)."""
    codec: AvocodoModel
    vq: ResidualVQ

    @property
    def hop_length(self) -> int:
        return self.codec.hop_length

    def init(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        return self.codec.init(k1), self.vq.init_state(k2)

    def forward(self, params, vq_state, wav, key, n=None, training=True,
                axis_name=None):
        z = self.codec.encoder.apply(params["encoder"], wav)
        q, vq_state, loss_vq, n_rep, _ = self.vq(
            z, vq_state, key, n=n, training=training, axis_name=axis_name)
        wav_g = self.codec.decoder.apply(params["decoder"], q,
                                         return_list=False)
        return wav_g.astype(jnp.float32), vq_state, loss_vq, n_rep

    # offline token coding (eval.py / export parity with CodecModel)
    def encode(self, params, vq_state, wav, n=None):
        """wav [B, 1, T] -> tokens [n, B, T/hop] (int32)."""
        from ..ops import pallas_rvq as PQ
        z = self.codec.encoder.apply(params["encoder"], wav)
        return PQ.quantize(z.swapaxes(1, 2), vq_state["embed"], n=n)

    def decode(self, params, vq_state, tokens):
        """tokens [n, B, T'] -> full-rate wav [B, 1, T'*hop]."""
        from ..ops import rvq as Q
        q = Q.dequantize(tokens, vq_state["embed"])
        return self.codec.decoder.apply(params["decoder"],
                                        q.swapaxes(1, 2),
                                        return_list=False)

    def forward_multiscale(self, params, vq_state, wav, key, n=None,
                           training=True, axis_name=None):
        z = self.codec.encoder.apply(params["encoder"], wav)
        q, vq_state, loss_vq, n_rep, _ = self.vq(
            z, vq_state, key, n=n, training=training, axis_name=axis_name)
        ys = self.codec.decoder.apply(params["decoder"], q,
                                      return_list=True)
        return ys, vq_state, loss_vq, n_rep


@dataclasses.dataclass(frozen=True)
class AvocodoTrainer:
    model: AvocodoCodecModel
    disc: AvocodoDiscriminators
    mel_loss: Any
    balancer: SimpleBalancer
    optim_g: Any
    optim_d: Any
    sched_g: Any
    sched_d: Any
    lr_g: float
    lr_d: float
    pqmf_config: Dict[str, Tuple]
    use_lsgan: bool = True          # the shipped avocodo config follows
    use_normalized_fm: bool = False  # the original paper
    axis_name: Optional[str] = None
    clipper: Optional[Any] = None

    @property
    def vq(self) -> ResidualVQ:
        return self.model.vq

    def init_state(self, key: jax.Array) -> AvocodoTrainState:
        k1, k2 = jax.random.split(key)
        params_g, vq_state = self.model.init(k1)
        params_d = self.disc.init(k2)
        return AvocodoTrainState(
            params_g=params_g, params_d=params_d, vq_state=vq_state,
            opt_g=self.optim_g.init(params_g),
            opt_d=self.optim_d.init(params_d),
            iteration=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
            lr_scale=jnp.ones((), jnp.float32))

    def _forward(self, params_g, vq_state, wav, key, n):
        return self.model.forward_multiscale(
            params_g, vq_state, wav, key, n=n, training=True,
            axis_name=self.axis_name)

    def _loss_fns(self):
        # the avocodo losses copy sums over logit/fmap tensors WITHOUT the
        # hilcodec copy's per-count normalization (the divisions are
        # commented out there, models/avocodo/losses.py:91,100,133) — the
        # paper's weights apply to the raw sums
        from functools import partial
        g_loss_fn = partial(Lo.generator_loss_lsgan if self.use_lsgan
                            else Lo.generator_loss, normalize=False)
        fm_loss_fn = partial(
            Lo.feature_loss_normalized if self.use_normalized_fm
            else Lo.feature_loss, normalize=False)
        d_loss_fn = partial(Lo.discriminator_loss_lsgan if self.use_lsgan
                            else Lo.discriminator_loss, normalize=False)
        return g_loss_fn, fm_loss_fn, d_loss_fn

    def compute_grads(self, state: AvocodoTrainState, wav_r: jnp.ndarray,
                      key: jax.Array) -> Dict[str, Any]:
        """D and G grads exactly as the update consumes them (shared by
        train_step and the plot_param_and_grad histogram dump)."""
        axis = self.axis_name
        k_drop, k_vq = jax.random.split(
            jax.random.fold_in(key, state.iteration))
        n = self.vq.sample_n(k_drop)
        ys_r = pqmf_targets(wav_r, self.pqmf_config)
        g_loss_fn, fm_loss_fn, d_loss_fn = self._loss_fns()

        # generator forward once (shared by both updates)
        ys_g, new_vq_state, loss_vq, n_rep = self._forward(
            state.params_g, state.vq_state, wav_r, k_vq, n)
        ys_g_sg = jax.lax.stop_gradient(ys_g)

        # -- discriminator grads (D updates first, wrapper.py:243-250) -----
        def d_fn(params_d):
            lg, _ = self.disc.apply(params_d, ys_g_sg)
            lr, _ = self.disc.apply(params_d, ys_r)
            return d_loss_fn(lg, lr)

        d_loss, d_grads = jax.value_and_grad(d_fn)(state.params_d)
        if axis is not None:
            d_grads = jax.lax.pmean(d_grads, axis)

        # -- generator grads (old disc params: same logits as D saw) -------
        params_d_sg = jax.lax.stop_gradient(state.params_d)
        _, fmaps_r = self.disc.apply(params_d_sg, ys_r)
        fmaps_r = jax.lax.stop_gradient(fmaps_r)

        def g_fn(params_g):
            ys, vq_state2, loss_vq2, _ = self._forward(
                params_g, state.vq_state, wav_r, k_vq, n)
            lg, fg = self.disc.apply(params_d_sg, ys)
            losses = dict(self.mel_loss(ys[-1], wav_r))
            losses.update(g_loss_fn(lg))
            losses.update(fm_loss_fn(fg, fmaps_r))
            total = self.balancer.total(losses, loss_vq2)
            return total, losses

        (g_total, losses), g_grads = jax.value_and_grad(
            g_fn, has_aux=True)(state.params_g)
        if axis is not None:
            g_grads = jax.lax.pmean(g_grads, axis)

        if self.clipper is not None:
            g_grads = self.clipper(g_grads)
            d_grads = self.clipper(d_grads)
        return dict(g_grads=g_grads, d_grads=d_grads, d_loss=d_loss,
                    g_total=g_total, losses=losses, loss_vq=loss_vq,
                    new_vq_state=new_vq_state, num_replaces=n_rep)

    def train_step(self, state: AvocodoTrainState, wav_r: jnp.ndarray,
                   key: jax.Array):
        aux = self.compute_grads(state, wav_r, key)

        lr_d = self.sched_d(self.lr_d, state.iteration,
                            state.epoch) * state.lr_scale
        upd_d, new_opt_d = self.optim_d.update(aux["d_grads"], state.opt_d,
                                               state.params_d, lr_d)
        params_d = jax.tree.map(lambda p, u: p + u, state.params_d, upd_d)

        lr_g = self.sched_g(self.lr_g, state.iteration,
                            state.epoch) * state.lr_scale
        upd_g, new_opt_g = self.optim_g.update(aux["g_grads"], state.opt_g,
                                               state.params_g, lr_g)
        params_g = jax.tree.map(lambda p, u: p + u, state.params_g, upd_g)

        new_state = AvocodoTrainState(
            params_g=params_g, params_d=params_d,
            vq_state=aux["new_vq_state"],
            opt_g=new_opt_g, opt_d=new_opt_d,
            iteration=state.iteration + 1, epoch=state.epoch,
            lr_scale=state.lr_scale)
        metrics = {f"loss/{k}": v for k, v in aux["losses"].items()}
        metrics["loss/d"] = aux["d_loss"]
        metrics["loss/vq"] = aux["loss_vq"]
        metrics["loss/g_total"] = aux["g_total"]
        metrics["lr"] = lr_g
        metrics["finite"] = jnp.ones((), jnp.float32)
        metrics["num_replaces"] = aux["num_replaces"]
        if self.axis_name is not None:
            metrics = jax.tree.map(
                lambda x: jax.lax.pmean(x.astype(jnp.float32),
                                        self.axis_name)
                if x.dtype != jnp.int32 else x, metrics)
        return new_state, metrics

    def valid_step(self, state: AvocodoTrainState, wav_r: jnp.ndarray,
                   key: jax.Array) -> Dict[str, jnp.ndarray]:
        """Full loss dict without updates (avocodo wrapper.py valid
        epoch)."""
        g_loss_fn, fm_loss_fn, d_loss_fn = self._loss_fns()
        ys_r = pqmf_targets(wav_r, self.pqmf_config)
        ys_g, _, loss_vq, _ = self.model.forward_multiscale(
            state.params_g, state.vq_state, wav_r, key, n=None,
            training=False, axis_name=None)
        logits_g, fmaps_g = self.disc.apply(state.params_d, ys_g)
        logits_r, fmaps_r = self.disc.apply(state.params_d, ys_r)
        losses = dict(self.mel_loss(ys_g[-1], wav_r))
        losses.update(g_loss_fn(logits_g))
        losses.update(fm_loss_fn(fmaps_g, fmaps_r))
        losses["d"] = d_loss_fn(logits_g, logits_r)
        losses["vq"] = loss_vq
        return {f"loss/{k}": v for k, v in losses.items()}
