"""The jitted GAN train step (data-parallel over a mesh axis).

Reference flow: models/hilcodec/wrapper.py:208-292 (train_epoch inner loop)
+ models/hilcodec/balancer.py. TPU-native restructuring:

  * the whole step (generator fwd, K loss cotangents, balancer, both
    optimizer updates, EMA-VQ update, scheduler) is ONE compiled program;
  * the reference's K `autograd.grad(loss, wav_g)` calls become K pullback
    calls on a single `jax.vjp` per loss family (forward computed once,
    residuals shared — same FLOP count, no graph retention bookkeeping);
  * generator parameter gradients come from one generator `jax.vjp` fed the
    balancer's combined cotangent plus `weight_others` for loss_vq —
    replacing the synthetic `(wav_g * ĝ).sum().backward()`;
  * DDP/NCCL all-reduce becomes `lax.pmean` on the mesh axis, the VQ stat
    bucket and balancer norms psum inside the same program;
  * fp16 GradScalers disappear (bf16/f32 compute); the non-finite guard
    remains as a masked update.

Run it under `shard_map` via `make_parallel_train_step` (batch sharded on
the 'dp' axis, params/state replicated).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.codec import CodecModel
from ..models.discriminators import Discriminators
from ..models import losses as Lo
from ..ops import reparam as R
from .balancer import Balancer
from .optim import apply_updates


class TrainState(NamedTuple):
    params_g: Any
    params_d: Any
    vq_state: Any
    opt_g: Any
    opt_d: Any
    balancer: Any
    iteration: jnp.ndarray     # global step counter
    epoch: jnp.ndarray
    # ReduceLROnPlateau multiplier, updated host-side once per epoch
    # (optim/lr_scheduler.py:242-250); stays 1.0 for all other schedulers.
    lr_scale: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Trainer:
    """Bundles model + discriminators + losses + optimizers into a step fn."""
    model: CodecModel
    disc: Discriminators
    mel_loss: Any
    balancer: Balancer
    optim_g: Any
    optim_d: Any
    sched_g: Any
    sched_d: Any
    lr_g: float
    lr_d: float
    use_lsgan: bool = False
    use_normalized_fm: bool = True
    lookahead: int = 0
    disc_update_ratio: Tuple[int, int] = (1, 1)
    axis_name: Optional[str] = None
    # gradient clipper applied to both G and D grads every update
    # (reference wrapper.py:252-257 clip_grad; see grad_clip.make_clipper)
    clipper: Optional[Any] = None
    # Mixed precision (reference trains fp16 G+D with GradScalers,
    # wrapper.py / configs `fp16: True`): networks run in compute_dtype
    # while master params, optimizer state, VQ, losses and the balancer
    # stay f32. Grads come out f32 through the cast's vjp; the balancer's
    # non-finite skip-update guard replaces the GradScaler.
    compute_dtype: Any = jnp.float32
    # Discriminator gradient plumbing (mathematically equivalent paths —
    # same losses/grads to fp tolerance; the step is HBM-bound on v5e so
    # the win is fewer reads of disc weights + saved activations):
    #   "separate": reference-shaped — per family one vjp on wav_g whose
    #     pullback runs twice (adv, FM), plus an independent
    #     value_and_grad for the D loss that re-runs both disc forwards.
    #   "vmap": same vjps, but the two per-family pullbacks run as ONE
    #     batched backward (vmap over stacked cotangents) — saved
    #     residuals and weights are read once, not twice.
    #   "joint": per family ONE vjp over (wav_g, params_d) shared by the
    #     adv/FM/D-fake cotangents (vmapped), and ONE real-side vjp
    #     shared by the FM targets and the D-real backward — eliminating
    #     the separate D forward/backward entirely. Requires
    #     disc_update_ratio == (1, 1) (with r1 > 1 the D backward must be
    #     skippable under lax.cond, so we fall back to "vmap" plumbing
    #     for the G side and the separate d_fn under the cond).
    fam_mode: str = "separate"
    # Rematerialization (`jax.checkpoint`) of the step's big forwards —
    # the v5e step is HBM-bound (BASELINE r3: 197 GB/step, 75% of peak
    # bandwidth at the measured 322 ms), and the dominant bytes are vjp
    # residuals written in the forward and read back in the backward.
    # Remat trades those residual round-trips for recompute FLOPs (the
    # MXU floor is 79 ms vs the 241 ms HBM floor, so FLOPs are the cheap
    # currency). Comma-separable selectors:
    #   "none" — store residuals as usual (default);
    #   "disc" — checkpoint the per-family G-side closures AND the D-loss
    #     forward (fam_mode separate/vmap; "joint" ignores this);
    #   "gen"  — checkpoint the generator forward (its residuals otherwise
    #     stay live across the whole disc/balancer phase);
    #   "mel"  — checkpoint the multi-res mel loss (STFT intermediates);
    #   "all"  — all of the above.
    remat: str = "none"

    def _want_remat(self, which: str) -> bool:
        sel = {s.strip() for s in self.remat.split(",")}
        return "all" in sel or which in sel

    # -- state ---------------------------------------------------------------
    def init_state(self, key: jax.Array) -> TrainState:
        k1, k2, k3 = jax.random.split(key, 3)
        params_g, vq_state = self.model.init(k1)
        params_d = self.disc.init(k2)
        return TrainState(
            params_g=params_g, params_d=params_d, vq_state=vq_state,
            opt_g=self.optim_g.init(params_g),
            opt_d=self.optim_d.init(params_d),
            balancer=self.balancer.init_state(),
            iteration=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
            lr_scale=jnp.ones((), jnp.float32))

    # -- loss plumbing -------------------------------------------------------
    def _g_loss_fn(self, logits):
        return (Lo.generator_loss_lsgan(logits) if self.use_lsgan
                else Lo.generator_loss(logits))

    def _fm_loss_fn(self, fg, fr):
        return (Lo.feature_loss_normalized(fg, fr)
                if self.use_normalized_fm else Lo.feature_loss(fg, fr))

    def _d_loss_fn(self, lg, lr):
        return (Lo.discriminator_loss_lsgan(lg, lr) if self.use_lsgan
                else Lo.discriminator_loss(lg, lr))

    # -- joint fake/real discriminator vjp (fam_mode == "joint") -------------
    def _disc_joint(self, params_d, wav_g_sg, wav_r_in, cast, f32,
                    losses, grads):
        """Per family ONE real-side vjp (serves the FM targets AND the
        D-real backward) and ONE fake-side vjp over (wav_g, params) whose
        adv/FM/D-fake cotangents run as a single vmapped backward — so the
        family's forward runs once per side and its saved activations and
        weights are read once per side in the backward, vs 2 forwards +
        3 independent backwards in "separate" mode. Mathematically
        identical: the D loss decomposes per tensor
        (losses.discriminator_loss) with a global 1/N normalizer that we
        apply via the cotangent, and stop-gradients are realized by
        discarding the unused vjp outputs. Fills `losses`/`grads` in the
        same key order as the separate path; returns (d_loss, d_grads).
        """
        lsq = self.use_lsgan
        fake_term = ((lambda l: jnp.mean(jnp.square(l))) if lsq
                     else (lambda l: jnp.mean(jax.nn.relu(1.0 + l))))
        real_term = ((lambda l: jnp.mean(jnp.square(1.0 - l))) if lsq
                     else (lambda l: jnp.mean(jax.nn.relu(1.0 - l))))

        # global tensor count N (static): discriminator_loss normalizes
        # by the number of logit tensors across ALL families
        n_total = 0
        for name, d in self.disc.discs.items():
            lr_s, _ = jax.eval_shape(
                lambda pd, w, d=d: d.apply(cast(pd), cast(w)),
                params_d[name], wav_r_in)
            n_total += len(lr_s)
        inv_n = jnp.full((), 1.0 / float(n_total), jnp.float32)

        d_grads = {}
        d_loss = jnp.zeros((), jnp.float32)
        for name, d in self.disc.discs.items():
            def real_fn(pd, d=d):
                lr, fr = d.apply(cast(pd), cast(wav_r_in))
                terms = sum(real_term(l) for l in f32(lr))
                return terms, jax.lax.stop_gradient(f32(fr))

            r_terms, pull_r, fr = jax.vjp(real_fn, params_d[name],
                                          has_aux=True)
            dpd_real = pull_r(inv_n)[0]

            def fake_fn(w, pd, d=d, name=name, fr=fr):
                lg, fg = d.apply(cast(pd), cast(w))
                lg32 = f32(lg)
                g_l = self._g_loss_fn({name: lg32})[f"{name}_g"]
                fm_l = self._fm_loss_fn({name: f32(fg)},
                                        {name: fr})[f"{name}_fm"]
                f_terms = sum(fake_term(l) for l in lg32)
                return (g_l, fm_l, f_terms)

            (g_l, fm_l, f_terms), pull_f = jax.vjp(
                fake_fn, wav_g_sg, params_d[name])
            losses[f"{name}_g"] = g_l
            losses[f"{name}_fm"] = fm_l
            d_loss = d_loss + (f_terms + r_terms) * inv_n

            one, zero = jnp.ones(()), jnp.zeros(())
            cots = (jnp.stack([one, zero, zero]),
                    jnp.stack([zero, one, zero]),
                    jnp.stack([zero, zero, inv_n]))
            dw, dpd = jax.vmap(pull_f)(cots)
            grads[f"{name}_g"] = dw[0]
            grads[f"{name}_fm"] = dw[1]
            # dw[2] (D loss wrt wav_g: stop-gradient) and dpd[0:2] (G
            # losses wrt live disc params) are the discarded outputs that
            # realize the separate path's stop_gradients
            d_grads[name] = jax.tree.map(lambda a, b: a[2] + b,
                                         dpd, dpd_real)
        return d_loss, d_grads

    # -- gradient computation (shared by train_step and the histogram dump) --
    def compute_grads(self, state: TrainState, wav_r: jnp.ndarray,
                      key: jax.Array) -> Dict[str, Any]:
        """Forward + balancer + both backward passes, returning the exact
        (pmean'd, clipped) grads the optimizers would consume plus all
        auxiliary outputs. Deterministic in (state, wav_r, key), so the
        plot_param_and_grad path recomputes identical grads."""
        axis = self.axis_name
        cd = self.compute_dtype
        cast = (lambda t: t) if cd == jnp.float32 else (
            lambda t: jax.tree.map(lambda x: x.astype(cd)
                                   if jnp.issubdtype(x.dtype, jnp.floating)
                                   else x, t))
        k_drop, k_vq = jax.random.split(jax.random.fold_in(
            key, state.iteration))
        n = self.model.vq.sample_n(k_drop)

        # ---- generator forward (single vjp) --------------------------------
        def gen_fn(params_g):
            wav_g, new_vq, loss_vq, n_rep = self.model.forward(
                cast(params_g), state.vq_state, cast(wav_r), k_vq, n=n,
                training=True, axis_name=axis)
            return (wav_g, loss_vq), (new_vq, n_rep, loss_vq)

        if self._want_remat("gen"):
            gen_fn = jax.checkpoint(gen_fn)
        (wav_g, _lv), gen_pull, aux = jax.vjp(gen_fn, state.params_g,
                                              has_aux=True)
        new_vq_state, num_replaces, loss_vq = aux
        wav_g_sg = jax.lax.stop_gradient(wav_g)
        wav_r_in = wav_r
        if self.lookahead > 0:
            wav_r_in = wav_r[:, :, :-self.lookahead]
            wav_g_sg = wav_g_sg[:, :, self.lookahead:]

        # ---- per-loss cotangents w.r.t. wav_g ------------------------------
        f32 = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float32), t)

        losses: Dict[str, jnp.ndarray] = {}
        grads: Dict[str, jnp.ndarray] = {}

        mel_fn = lambda w: self.mel_loss(w, wav_r_in)["freq"]
        if self._want_remat("mel"):
            mel_fn = jax.checkpoint(mel_fn)
        mel_val, mel_pull = jax.vjp(mel_fn, wav_g_sg)
        losses["freq"] = mel_val
        grads["freq"] = mel_pull(jnp.ones_like(mel_val))[0]

        r0, r1 = self.disc_update_ratio
        # wrapper.py:265: update D when (idx % r1) < r0
        do_d = jnp.asarray(((state.iteration + 1) % r1) < r0 if r1 > 1
                           else True)
        mode = self.fam_mode
        if mode == "joint" and r1 > 1:
            mode = "vmap"  # joint entangles the D backward with the G
            # pullbacks, so it can't skip D work under lax.cond

        if mode == "joint":
            d_loss, d_grads = self._disc_joint(
                state.params_d, wav_g_sg, wav_r_in, cast, f32,
                losses, grads)
        else:
            params_d_sg = cast(jax.lax.stop_gradient(state.params_d))
            _, fmaps_r = self.disc.apply(params_d_sg, cast(wav_r_in))
            fmaps_r = jax.lax.stop_gradient(f32(fmaps_r))

            for name, d in self.disc.discs.items():
                def fam(w, d=d, name=name):
                    lg, fg = d.apply(params_d_sg[name], cast(w))
                    g_l = self._g_loss_fn({name: f32(lg)})[f"{name}_g"]
                    fm_l = self._fm_loss_fn(
                        {name: f32(fg)},
                        {name: fmaps_r[name]})[f"{name}_fm"]
                    return (g_l, fm_l)

                if self._want_remat("disc"):
                    fam = jax.checkpoint(fam)
                (g_l, fm_l), pull = jax.vjp(fam, wav_g_sg)
                losses[f"{name}_g"] = g_l
                losses[f"{name}_fm"] = fm_l
                one = jnp.ones_like(g_l)
                zero = jnp.zeros_like(g_l)
                if mode == "vmap":
                    # one batched backward for both cotangents: saved
                    # residuals + weights read once instead of twice
                    dw = jax.vmap(lambda c: pull(c)[0])(
                        (jnp.stack([one, zero]), jnp.stack([zero, one])))
                    grads[f"{name}_g"] = dw[0]
                    grads[f"{name}_fm"] = dw[1]
                else:
                    grads[f"{name}_g"] = pull((one, zero))[0]
                    grads[f"{name}_fm"] = pull((zero, one))[0]

            def d_fn(params_d):
                p_c = cast(params_d)
                lg, _ = self.disc.apply(p_c, cast(wav_g_sg))
                lr_logits, _ = self.disc.apply(p_c, cast(wav_r_in))
                return self._d_loss_fn(f32(lg), f32(lr_logits))

            if self._want_remat("disc"):
                d_fn = jax.checkpoint(d_fn)

            if r1 > 1:
                # skip the full D backward on masked steps
                # (wrapper.py:265-277 skips the computation, not just the
                # update); the pmean stays outside the cond so collectives
                # run unconditionally.
                zeros = jax.tree.map(jnp.zeros_like, state.params_d)
                d_loss, d_grads = jax.lax.cond(
                    do_d,
                    lambda: jax.value_and_grad(d_fn)(state.params_d),
                    lambda: (jnp.zeros((), jnp.float32), zeros))
            else:
                d_loss, d_grads = jax.value_and_grad(d_fn)(state.params_d)

        # ---- balancer ------------------------------------------------------
        out_grad, new_bal, finite, ema_logs = self.balancer.combine(
            grads, state.balancer, axis_name=axis)
        if self.lookahead > 0:
            out_grad = jnp.pad(out_grad,
                               ((0, 0), (0, 0), (0, self.lookahead)))
        out_grad = out_grad.astype(wav_g.dtype)

        # ---- generator param grads via the shared pullback -----------------
        others_cot = jnp.asarray(self.balancer.weight_others, jnp.float32)
        g_grads = gen_pull((out_grad, others_cot))[0]
        if axis is not None:
            g_grads = jax.lax.pmean(g_grads, axis)

        if axis is not None:
            d_grads = jax.lax.pmean(d_grads, axis)

        # D-side non-finite guard (the reference's scaler_d backoff path,
        # wrapper.py fp16_d): a NaN/Inf in d_loss or any d_grad leaf skips
        # the D update instead of corrupting params_d permanently. Checked
        # after the pmean so a non-finite value on ANY replica gates all.
        d_finite = jnp.isfinite(d_loss)
        for leaf in jax.tree.leaves(d_grads):
            d_finite &= jnp.all(jnp.isfinite(leaf))
        do_d = jnp.logical_and(do_d, d_finite)

        if self.clipper is not None:
            g_grads = self.clipper(g_grads)
            d_grads = self.clipper(d_grads)

        return dict(g_grads=g_grads, d_grads=d_grads, d_loss=d_loss,
                    do_d=do_d, losses=losses, loss_vq=loss_vq,
                    new_vq_state=new_vq_state, num_replaces=num_replaces,
                    finite=finite, new_bal=new_bal, ema_logs=ema_logs)

    # -- the step ------------------------------------------------------------
    def train_step(self, state: TrainState, wav_r: jnp.ndarray,
                   key: jax.Array) -> Tuple[TrainState, Dict[str, Any]]:
        """wav_r: [B, 1, T] local shard. Returns (new_state, metrics)."""
        axis = self.axis_name
        aux = self.compute_grads(state, wav_r, key)
        finite, do_d = aux["finite"], aux["do_d"]

        lr_g = self.sched_g(self.lr_g, state.iteration,
                            state.epoch) * state.lr_scale
        upd_g, new_opt_g = self.optim_g.update(aux["g_grads"], state.opt_g,
                                               state.params_g, lr_g)
        params_g = jax.tree.map(
            lambda p, u: jnp.where(finite, p + u, p), state.params_g, upd_g)
        new_opt_g = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_opt_g,
            state.opt_g)
        # VQ codebooks only advance on successful steps too? The reference
        # updates them inside the forward regardless of balancer success —
        # keep that behavior (EMA stats are grad-free).
        vq_state = aux["new_vq_state"]

        lr_d = self.sched_d(self.lr_d, state.iteration,
                            state.epoch) * state.lr_scale
        upd_d, new_opt_d = self.optim_d.update(aux["d_grads"], state.opt_d,
                                               state.params_d, lr_d)
        params_d = jax.tree.map(
            lambda p, u: jnp.where(do_d, p + u, p), state.params_d, upd_d)
        new_opt_d = jax.tree.map(
            lambda new, old: jnp.where(do_d, new, old), new_opt_d,
            state.opt_d)
        params_d = _spectral_norm_power_iteration(params_d)

        new_state = TrainState(
            params_g=params_g, params_d=params_d, vq_state=vq_state,
            opt_g=new_opt_g, opt_d=new_opt_d, balancer=aux["new_bal"],
            iteration=state.iteration + 1, epoch=state.epoch,
            lr_scale=state.lr_scale)

        metrics = {"loss/" + k: v for k, v in aux["losses"].items()}
        metrics["loss/vq"] = aux["loss_vq"]
        # NaN on skipped steps so the epoch average covers update steps
        # only (the reference computes loss_d only on those steps,
        # wrapper.py:265-277); the loop's accumulator masks non-finite.
        metrics["loss/d"] = jnp.where(do_d, aux["d_loss"], jnp.nan)
        metrics["lr"] = lr_g
        metrics["finite"] = finite.astype(jnp.float32)
        metrics["num_replaces"] = aux["num_replaces"]
        metrics.update(aux["ema_logs"])
        if axis is not None:
            metrics = jax.tree.map(
                lambda x: jax.lax.pmean(x.astype(jnp.float32), axis)
                if x.dtype != jnp.int32 else x, metrics)
        return new_state, metrics

    # -- eval ----------------------------------------------------------------
    def valid_step(self, state: TrainState, wav_r: jnp.ndarray,
                   key: jax.Array) -> Dict[str, jnp.ndarray]:
        """Full loss dict without updates (wrapper.py:339-362)."""
        wav_g, _, loss_vq, _ = self.model.forward(
            state.params_g, state.vq_state, wav_r, key, n=None,
            training=False, axis_name=None)
        logits_g, fmaps_g = self.disc.apply(state.params_d, wav_g)
        logits_r, fmaps_r = self.disc.apply(state.params_d, wav_r)
        losses = dict(self.mel_loss(wav_g, wav_r))
        losses.update(self._g_loss_fn(logits_g))
        losses.update(self._fm_loss_fn(fmaps_g, fmaps_r))
        losses["d"] = self._d_loss_fn(logits_g, logits_r)
        losses["vq"] = loss_vq
        return {f"loss/{k}": v for k, v in losses.items()}


def _spectral_norm_power_iteration(params: Any) -> Any:
    """Walk the param tree; update every {v, u} spectral-norm pair's u
    buffer by one power iteration (torch updates u at each forward)."""
    def walk(node):
        if isinstance(node, dict):
            if "u" in node and "v" in node:
                node = dict(node)
                node["u"] = R.spectral_norm_power_iter(node["v"], node["u"])
                return node
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def make_parallel_train_step(trainer: Trainer, mesh: Mesh,
                             axis: str = "dp"):
    """shard_map the train step over a 1-D data-parallel mesh: batch split
    on `axis`, state replicated; grads/VQ-stats/balancer norms psum inside
    (SURVEY.md §2.11 TPU-native equivalent)."""
    trainer = dataclasses.replace(trainer, axis_name=axis)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P()),
             out_specs=(P(), P()),
             check_vma=False)
    def sharded_step(state, wav, key):
        new_state, metrics = trainer.train_step(state, wav, key)
        return new_state, metrics

    # donate the state: params/opt/VQ buffers update in place instead of
    # allocating + copying a second full state in HBM each step
    @partial(jax.jit, donate_argnums=(0,))
    def step(state, wav, key):
        return sharded_step(state, wav, key)

    return step
