"""End-to-end GAN train step: single-device semantics + 8-way data parallel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hilcodec_tpu.models.codec import CodecModel
from hilcodec_tpu.models.discriminators import Discriminators
from hilcodec_tpu.models.hilcodec import HILCodec
from hilcodec_tpu.models.losses import MelLoss
from hilcodec_tpu.ops.rvq import ResidualVQ
from hilcodec_tpu.train.balancer import Balancer, SimpleBalancer
from hilcodec_tpu.train.optim import AdamP, make_optimizer
from hilcodec_tpu.train.schedulers import CosineAnnealingWarmup
from hilcodec_tpu.train.step import Trainer, make_parallel_train_step


def tiny_trainer(axis_name=None):
    codec = HILCodec(channels_enc=8, channels_dec=8, n_residual_enc=1,
                     n_residual_dec=1, strides=(4, 2), n_fft_base=16,
                     vq_dim=16, res_scale_enc=0.577, res_scale_dec=0.577)
    vq = ResidualVQ(dim=16, codebook_size=32, num_quantizers=3,
                    kmeans_init=False, decay=0.99, ema_num_threshold=0.5,
                    ema_num_initial=0.5, dropout=True,
                    dropout_index=(1, 2, 3))
    model = CodecModel(codec, vq)
    disc = Discriminators(
        mfbd_kwargs={"use": True, "periods": [1, 2], "taps": 16,
                     "cutoff_freqs": [0.0, 0.25],
                     "channels": [4, 8], "kernel_sizes": [5, 5],
                     "strides": [3, 1]},
        mstftd_kwargs={"use": True, "filters": 4,
                       "n_ffts": [64], "hop_lengths": [16],
                       "win_lengths": [64]})
    mel = MelLoss(24000, n_mels_max=16)
    balancer = Balancer(weights=(("freq", 0.48), ("mfbd_g", 1.1),
                                 ("mfbd_fm", 1.1), ("mstftd_g", 1.1),
                                 ("mstftd_fm", 1.1)),
                        weight_others=0.01, ema_decay=0.99)
    opt_g, lr_g = make_optimizer("AdamP", {"lr": 5e-4, "betas": [0.5, 0.9],
                                           "weight_decay": 1e-5})
    opt_d, lr_d = make_optimizer("AdamP", {"lr": 5e-4, "betas": [0.5, 0.9],
                                           "weight_decay": 1e-5})
    sched = CosineAnnealingWarmup(warmup_iterations=10, T_max=100,
                                  eta_min=1e-6)
    return Trainer(model=model, disc=disc, mel_loss=mel, balancer=balancer,
                   optim_g=opt_g, optim_d=opt_d, sched_g=sched,
                   sched_d=sched, lr_g=lr_g, lr_d=lr_d,
                   axis_name=axis_name)


@pytest.fixture(scope="module")
def trainer():
    return tiny_trainer()


def test_train_step_runs_and_updates(trainer, rng):
    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32)
    step = jax.jit(trainer.train_step)
    new_state, metrics = step(state, jnp.asarray(wav),
                              jax.random.PRNGKey(1))
    assert int(new_state.iteration) == 1
    assert float(metrics["finite"]) == 1.0
    for k in ("loss/freq", "loss/mfbd_g", "loss/mstftd_fm", "loss/d",
              "loss/vq"):
        assert np.isfinite(float(metrics[k])), k
    # params actually moved
    d0 = jax.tree.leaves(state.params_g)[0]
    d1 = jax.tree.leaves(new_state.params_g)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    # EMA norms updated
    assert float(new_state.balancer["ema_fix"]) > 0

    # second step with same compiled fn
    state2, m2 = step(new_state, jnp.asarray(wav), jax.random.PRNGKey(2))
    assert int(state2.iteration) == 2


def test_warmup_lr_schedule(trainer, rng):
    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32)
    step = jax.jit(trainer.train_step)
    _, m1 = step(state, jnp.asarray(wav), jax.random.PRNGKey(1))
    # iteration 0 -> lr = base * 1/10
    np.testing.assert_allclose(float(m1["lr"]), 5e-4 / 10, rtol=1e-5)


def test_valid_step(trainer, rng):
    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32)
    losses = jax.jit(trainer.valid_step)(state, jnp.asarray(wav),
                                         jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in losses.values())


@pytest.mark.slow
def test_parallel_train_step_8dev(rng):
    """Data-parallel step on the virtual 8-CPU mesh: replicated states stay
    bit-identical (the reference's end-of-epoch consistency assert,
    wrapper.py:306-314, holds by construction — verified numerically)."""
    devs = jax.devices()
    assert len(devs) == 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devs), ("dp",))
    trainer = tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((8, 1, hop * 128)) * 0.3).astype(np.float32)

    pstep = make_parallel_train_step(trainer, mesh, "dp")
    new_state, metrics = pstep(state, jnp.asarray(wav),
                               jax.random.PRNGKey(1))
    assert float(metrics["finite"]) == 1.0
    assert int(new_state.iteration) == 1
    for k in ("loss/freq", "loss/d"):
        assert np.isfinite(float(metrics[k]))

    # single-device equivalence on the same total batch: the psum-averaged
    # grads equal the full-batch grads
    strainer = tiny_trainer()
    sstate = strainer.init_state(jax.random.PRNGKey(0))
    sstep = jax.jit(strainer.train_step)
    sref, smet = sstep(sstate, jnp.asarray(wav), jax.random.PRNGKey(1))
    for a, b in zip(jax.tree.leaves(sref.params_g),
                    jax.tree.leaves(new_state.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)


@pytest.mark.slow
def test_overfit_single_batch(rng):
    """Training sanity: repeated steps on one batch drive the mel loss
    down (the balancer + AdamP + straight-through VQ actually learn)."""
    trainer = tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32)
    step = jax.jit(trainer.train_step)
    first = None
    for i in range(30):
        state, m = step(state, jnp.asarray(wav), jax.random.PRNGKey(7))
        if i == 0:
            first = float(m["loss/freq"])
        assert float(m["finite"]) == 1.0
    last = float(m["loss/freq"])
    assert last < first * 0.95, (first, last)


@pytest.mark.slow
def test_clip_grad_changes_updates(rng):
    """clip_grad: norm_local with a tiny max_norm must change the applied
    update (reference wrapper.py:252-257 clips every step)."""
    import dataclasses
    from hilcodec_tpu.train.grad_clip import make_clipper

    base = tiny_trainer()
    clipped = dataclasses.replace(
        base, clipper=make_clipper("norm_local", {"max_norm": 1e-6}))
    state = base.init_state(jax.random.PRNGKey(0))
    hop = base.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32)

    s_base, _ = jax.jit(base.train_step)(state, jnp.asarray(wav),
                                         jax.random.PRNGKey(1))
    s_clip, m_clip = jax.jit(clipped.train_step)(state, jnp.asarray(wav),
                                                 jax.random.PRNGKey(1))
    assert float(m_clip["finite"]) == 1.0
    diffs = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(s_base.params_g),
                             jax.tree.leaves(s_clip.params_g))]
    assert any(diffs), "clipping had no effect on the update"


@pytest.mark.slow
def test_disc_update_ratio_skips_d(rng):
    """disc_update_ratio=[1,2]: D params move only on steps with
    (idx % r1) < r0 (wrapper.py:265); the skipped step leaves D and its
    optimizer state untouched."""
    import dataclasses
    trainer = dataclasses.replace(tiny_trainer(), disc_update_ratio=(1, 2))
    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32)
    step = jax.jit(trainer.train_step)

    # iteration 0: (0+1) % 2 = 1 >= r0=1 -> skip D
    s1, m1 = step(state, jnp.asarray(wav), jax.random.PRNGKey(1))
    # spectral-norm u buffers power-iterate every step; compare weights only
    def weights(p):
        return [l for kp, l in jax.tree_util.tree_flatten_with_path(p)[0]
                if getattr(kp[-1], "key", None) != "u"]
    for a, b in zip(weights(state.params_d), weights(s1.params_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # skipped steps report NaN so epoch averages cover update steps only
    # (the reference computes loss_d only on those steps)
    assert np.isnan(float(m1["loss/d"]))

    # iteration 1: (1+1) % 2 = 0 < 1 -> update D
    s2, m2 = step(s1, jnp.asarray(wav), jax.random.PRNGKey(2))
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(weights(s1.params_d), weights(s2.params_d))]
    assert any(moved)
    assert float(m2["loss/d"]) != 0.0


@pytest.mark.slow
def test_lr_scale_multiplies_lr(trainer, rng):
    """TrainState.lr_scale (ReduceLROnPlateau host knob) scales the
    effective LR inside the compiled step."""
    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32)
    step = jax.jit(trainer.train_step)
    _, m1 = step(state, jnp.asarray(wav), jax.random.PRNGKey(1))
    state_scaled = state._replace(lr_scale=jnp.asarray(0.5, jnp.float32))
    _, m2 = step(state_scaled, jnp.asarray(wav), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m2["lr"]), float(m1["lr"]) * 0.5,
                               rtol=1e-6)


def test_reduce_lr_on_plateau_semantics():
    """Reference step() behavior: initial_patience holds LR, then
    `patience` bad epochs trigger a factor decay, cooldown suppresses
    counting (optim/lr_scheduler.py:215-240)."""
    from hilcodec_tpu.train.schedulers import ReduceLROnPlateau

    sched = ReduceLROnPlateau(factor=0.5, patience=1, initial_patience=2,
                              cooldown=1, threshold=1e-4)
    st = sched.init_state()
    # two epochs of non-improvement inside initial_patience: no decay
    st = sched.update(st, 1.0)
    st = sched.update(st, 1.0)   # bad_epochs=1 but epoch<=initial_patience
    assert st["scale"] == 1.0
    st = sched.update(st, 1.0)   # bad_epochs=2 > patience=1 -> decay
    assert st["scale"] == 0.5
    st = sched.update(st, 1.0)   # cooldown epoch: bad_epochs reset
    assert st["scale"] == 0.5
    st = sched.update(st, 1.0)   # bad_epochs=1, not > patience
    assert st["scale"] == 0.5
    st = sched.update(st, 1.0)   # bad_epochs=2 -> decay again
    assert st["scale"] == 0.25
    # improvement resets
    st = sched.update(st, 0.1)
    assert st["bad_epochs"] == 0 and st["best"] == 0.1
    # min_lr floors the absolute LR given base_lr
    sched2 = ReduceLROnPlateau(factor=0.1, patience=0, min_lr=1e-4)
    st2 = sched2.init_state()
    st2 = sched2.update(st2, 1.0)
    st2 = sched2.update(st2, 1.0, base_lr=1e-3)
    assert st2["scale"] == pytest.approx(0.1)
    st2 = sched2.update(st2, 1.0, base_lr=1e-3)
    assert st2["scale"] == pytest.approx(0.1)  # floored at min_lr/base_lr


@pytest.mark.slow
def test_bf16_mixed_precision_step(rng):
    """compute_dtype=bfloat16: networks run bf16, masters/VQ/losses stay
    f32, the step is finite and moves params; f32 state dtypes preserved."""
    import dataclasses as _dc
    tr32 = tiny_trainer()
    tr16 = _dc.replace(tr32, compute_dtype=jnp.bfloat16)
    state = tr16.init_state(jax.random.PRNGKey(0))
    hop = tr16.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32)
    new_state, metrics = jax.jit(tr16.train_step)(
        state, jnp.asarray(wav), jax.random.PRNGKey(1))
    assert float(metrics["finite"]) == 1.0
    for k in ("loss/freq", "loss/mfbd_g", "loss/mstftd_fm", "loss/d",
              "loss/vq"):
        assert np.isfinite(float(metrics[k])), k
    # master params stay f32 and actually moved
    for leaf in jax.tree.leaves(new_state.params_g):
        assert leaf.dtype != jnp.bfloat16
    d0 = jax.tree.leaves(state.params_g)[0]
    d1 = jax.tree.leaves(new_state.params_g)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    # VQ state stays f32 (EMA stats must not degrade)
    assert new_state.vq_state["embed"].dtype == jnp.float32
    # bf16 losses track the f32 run to bf16-resolution accuracy
    _, m32 = jax.jit(tr32.train_step)(
        tr32.init_state(jax.random.PRNGKey(0)), jnp.asarray(wav),
        jax.random.PRNGKey(1))
    f32v, f16v = float(m32["loss/freq"]), float(metrics["loss/freq"])
    assert abs(f32v - f16v) / max(abs(f32v), 1e-6) < 0.1


def test_compute_dtype_from_config():
    from hilcodec_tpu.train.loop import _compute_dtype_from_config

    class H(dict):
        def get(self, k, d=None):
            return super().get(k, d)

    assert _compute_dtype_from_config(H()) == jnp.float32
    assert _compute_dtype_from_config(
        H(compute_dtype="bfloat16")) == jnp.bfloat16
    # reference configs' fp16_g: True maps to bf16 (TPU half precision)
    assert _compute_dtype_from_config(H(fp16_g=True)) == jnp.bfloat16
    assert _compute_dtype_from_config(
        H(fp16_g=True, compute_dtype="float32")) == jnp.float32


def test_d_nonfinite_guard(rng):
    """A non-finite discriminator loss/grad must skip the D update instead
    of corrupting params_d (the reference's scaler_d backoff case)."""
    trainer = tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0))
    # poison one D conv weight -> inf logits -> non-finite d_loss/d_grads
    params_d = jax.tree.map(lambda x: x, state.params_d)
    params_d["mfbd"]["discs"][0]["convs"][0]["g"] = (
        params_d["mfbd"]["discs"][0]["convs"][0]["g"] * jnp.inf)
    state = state._replace(params_d=params_d)
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32)
    new_state, metrics = jax.jit(trainer.train_step)(
        state, jnp.asarray(wav), jax.random.PRNGKey(1))

    def weights(p):
        return [l for kp, l in jax.tree_util.tree_flatten_with_path(p)[0]
                if getattr(kp[-1], "key", None) != "u"]

    # D params untouched (no inf/nan written into previously-finite leaves)
    for a, b in zip(weights(state.params_d), weights(new_state.params_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isnan(float(metrics["loss/d"]))


def test_novq_trainer_step(rng):
    """`vq: ""` ablation trains: gradients flow encoder->decoder directly,
    loss_vq == 0, num_replaces empty (models.py:101-118 quantizer=None)."""
    import dataclasses
    from hilcodec_tpu.ops.rvq import NoVQ

    base = tiny_trainer()
    model = CodecModel(base.model.codec, NoVQ())
    trainer = dataclasses.replace(base, model=model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32)
    new_state, metrics = jax.jit(trainer.train_step)(
        state, jnp.asarray(wav), jax.random.PRNGKey(1))
    assert float(metrics["finite"]) == 1.0
    assert float(metrics["loss/vq"]) == 0.0
    assert np.asarray(metrics["num_replaces"]).shape == (0,)
    # encoder params move (grads flow through the pass-through "quantizer")
    enc0 = jax.tree.leaves(state.params_g["encoder"])[0]
    enc1 = jax.tree.leaves(new_state.params_g["encoder"])[0]
    assert not np.allclose(np.asarray(enc0), np.asarray(enc1))


def test_depthwise_lowering_config_plumb():
    """`train.depthwise_lowering: shift` reaches ops.conv's lowering flag
    through build_trainer (and resets to "conv" for configs without it)."""
    from hilcodec_tpu.ops import conv as C
    from hilcodec_tpu.train.loop import build_trainer
    from hilcodec_tpu.utils.hparams import load_config

    hps = load_config("configs/hilcodec_speech_synth.yaml")
    hps.model_kwargs.channels_enc = 8
    hps.model_kwargs.channels_dec = 8
    hps.model_kwargs.n_residual_enc = 1
    hps.model_kwargs.n_residual_dec = 1
    try:
        hps.train.depthwise_lowering = "shift"
        build_trainer(hps)
        assert C._DEPTHWISE_LOWERING == "shift"
        del hps.train.depthwise_lowering
        build_trainer(hps)
        assert C._DEPTHWISE_LOWERING == "conv"
    finally:
        C.set_depthwise_lowering("conv")


def test_fbd_lowering_and_fam_mode_config_plumb():
    """The shipped hilcodec configs adopt the A/B winner
    `train.fbd_lowering: bands1d` (BASELINE.md round-3) and it reaches the
    discriminator module through build_trainer; `train.fam_mode` reaches
    the Trainer. Reference-format configs without the knobs get the
    measured defaults (conv2d / separate)."""
    from hilcodec_tpu.models import discriminators as D
    from hilcodec_tpu.train.loop import build_trainer
    from hilcodec_tpu.utils.hparams import load_config

    hps = load_config("configs/hilcodec_speech_synth.yaml")
    assert hps.train.fbd_lowering == "bands1d"
    hps.model_kwargs.channels_enc = 8
    hps.model_kwargs.channels_dec = 8
    hps.model_kwargs.n_residual_enc = 1
    hps.model_kwargs.n_residual_dec = 1
    try:
        tr = build_trainer(hps)
        assert D._FBD_LOWERING == "bands1d"
        assert tr.fam_mode == "separate"
        hps.train.fam_mode = "vmap"
        tr = build_trainer(hps)
        assert tr.fam_mode == "vmap"
        del hps.train.fbd_lowering
        build_trainer(hps)
        assert D._FBD_LOWERING == "conv2d"
    finally:
        D.set_fbd_lowering("conv2d")


@pytest.mark.parametrize("mode", ["vmap", "joint"])
@pytest.mark.slow
def test_fam_mode_equivalence(trainer, rng, mode):
    """fam_mode 'vmap'/'joint' are pure gradient-plumbing restructurings
    of 'separate' (train/step.py) — same losses, same G/D grads, same
    d_loss, to fp tolerance. This pins the HBM-optimized paths to the
    reference-shaped semantics that test_train_parity certifies."""
    import dataclasses
    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = trainer.model.hop_length
    wav = jnp.asarray(
        (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32))
    key = jax.random.PRNGKey(1)

    ref = jax.jit(trainer.compute_grads)(state, wav, key)
    alt_tr = dataclasses.replace(trainer, fam_mode=mode)
    alt = jax.jit(alt_tr.compute_grads)(state, wav, key)

    for k in ref["losses"]:
        np.testing.assert_allclose(float(alt["losses"][k]),
                                   float(ref["losses"][k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(float(alt["d_loss"]), float(ref["d_loss"]),
                               rtol=1e-5, atol=1e-6)

    def cmp(a, b, what):
        fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(fa) == len(fb), what
        for x, y in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-4, atol=2e-6, err_msg=what)

    cmp(alt["g_grads"], ref["g_grads"], f"g_grads[{mode}]")
    cmp(alt["d_grads"], ref["d_grads"], f"d_grads[{mode}]")
    assert bool(alt["do_d"]) == bool(ref["do_d"])


def test_fam_mode_joint_falls_back_with_update_ratio(trainer, rng):
    """joint can't skip the D backward under lax.cond, so r1 > 1 routes
    through the vmap plumbing — and still masks D grads on skip steps."""
    import dataclasses
    tr = dataclasses.replace(trainer, fam_mode="joint",
                             disc_update_ratio=(1, 2))
    state = tr.init_state(jax.random.PRNGKey(0))
    hop = tr.model.hop_length
    wav = jnp.asarray(
        (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32))
    # iteration 0: (0+1) % 2 = 1 >= 1 -> skip step, D grads must be zero
    aux = jax.jit(tr.compute_grads)(state, wav, jax.random.PRNGKey(1))
    assert not bool(aux["do_d"])
    for leaf in jax.tree.leaves(aux["d_grads"]):
        assert float(np.abs(np.asarray(leaf)).max()) == 0.0


@pytest.mark.parametrize("remat", ["disc", "gen", "mel", "all"])
@pytest.mark.slow
def test_remat_equivalence(trainer, rng, remat):
    """`train.remat` only changes WHEN forwards are recomputed
    (jax.checkpoint residual policy), never the math — same losses and
    same G/D grads as the store-everything step, to fp tolerance."""
    import dataclasses
    state = trainer.init_state(jax.random.PRNGKey(0))
    hop = trainer.model.hop_length
    wav = jnp.asarray(
        (rng.standard_normal((2, 1, hop * 128)) * 0.3).astype(np.float32))
    key = jax.random.PRNGKey(1)

    ref = jax.jit(trainer.compute_grads)(state, wav, key)
    alt_tr = dataclasses.replace(trainer, remat=remat)
    alt = jax.jit(alt_tr.compute_grads)(state, wav, key)

    for k in ref["losses"]:
        np.testing.assert_allclose(float(alt["losses"][k]),
                                   float(ref["losses"][k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(float(alt["d_loss"]), float(ref["d_loss"]),
                               rtol=1e-5, atol=1e-6)

    def cmp(a, b, what):
        fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(fa) == len(fb), what
        for x, y in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-4, atol=2e-6, err_msg=what)

    cmp(alt["g_grads"], ref["g_grads"], f"g_grads[remat={remat}]")
    cmp(alt["d_grads"], ref["d_grads"], f"d_grads[remat={remat}]")
    cmp(alt["new_vq_state"], ref["new_vq_state"], "vq_state")
    assert bool(alt["do_d"]) == bool(ref["do_d"])
