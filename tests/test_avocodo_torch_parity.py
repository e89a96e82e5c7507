"""Avocodo-family cross-framework parity with transplanted weights.

The avocodo family is the reference's most distinct trainer (D-before-G,
PQMF multi-scale targets, CoMBD+SBD, simple weighted-sum balancer, LSGAN,
UNNORMALIZED loss sums, single-res mel at the model hop). Nothing else
pins it against the reference's own torch graphs; this file does, at three
levels:

  1. generator forward: our AvocodoModel vs models/avocodo/models.py
     EncodecModel(return_list=True) — all three output scales;
  2. discriminators: CoMBD (models/avocodo/avocodo/CoMBD.py) and SBD
     (SBD.py) logits + feature maps;
  3. one full training step: losses (mel/fm/g per family, d, vq), G and D
     gradients leaf-by-leaf, and per-parameter deltas after one AdamP step
     (the reference flow, models/avocodo/wrapper.py:224-266).

Step-order note: the reference steps optim_d BEFORE the generator backward
on a retained graph; its AdamP updates parameters through `.data`, so that
retained backward silently reads POST-update discriminator weights (the
version counter is bypassed — an in-place artifact, not a design choice:
the wrapper explicitly freezes D and reuses the pre-step logits). We pin
the consistent semantics instead: both backwards run against the pre-step
weights, then both optimizers step. D grads/deltas are unaffected by the
reorder; G grads are compared under the same (pre-step) weights our
trainer uses. The reference's polluted-then-zeroed d.grad after its G
backward is likewise reproduced by restoring the D grad snapshot before
optim_d.step().
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_compat import import_reference
from hilcodec_tpu.models.avocodo import (AvocodoDiscriminators,
                                         AvocodoModel, pqmf_targets)
from hilcodec_tpu.models.losses import HifiGANMelLoss
from hilcodec_tpu.ops.rvq import ResidualVQ
from hilcodec_tpu.train.balancer import SimpleBalancer
from hilcodec_tpu.train.optim import make_optimizer
from hilcodec_tpu.train.schedulers import EmptyScheduler
from hilcodec_tpu.train.step_avocodo import (AvocodoCodecModel,
                                             AvocodoTrainer)
from hilcodec_tpu.utils.pytree import leaf_paths

torch = pytest.importorskip("torch")

from test_torch_model_parity import (_WN, _hil_enc_torch_name,  # noqa: E402
                                     _load, _to_torch_sd)
from test_train_parity import _close, _warm_scales  # noqa: E402

RES_SCALE = 0.577
# strides so the 3 decoder heads land on 1/8, 1/2, full rate, matching the
# PQMF lv2 (8 subbands) / lv1 (2 subbands) target ladder of the shipped
# config (configs/avocodo_music.yaml pqmf_config)
STRIDES = (4, 2, 4, 2)
VQ_KW = dict(dim=16, codebook_size=32, num_quantizers=2, kmeans_init=False,
             decay=0.99, ema_num_threshold=0.5, ema_num_initial=1.0,
             dropout=False)
PQMF_CONFIG = {"lv1": (2, 64, 0.25, 10.0), "lv2": (8, 48, 0.067, 10.0)}
DISC_H = {
    "combd_h_u": [[4, 8], [4, 8], [4, 8]],
    "combd_d_k": [[7, 5], [11, 5], [15, 5]],
    "combd_d_s": [[1, 1], [1, 1], [1, 1]],
    "combd_d_d": [[1, 1], [1, 1], [1, 1]],
    "combd_d_g": [[1, 1], [1, 1], [1, 1]],
    "combd_d_p": [[3, 2], [5, 2], [7, 2]],
    "combd_op_f": [1, 1, 1], "combd_op_k": [3, 3, 3],
    "combd_op_g": [1, 1, 1],
    "sbd_filters": [[4, 4], [4, 4]],
    "sbd_strides": [[1, 1], [1, 1]],
    "sbd_kernel_sizes": [[[3, 3], [3, 3]], [[3, 3], [3, 3]]],
    "sbd_dilations": [[[1, 2], [1, 2]], [[1, 2], [1, 2]]],
    "sbd_band_ranges": [[0, 4], [4, 8]],
    "sbd_transpose": [False, False],
    "segment_size": 4096,
    "pqmf_config": {"lv1": [2, 64, 0.25, 10.0],
                    "lv2": [8, 48, 0.067, 10.0],
                    "sbd": [8, 48, 0.067, 10.0],
                    "fsbd": [16, 48, 0.03, 10.0]},
}
WEIGHTS = {"freq": 45.0, "combd_g": 1.0, "combd_fm": 2.0,
           "sbd_g": 1.0, "sbd_fm": 2.0}
WEIGHT_OTHERS = 0.01
MEL_KW = dict(n_fft=128, num_mels=16, win_size=128)  # hop = model hop
OPT_KW = dict(lr=5e-4, betas=(0.5, 0.9), weight_decay=1e-5)


class _H:
    """Attribute-style view of DISC_H for the reference modules (they read
    h.combd_h_u / h.pqmf_config[...] off an HParams namespace)."""

    def __init__(self, d):
        self.__dict__.update(d)


# ---------------------------------------------------------------------------
# name maps
# ---------------------------------------------------------------------------

def _avo_dec_torch_name(path: str, tdec) -> str:
    """JAX AvocodoDecoder path -> reference avocodo SEANetDecoder name.

    The torch decoder is a ModuleList of per-stage Sequentials (`model.{s}`)
    plus per-scale heads (`conv_post.{k}`, conv at Sequential index 2,
    models/avocodo/modules/seanet.py:440-521). Stage-internal indices are
    read off the instantiated module, not hardcoded."""
    sd_keys = list(tdec.state_dict().keys())

    def stage_indices(s):
        convtr = sorted({int(m.group(1)) for k in sd_keys
                         if (m := re.match(rf"model\.{s}\.(\d+)\.convtr",
                                           k))})
        convs = sorted({int(m.group(1)) for k in sd_keys
                        if (m := re.match(rf"model\.{s}\.(\d+)\.conv\.conv",
                                          k))})
        res = sorted({int(m.group(1)) for k in sd_keys
                      if (m := re.match(
                          rf"model\.{s}\.(\d+)\.res_scale_param", k))})
        return convtr, convs, res

    m = re.fullmatch(r"pre_(pw|dw)/(\w)", path)
    if m:
        _, convs, _ = stage_indices(0)
        idx = convs[0] if m.group(1) == "pw" else convs[1]
        return f"model.0.{idx}.conv.conv.{_WN[m.group(2)]}"
    m = re.fullmatch(r"stages/(\d+)/up_dw/(\w)", path)
    if m:
        convtr, _, _ = stage_indices(int(m.group(1)))
        return f"model.{m.group(1)}.{convtr[0]}.convtr.convtr." \
               f"{_WN[m.group(2)]}"
    m = re.fullmatch(r"stages/(\d+)/up_pw/(\w)", path)
    if m:
        convtr, _, _ = stage_indices(int(m.group(1)))
        return f"model.{m.group(1)}.{convtr[0] + 1}.conv.conv." \
               f"{_WN[m.group(2)]}"
    m = re.fullmatch(r"stages/(\d+)/blocks/(\d+)/res_scale_param", path)
    if m:
        _, _, res = stage_indices(int(m.group(1)))
        return f"model.{m.group(1)}.{res[int(m.group(2))]}.res_scale_param"
    m = re.fullmatch(
        r"stages/(\d+)/blocks/(\d+)/blocks/(\d+)/(pointwise|depthwise)/(\w)",
        path)
    if m:
        s, j, k, kind, leaf = m.groups()
        _, _, res = stage_indices(int(s))
        idx = 3 * int(k) + (1 if kind == "pointwise" else 2)
        return f"model.{s}.{res[int(j)]}.block.{idx}.conv.conv.{_WN[leaf]}"
    m = re.fullmatch(r"heads/(\d+)/(\w)", path)
    if m:
        return f"conv_post.{m.group(1)}.2.conv.conv.{_WN[m.group(2)]}"
    raise KeyError(path)


def _combd_torch_name(path: str) -> str:
    """CoMBD: weight_norm applied directly on Conv1d (CoMBD.py:36-55)."""
    m = re.fullmatch(r"blocks/(\d+)/convs/(\d+)/(\w)", path)
    if m:
        return f"blocks.{m.group(1)}.convs.{m.group(2)}.{_WN[m.group(3)]}"
    m = re.fullmatch(r"blocks/(\d+)/proj/(\w)", path)
    if m:
        return f"blocks.{m.group(1)}.projection_conv.{_WN[m.group(2)]}"
    raise KeyError(path)


def _sbd_torch_name(path: str) -> str:
    """SBD: SBDBlock.convs = ModuleList of MDC (d_convs + post_conv),
    block-level post_conv (SBD.py:62-110)."""
    m = re.fullmatch(r"blocks/(\d+)/mdcs/(\d+)/convs/(\d+)/(\w)", path)
    if m:
        return (f"discriminators.{m.group(1)}.convs.{m.group(2)}.d_convs."
                f"{m.group(3)}.{_WN[m.group(4)]}")
    m = re.fullmatch(r"blocks/(\d+)/mdcs/(\d+)/post/(\w)", path)
    if m:
        return (f"discriminators.{m.group(1)}.convs.{m.group(2)}."
                f"post_conv.{_WN[m.group(3)]}")
    m = re.fullmatch(r"blocks/(\d+)/post/(\w)", path)
    if m:
        return f"discriminators.{m.group(1)}.post_conv.{_WN[m.group(2)]}"
    raise KeyError(path)


def _disc_torch_name(path: str) -> str:
    if path.startswith("combd/"):
        return "discs.combd." + _combd_torch_name(path[len("combd/"):])
    return "discs.sbd." + _sbd_torch_name(path[len("sbd/"):])


PQMF_BUFFERS = ("analysis_filter", "synthesis_filter", "updown_filter",
                "pqmf.H", "pqmf.G", "spec.weight", "window",
                "_extra_state")


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------

def _build_jax():
    model = AvocodoModel(channels_enc=8, channels_dec=8, n_fft_base=16,
                         n_residual_enc=1, n_residual_dec=1,
                         strides=STRIDES, vq_dim=16,
                         res_scale_enc=RES_SCALE, res_scale_dec=RES_SCALE)
    vq = ResidualVQ(**VQ_KW)
    disc = AvocodoDiscriminators(combd_kwargs={"use": True, "h": DISC_H},
                                 sbd_kwargs={"use": True, "h": DISC_H})
    opt_g, lr_g = make_optimizer("AdamP", dict(OPT_KW))
    opt_d, lr_d = make_optimizer("AdamP", dict(OPT_KW))
    hop = model.hop_length
    trainer = AvocodoTrainer(
        model=AvocodoCodecModel(model, vq), disc=disc,
        mel_loss=HifiGANMelLoss(24000, 1e-5, MEL_KW["n_fft"],
                                MEL_KW["num_mels"], hop,
                                MEL_KW["win_size"]),
        balancer=SimpleBalancer(weights=tuple(WEIGHTS.items()),
                                weight_others=WEIGHT_OTHERS),
        optim_g=opt_g, optim_d=opt_d, sched_g=EmptyScheduler(),
        sched_d=EmptyScheduler(), lr_g=lr_g, lr_d=lr_d,
        pqmf_config=PQMF_CONFIG, use_lsgan=True, use_normalized_fm=False)
    return trainer


def _build_torch_gen(state):
    models = import_reference("models.avocodo.models")
    tm = models.EncodecModel(
        sample_rate=24000, channels_enc=8, channels_dec=8, n_fft_base=16,
        n_residual_enc=1, n_residual_dec=1, res_scale_enc=RES_SCALE,
        res_scale_dec=RES_SCALE, strides=list(STRIDES),
        spec_layer="1x1_zero", spec_compression="log",
        # the avocodo copy defaults pad_mode='reflect'; the shipped config
        # pins 'constant' (configs/avocodo_music.yaml:23), which is what
        # our causal layers implement
        pad_mode="constant",
        vq_kwargs=dict(VQ_KW))
    sd = {}
    for path, leaf in zip(leaf_paths(state.params_g["encoder"]),
                          jax.tree.leaves(state.params_g["encoder"])):
        sd["encoder." + _hil_enc_torch_name(path)] = torch.from_numpy(
            np.asarray(leaf).copy())
    for path, leaf in zip(leaf_paths(state.params_g["decoder"]),
                          jax.tree.leaves(state.params_g["decoder"])):
        sd["decoder." + _avo_dec_torch_name(path, tm.decoder)] = \
            torch.from_numpy(np.asarray(leaf).copy())
    for i in range(VQ_KW["num_quantizers"]):
        for k in ("embed", "ema_embed"):
            sd[f"quantizer.layers.{i}.{k}"] = torch.from_numpy(
                np.asarray(state.vq_state[k][i]).copy())
        sd[f"quantizer.layers.{i}.ema_num"] = torch.from_numpy(
            np.asarray(state.vq_state["ema_num"][i]).copy())
    _load(tm, sd, allowed_missing=PQMF_BUFFERS)
    return tm


def _build_torch_disc(state):
    discs = import_reference("models.avocodo.discriminators")
    tdisc = discs.Discriminators(combd_kwargs={"use": True, "h": _H(DISC_H)},
                                 sbd_kwargs={"use": True, "h": _H(DISC_H)})
    dsd = {}
    for path, leaf in zip(leaf_paths(state.params_d),
                          jax.tree.leaves(state.params_d)):
        dsd[_disc_torch_name(path)] = torch.from_numpy(
            np.asarray(leaf).copy())
    _load(tdisc, dsd, allowed_missing=PQMF_BUFFERS)
    return tdisc


@pytest.fixture(scope="module")
def setup():
    trainer = _build_jax()
    state = trainer.init_state(jax.random.PRNGKey(7))
    state = state._replace(params_g=_warm_scales(state.params_g))
    vq_state = dict(state.vq_state)
    vq_state["embed"] = jax.random.normal(
        jax.random.PRNGKey(5), vq_state["embed"].shape, jnp.float32) * 0.5
    vq_state["ema_embed"] = vq_state["embed"] * VQ_KW["ema_num_initial"]
    state = state._replace(vq_state=vq_state)
    tm = _build_torch_gen(state)
    tdisc = _build_torch_disc(state)
    rng = np.random.default_rng(3)
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 64)) * 0.3).astype(np.float32)
    return trainer, state, tm, tdisc, wav


# ---------------------------------------------------------------------------
# 1. generator forward (all three scales)
# ---------------------------------------------------------------------------

def test_avocodo_generator_forward_parity(setup):
    trainer, state, tm, tdisc, wav = setup
    tm.eval()
    with torch.no_grad():
        t_ys, _nr, t_vq = tm(torch.from_numpy(wav), return_list=True)
    ys, _, loss_vq, _ = trainer.model.forward_multiscale(
        state.params_g, state.vq_state, jnp.asarray(wav),
        jax.random.PRNGKey(0), training=False)
    assert len(ys) == len(t_ys) == 3
    for i, (a, b) in enumerate(zip(ys, t_ys)):
        _close(np.asarray(a), b.numpy(), 2e-4, f"ys[{i}]",
               denom_floor=1e-3)
    _close(float(loss_vq), float(t_vq), 1e-4, "loss_vq")


# ---------------------------------------------------------------------------
# 2. discriminators (CoMBD + SBD) on the multi-scale list
# ---------------------------------------------------------------------------

def test_avocodo_discriminator_parity(setup):
    trainer, state, tm, tdisc, wav = setup
    ys_r = pqmf_targets(jnp.asarray(wav), PQMF_CONFIG)
    logits, fmaps = trainer.disc.apply(state.params_d, ys_r)
    with torch.no_grad():
        t_logits, t_fmaps = tdisc([torch.from_numpy(np.asarray(y))
                                   for y in ys_r])
    for name in ("combd", "sbd"):
        assert len(logits[name]) == len(t_logits[name]), name
        for i, (a, b) in enumerate(zip(logits[name], t_logits[name])):
            _close(np.asarray(a), b.numpy(), 2e-4, f"{name} logit {i}")
        assert len(fmaps[name]) == len(t_fmaps[name]), name
        for i, (a, b) in enumerate(zip(fmaps[name], t_fmaps[name])):
            _close(np.asarray(a), b.numpy(), 2e-4, f"{name} fmap {i}")


# ---------------------------------------------------------------------------
# 3. one full training step
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_avocodo_train_step_parity(setup, monkeypatch):
    trainer, state, tm, tdisc, wav = setup
    tm.train()
    tdisc.train()
    # the avocodo mel calls the pre-1.8 torch.stft API (losses.py:69-73,
    # no return_complex) and then .pow(2).sum(-1) on the real view
    orig_stft = torch.stft

    def _stft_compat(*a, **k):
        if "return_complex" not in k:
            return torch.view_as_real(orig_stft(*a, **k,
                                                return_complex=True))
        return orig_stft(*a, **k)

    monkeypatch.setattr(torch, "stft", _stft_compat)
    ref_losses = import_reference("models.avocodo.losses")
    ref_pqmf = import_reference("models.avocodo.avocodo.pqmf")
    RefAdamP = import_reference("optim.adamp").AdamP
    optim_g = RefAdamP(tm.parameters(), **OPT_KW)
    optim_d = RefAdamP(tdisc.parameters(), **OPT_KW)
    mel = ref_losses.MelLoss(24000, 1e-5, MEL_KW["n_fft"],
                             MEL_KW["num_mels"], trainer.model.hop_length,
                             MEL_KW["win_size"])

    g_before = {n: p.detach().clone() for n, p in tm.named_parameters()}
    d_before = {n: p.detach().clone() for n, p in tdisc.named_parameters()}

    # ---- reference flow (wrapper.py:224-266; see step-order note above) --
    wav_r = torch.from_numpy(wav)
    pqmf_lv1 = ref_pqmf.PQMF(*PQMF_CONFIG["lv1"])
    pqmf_lv2 = ref_pqmf.PQMF(*PQMF_CONFIG["lv2"])
    ys_r = [pqmf_lv2.analysis(wav_r)[:, :1], pqmf_lv1.analysis(wav_r)[:, :1],
            wav_r]
    wav_gs, _nr, loss_vq = tm(wav_r, return_list=True)
    logits_g, fmaps_g = tdisc(wav_gs)
    logits_r, fmaps_r = tdisc([y.detach() for y in ys_r])

    loss_d = ref_losses.discriminator_loss_lsgan(logits_g, logits_r)
    optim_d.zero_grad()
    loss_d.backward(inputs=list(tdisc.parameters()), retain_graph=True)
    ref_d_grads = {n: p.grad.detach().clone()
                   for n, p in tdisc.named_parameters()}

    loss_dict = dict(mel(wav_gs[-1], wav_r))
    loss_dict.update(ref_losses.feature_loss(fmaps_g, fmaps_r))
    loss_dict.update(ref_losses.generator_loss_lsgan(logits_g))
    total = sum(WEIGHTS[k] * loss_dict[k] for k in WEIGHTS) \
        + WEIGHT_OTHERS * loss_vq
    optim_g.zero_grad()
    total.backward()
    ref_g_grads = {n: p.grad.detach().clone()
                   for n, p in tm.named_parameters() if p.grad is not None}
    # restore the pre-G-backward D grads (the reference steps optim_d
    # before the G backward, so its D update never sees this pollution)
    for n, p in tdisc.named_parameters():
        p.grad = ref_d_grads[n].clone()
    optim_d.step()
    optim_g.step()

    # ---- our step (one compiled program) ---------------------------------
    aux = jax.jit(trainer.compute_grads)(state, jnp.asarray(wav),
                                         jax.random.PRNGKey(0))
    new_state, metrics = jax.jit(trainer.train_step)(
        state, jnp.asarray(wav), jax.random.PRNGKey(0))

    # 1. losses
    for key in WEIGHTS:
        _close(float(aux["losses"][key]), float(loss_dict[key]), 1e-4,
               f"loss/{key}")
    _close(float(aux["loss_vq"]), float(loss_vq), 1e-4, "loss/vq")
    _close(float(aux["d_loss"]), float(loss_d), 1e-4, "loss/d")
    _close(float(aux["g_total"]), float(total), 1e-4, "loss/g_total")

    # 2. per-parameter gradients + global norms
    def check_grads(tree, name_fn, ref_grads, tag):
        ours_sq, ref_sq = 0.0, 0.0
        gmax = max(float(np.abs(ref_grads[name_fn(p)].numpy()).max())
                   for p in leaf_paths(tree))
        for path, leaf in zip(leaf_paths(tree), jax.tree.leaves(tree)):
            ref = ref_grads[name_fn(path)].numpy()
            _close(leaf, ref, 2e-3, f"{tag} grad {path}",
                   denom_floor=1e-3 * gmax)
            ours_sq += float(jnp.sum(jnp.square(leaf)))
            ref_sq += float((ref ** 2).sum())
        _close(np.sqrt(ours_sq), np.sqrt(ref_sq), 2e-3,
               f"{tag} grad global norm")

    def gname(path):
        if path.startswith("encoder/"):
            return "encoder." + _hil_enc_torch_name(path[len("encoder/"):])
        return "decoder." + _avo_dec_torch_name(path[len("decoder/"):],
                                                tm.decoder)

    check_grads(aux["g_grads"], gname, ref_g_grads, "G")
    check_grads(aux["d_grads"], _disc_torch_name, ref_d_grads, "D")

    # 3. parameter deltas after one AdamP step both sides.
    # At step 1, Adam's elementwise update is g/(|g|+eps) ~= sign(g) —
    # discontinuous at g=0. Entries whose gradient magnitude sits at the
    # cross-framework fp-noise level (~1e-5 x leaf max here, gradients
    # agree to 2e-3 w/ 1e-3*gmax floor above) get an fp-UNDEFINED update
    # sign, so we mask them out of the delta comparison (their |delta| is
    # still bounded by step_size either way) and compare the rest.
    def check_deltas(old_tree, new_tree, name_fn, before, module,
                     ref_grads, tag):
        after = {n: p.detach() for n, p in module.named_parameters()}
        for path, old, new in zip(leaf_paths(old_tree),
                                  jax.tree.leaves(old_tree),
                                  jax.tree.leaves(new_tree)):
            tname = name_fn(path)
            ref_delta = (after[tname] - before[tname]).numpy()
            g = ref_grads[tname].numpy()
            keep = np.abs(g) > 1e-4 * max(np.abs(g).max(), 1e-12)
            ours = (np.asarray(new) - np.asarray(old))[keep]
            _close(ours, ref_delta[keep], 2e-3, f"{tag} delta {path}")

    check_deltas(state.params_g, new_state.params_g, gname, g_before, tm,
                 ref_g_grads, "G")
    check_deltas(state.params_d, new_state.params_d, _disc_torch_name,
                 d_before, tdisc, ref_d_grads, "D")

    # 4. EMA-VQ advance
    for i in range(VQ_KW["num_quantizers"]):
        layer = tm.quantizer.layers[i]
        _close(new_state.vq_state["ema_num"][i], layer.ema_num.numpy(),
               1e-4, f"vq ema_num[{i}]")
        _close(new_state.vq_state["embed"][i], layer.embed.numpy(),
               1e-4, f"vq embed[{i}]")
