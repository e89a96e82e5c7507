"""Full GAN training-step parity against the reference torch pipeline.

VERDICT round-2 item 1: the forward graphs are proven against the
reference's own modules (test_torch_model_parity.py); this test certifies
the *training* semantics on top of them. One full step — same transplanted
weights, same batch — through the reference flow
(models/hilcodec/wrapper.py:222-292: model fwd -> discs -> MelLoss + FM +
G losses -> Balancer.backward -> AdamP step; D loss backward -> AdamP
step) and through Trainer.compute_grads/train_step, asserting:

  * per-loss values (freq, {mfbd,mstftd}_{g,fm}, vq, d)      <= 1e-4 rel
  * the balancer's EMA norms (balancer.py:125-151)           <= 1e-4 rel
  * per-parameter G and D gradients (leaf-by-leaf via the
    transplant name maps) and their global norms             <= 2e-3 rel
  * per-parameter deltas after one AdamP step both sides
    (optim/adamp.py:36-132)                                  <= 2e-3 rel
  * the EMA-VQ state advance (ema_num / ema_embed / embed)   <= 1e-4 rel

A subtle sign or normalization slip in the balancer / FM-loss / AdamP
interaction passes every other test but fails here.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_compat import import_reference
from hilcodec_tpu.models.codec import CodecModel
from hilcodec_tpu.models.discriminators import Discriminators
from hilcodec_tpu.models.hilcodec import HILCodec
from hilcodec_tpu.models.losses import MelLoss
from hilcodec_tpu.ops.rvq import ResidualVQ
from hilcodec_tpu.train.balancer import Balancer
from hilcodec_tpu.train.optim import make_optimizer
from hilcodec_tpu.train.schedulers import EmptyScheduler
from hilcodec_tpu.train.step import Trainer
from hilcodec_tpu.utils.pytree import leaf_paths

torch = pytest.importorskip("torch")

from test_torch_model_parity import (_WN, _hil_dec_torch_name,  # noqa: E402
                                     _hil_enc_torch_name, _load,
                                     _to_torch_sd)

RES_SCALE = 0.577
# threshold 0.5 with initial 1.0: the expiry branch is active but no code
# can expire after one step (min ema_num = 0.99), so the denominator is
# plain ema_num on both sides (the reference codec-local EuclideanCodebook
# never Laplace-smooths, vector_quantize.py:171-172) and no RNG fires.
VQ_KW = dict(dim=16, codebook_size=32, num_quantizers=2, kmeans_init=False,
             decay=0.99, ema_num_threshold=0.5, ema_num_initial=1.0,
             dropout=False)
MFBD_KW = dict(periods=[1, 2], taps=16, cutoff_freqs=[0.0, 0.25],
               channels=[4, 8], kernel_sizes=[5, 5], strides=[3, 1])
MSTFTD_KW = dict(filters=4, n_ffts=[64, 128], hop_lengths=[16, 32],
                 win_lengths=[64, 128])
WEIGHTS = {"freq": 0.48, "mfbd_g": 1.1, "mfbd_fm": 1.1,
           "mstftd_g": 1.1, "mstftd_fm": 1.1}
OPT_KW = dict(lr=5e-4, betas=(0.5, 0.9), weight_decay=1e-5)


@pytest.fixture(scope="module")
def dist_group(tmp_path_factory):
    """Single-process gloo group: the reference balancer all_reduces its
    EMA-norm bucket unconditionally (balancer.py:139)."""
    import torch.distributed as dist
    if not dist.is_initialized():
        store = tmp_path_factory.mktemp("dist") / "store"
        dist.init_process_group("gloo", init_method=f"file://{store}",
                                world_size=1, rank=0)
    return dist


def _mfbd_name(path: str) -> str:
    m = re.fullmatch(r"discs/(\d+)/convs/(\d+)/(\w)", path)
    if m:
        return (f"discs.mfbd.discriminators.{m.group(1)}.convs."
                f"{m.group(2)}.{_WN[m.group(3)]}")
    m = re.fullmatch(r"discs/(\d+)/post/(\w)", path)
    if m:
        return (f"discs.mfbd.discriminators.{m.group(1)}.conv_post."
                f"{_WN[m.group(2)]}")
    raise KeyError(path)


def _mstftd_name(path: str, n_convs: int) -> str:
    m = re.fullmatch(r"discs/(\d+)/convs/(\d+)/(\w)", path)
    if not m:
        raise KeyError(path)
    i, j, leaf = m.group(1), int(m.group(2)), m.group(3)
    if j == n_convs - 1:
        return f"discs.mstftd.discriminators.{i}.conv_post.conv.{_WN[leaf]}"
    return f"discs.mstftd.discriminators.{i}.convs.{j}.conv.{_WN[leaf]}"


def _close(ours, ref, rtol, name, denom_floor=0.0):
    """Max abs error relative to the reference's max magnitude.

    `denom_floor` guards ill-conditioned comparisons: the SpecBlock
    scale_param grads are single-scalar inner products over ~65k
    cancelling terms, so their own magnitude can be orders below the
    f32 noise of the summands (verified against a float64 torch oracle:
    with a well-conditioned cotangent both sides agree to 1e-6).
    Flooring the denominator at a fraction of the tree's max gradient
    keeps the check meaningful without failing on fp cancellation."""
    a = np.asarray(ours, np.float64)
    b = np.asarray(ref, np.float64)
    denom = max(np.abs(b).max(), denom_floor, 1e-12)
    err = np.abs(a - b).max() / denom
    assert err < rtol, f"{name}: rel err {err:.3e} (tol {rtol})"


def _build_jax():
    codec = HILCodec(channels_enc=8, channels_dec=8, n_residual_enc=1,
                     n_residual_dec=1, strides=(4, 2), n_fft_base=16,
                     vq_dim=16, res_scale_enc=RES_SCALE,
                     res_scale_dec=RES_SCALE)
    model = CodecModel(codec, ResidualVQ(**VQ_KW))
    disc = Discriminators(mfbd_kwargs=dict(MFBD_KW, use=True),
                          mstftd_kwargs=dict(MSTFTD_KW, use=True))
    opt_g, lr_g = make_optimizer("AdamP", dict(OPT_KW))
    opt_d, lr_d = make_optimizer("AdamP", dict(OPT_KW))
    balancer = Balancer(weights=tuple(WEIGHTS.items()), weight_others=0.01,
                        ema_decay=0.99)
    return Trainer(model=model, disc=disc,
                   mel_loss=MelLoss(24000, 1e-5, True, 80),
                   balancer=balancer, optim_g=opt_g, optim_d=opt_d,
                   sched_g=EmptyScheduler(), sched_d=EmptyScheduler(),
                   lr_g=lr_g, lr_d=lr_d, use_lsgan=False,
                   use_normalized_fm=True, axis_name=None)


def _build_torch(state):
    """Reference HILCodec + Discriminators with the JAX state transplanted."""
    models = import_reference("models.hilcodec.models")
    discs = import_reference("models.hilcodec.discriminators")
    tm = models.HILCodec(
        sample_rate=24000, channels_enc=8, channels_dec=8, n_fft_base=16,
        n_residual_enc=1, n_residual_dec=1, res_scale_enc=RES_SCALE,
        res_scale_dec=RES_SCALE, strides=[4, 2],
        # models.py defaults spec_compression to "" while the shipped
        # configs (and our HILCodec default) use "log" — pin it
        spec_compression="log", vq_kwargs=dict(VQ_KW))
    sd = {}
    for path, leaf in zip(leaf_paths(state.params_g["encoder"]),
                          jax.tree.leaves(state.params_g["encoder"])):
        sd["encoder." + _hil_enc_torch_name(path)] = torch.from_numpy(
            np.asarray(leaf).copy())
    for path, leaf in zip(leaf_paths(state.params_g["decoder"]),
                          jax.tree.leaves(state.params_g["decoder"])):
        sd["decoder." + _hil_dec_torch_name(path, tm.decoder)] = \
            torch.from_numpy(np.asarray(leaf).copy())
    for i in range(VQ_KW["num_quantizers"]):
        for k in ("embed", "ema_embed"):
            sd[f"quantizer.layers.{i}.{k}"] = torch.from_numpy(
                np.asarray(state.vq_state[k][i]).copy())
        sd[f"quantizer.layers.{i}.ema_num"] = torch.from_numpy(
            np.asarray(state.vq_state["ema_num"][i]).copy())
    _load(tm, sd, allowed_missing=("spec.weight", "_extra_state"))

    tdisc = discs.Discriminators(mfbd_kwargs=dict(MFBD_KW, use=True),
                                 mstftd_kwargs=dict(MSTFTD_KW, use=True))
    dsd = _to_torch_sd(state.params_d["mfbd"], _mfbd_name)
    n_convs = len(state.params_d["mstftd"]["discs"][0]["convs"])
    dsd.update(_to_torch_sd(state.params_d["mstftd"],
                            lambda p: _mstftd_name(p, n_convs)))
    _load(tdisc, dsd,
          allowed_missing=("pqmf_filter", "spec_transform.window"))
    return tm, tdisc


def _torch_gname(path: str, tdec) -> str:
    if path.startswith("encoder/"):
        return "encoder." + _hil_enc_torch_name(path[len("encoder/"):])
    return "decoder." + _hil_dec_torch_name(path[len("decoder/"):], tdec)


def _torch_dname(path: str, n_convs: int) -> str:
    if path.startswith("mfbd/"):
        return _mfbd_name(path[len("mfbd/"):])
    return _mstftd_name(path[len("mstftd/"):], n_convs)


def _warm_scales(params_g):
    """Replace the zero-init residual/spec scale params with nonzero values.

    At exact zero-init the decoder emits near-silence, so the mel power
    sits at the clip_val clamp kink where two equally-valid f32
    computations (framed-matmul DFT vs torch.stft) land on different
    sides, making gradient comparisons ill-conditioned (verified against
    a float64 torch oracle: away from the kink both sides agree to 1e-5).
    Nonzero scales also make every SpecBlock/res-scale branch LIVE in the
    forward, so this step exercises strictly more of the graph."""
    def walk(node):
        if isinstance(node, dict):
            return {k: (jnp.full_like(v, 0.2)
                        if k in ("scale_param", "res_scale_param")
                        else walk(v))
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params_g)


@pytest.mark.slow
def test_full_train_step_parity(dist_group, rng):
    trainer = _build_jax()
    state = trainer.init_state(jax.random.PRNGKey(11))
    state = state._replace(params_g=_warm_scales(state.params_g))
    tm, tdisc = _build_torch(state)
    tm.train()
    tdisc.train()

    ref_losses = import_reference("models.hilcodec.losses")
    RefBalancer = import_reference("models.hilcodec.balancer").Balancer
    RefAdamP = import_reference("optim.adamp").AdamP
    from torch.cuda.amp import GradScaler
    sg = GradScaler(enabled=False)
    sd_ = GradScaler(enabled=False)
    bal = RefBalancer(weights=dict(WEIGHTS), others=["d", "vq"],
                      weight_others=0.01, world_size=1, scaler_g=sg,
                      scaler_d=sd_, ema_decay=0.99)
    bal.initialize(device="cpu")
    mel = ref_losses.MelLoss(24000, 1.0e-5, True, 80)
    optim_g = RefAdamP(tm.parameters(), **OPT_KW)
    optim_d = RefAdamP(tdisc.parameters(), **OPT_KW)

    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 256)) * 0.3).astype(np.float32)

    g_before = {n: p.detach().clone() for n, p in tm.named_parameters()}
    d_before = {n: p.detach().clone() for n, p in tdisc.named_parameters()}

    # ---- reference step (wrapper.py:222-292, fp32, scalers disabled) ------
    wav_r = torch.from_numpy(wav)
    wav_g, _num_rep, loss_vq = tm(wav_r)
    logits_g, fmaps_g = tdisc(wav_g)
    logits_r, fmaps_r = tdisc(wav_r)
    loss_dict = mel(wav_g, wav_r)
    loss_dict.update(ref_losses.feature_loss_normalized(fmaps_g, fmaps_r))
    loss_dict.update(ref_losses.generator_loss(logits_g))
    optim_g.zero_grad()
    assert bal.backward(loss_dict, wav_g, loss_vq)
    ref_g_grads = {n: p.grad.detach().clone()
                   for n, p in tm.named_parameters() if p.grad is not None}
    optim_g.step()
    loss_d = ref_losses.discriminator_loss(logits_g, logits_r)
    optim_d.zero_grad()
    loss_d.backward(inputs=list(tdisc.parameters()))
    ref_d_grads = {n: p.grad.detach().clone()
                   for n, p in tdisc.named_parameters()}
    optim_d.step()

    # ---- our step (one compiled program) ----------------------------------
    aux = jax.jit(trainer.compute_grads)(state, jnp.asarray(wav),
                                         jax.random.PRNGKey(0))
    new_state, metrics = jax.jit(trainer.train_step)(
        state, jnp.asarray(wav), jax.random.PRNGKey(0))
    assert float(metrics["finite"]) == 1.0

    # ---- 1. per-loss values ----------------------------------------------
    for key in WEIGHTS:
        _close(float(aux["losses"][key]), float(loss_dict[key]), 1e-4,
               f"loss/{key}")
    _close(float(aux["loss_vq"]), float(loss_vq), 1e-4, "loss/vq")
    _close(float(aux["d_loss"]), float(loss_d), 1e-4, "loss/d")

    # ---- 2. balancer EMA norms -------------------------------------------
    for i, key in enumerate(WEIGHTS):
        _close(float(new_state.balancer["ema_norms"][i]),
               float(bal.ema_norms[key]), 1e-4, f"ema_norm/{key}")
    _close(float(new_state.balancer["ema_fix"]), bal.ema_fix, 1e-6,
           "ema_fix")

    # ---- 3. per-parameter gradients + global norms ------------------------
    def check_grads(tree, name_fn, ref_grads, tag):
        ours_sq, ref_sq = 0.0, 0.0
        gmax = max(float(np.abs(ref_grads[name_fn(p)].numpy()).max())
                   for p in leaf_paths(tree))
        for path, leaf in zip(leaf_paths(tree), jax.tree.leaves(tree)):
            tname = name_fn(path)
            ref = ref_grads[tname].numpy()
            _close(leaf, ref, 2e-3, f"{tag} grad {path}",
                   denom_floor=1e-3 * gmax)
            ours_sq += float(jnp.sum(jnp.square(leaf)))
            ref_sq += float((ref_grads[tname] ** 2).sum())
        _close(np.sqrt(ours_sq), np.sqrt(ref_sq), 2e-3,
               f"{tag} grad global norm")

    n_convs = len(state.params_d["mstftd"]["discs"][0]["convs"])
    check_grads(aux["g_grads"], lambda p: _torch_gname(p, tm.decoder),
                ref_g_grads, "G")
    check_grads(aux["d_grads"], lambda p: _torch_dname(p, n_convs),
                ref_d_grads, "D")

    # ---- 4. parameter deltas after one AdamP step -------------------------
    def check_deltas(old_tree, new_tree, name_fn, before, module, tag):
        after = {n: p.detach() for n, p in module.named_parameters()}
        for path, old, new in zip(leaf_paths(old_tree),
                                  jax.tree.leaves(old_tree),
                                  jax.tree.leaves(new_tree)):
            tname = name_fn(path)
            ref_delta = (after[tname] - before[tname]).numpy()
            _close(np.asarray(new) - np.asarray(old), ref_delta, 2e-3,
                   f"{tag} delta {path}")

    check_deltas(state.params_g, new_state.params_g,
                 lambda p: _torch_gname(p, tm.decoder), g_before, tm, "G")
    check_deltas(state.params_d, new_state.params_d,
                 lambda p: _torch_dname(p, n_convs), d_before, tdisc, "D")

    # ---- 5. EMA-VQ state advance -----------------------------------------
    for i in range(VQ_KW["num_quantizers"]):
        layer = tm.quantizer.layers[i]
        _close(new_state.vq_state["ema_num"][i], layer.ema_num.numpy(),
               1e-4, f"vq ema_num[{i}]")
        _close(new_state.vq_state["ema_embed"][i], layer.ema_embed.numpy(),
               1e-4, f"vq ema_embed[{i}]")
        _close(new_state.vq_state["embed"][i], layer.embed.numpy(),
               1e-4, f"vq embed[{i}]")
