"""Debug the avocodo train-step delta mismatch on one encoder leaf.

Prints grad magnitude/conditioning and delta errors for every G leaf so we
can tell fp-noise amplification (tiny grad -> Adam-normalized delta noise)
from a systematic AdamP/projection divergence.
"""
import sys
sys.path.insert(0, "tests")

import numpy as np
import jax
import jax.numpy as jnp
import torch

from reference_compat import import_reference
from hilcodec_tpu.utils.pytree import leaf_paths
import test_avocodo_torch_parity as T


def main():
    trainer = T._build_jax()
    state = trainer.init_state(jax.random.PRNGKey(7))
    from test_train_parity import _warm_scales
    state = state._replace(params_g=_warm_scales(state.params_g))
    vq_state = dict(state.vq_state)
    vq_state["embed"] = jax.random.normal(
        jax.random.PRNGKey(5), vq_state["embed"].shape, jnp.float32) * 0.5
    vq_state["ema_embed"] = vq_state["embed"] * T.VQ_KW["ema_num_initial"]
    state = state._replace(vq_state=vq_state)
    tm = T._build_torch_gen(state)
    tdisc = T._build_torch_disc(state)
    rng = np.random.default_rng(3)
    hop = trainer.model.hop_length
    wav = (rng.standard_normal((2, 1, hop * 64)) * 0.3).astype(np.float32)

    tm.train()
    tdisc.train()
    orig_stft = torch.stft

    def _stft_compat(*a, **k):
        if "return_complex" not in k:
            return torch.view_as_real(orig_stft(*a, **k,
                                                return_complex=True))
        return orig_stft(*a, **k)

    torch.stft = _stft_compat
    ref_losses = import_reference("models.avocodo.losses")
    ref_pqmf = import_reference("models.avocodo.avocodo.pqmf")
    RefAdamP = import_reference("optim.adamp").AdamP
    optim_g = RefAdamP(tm.parameters(), **T.OPT_KW)
    mel = ref_losses.MelLoss(24000, 1e-5, T.MEL_KW["n_fft"],
                             T.MEL_KW["num_mels"], trainer.model.hop_length,
                             T.MEL_KW["win_size"])
    g_before = {n: p.detach().clone() for n, p in tm.named_parameters()}

    wav_r = torch.from_numpy(wav)
    pqmf_lv1 = ref_pqmf.PQMF(*T.PQMF_CONFIG["lv1"])
    pqmf_lv2 = ref_pqmf.PQMF(*T.PQMF_CONFIG["lv2"])
    ys_r = [pqmf_lv2.analysis(wav_r)[:, :1],
            pqmf_lv1.analysis(wav_r)[:, :1], wav_r]
    wav_gs, _nr, loss_vq = tm(wav_r, return_list=True)
    logits_g, fmaps_g = tdisc(wav_gs)
    logits_r, fmaps_r = tdisc([y.detach() for y in ys_r])
    loss_dict = dict(mel(wav_gs[-1], wav_r))
    loss_dict.update(ref_losses.feature_loss(fmaps_g, fmaps_r))
    loss_dict.update(ref_losses.generator_loss_lsgan(logits_g))
    total = sum(T.WEIGHTS[k] * loss_dict[k] for k in T.WEIGHTS) \
        + T.WEIGHT_OTHERS * loss_vq
    optim_g.zero_grad()
    total.backward()
    ref_g_grads = {n: p.grad.detach().clone()
                   for n, p in tm.named_parameters() if p.grad is not None}
    optim_g.step()

    aux = jax.jit(trainer.compute_grads)(state, jnp.asarray(wav),
                                         jax.random.PRNGKey(0))
    new_state, _ = jax.jit(trainer.train_step)(
        state, jnp.asarray(wav), jax.random.PRNGKey(0))

    def gname(path):
        if path.startswith("encoder/"):
            return "encoder." + T._hil_enc_torch_name(
                path[len("encoder/"):])
        return "decoder." + T._avo_dec_torch_name(
            path[len("decoder/"):], tm.decoder)

    after = {n: p.detach() for n, p in tm.named_parameters()}
    gmax = max(float(g.abs().max()) for g in ref_g_grads.values())
    print(f"gmax = {gmax:.4e}")
    rows = []
    for path, old, new, gleaf in zip(
            leaf_paths(state.params_g),
            jax.tree.leaves(state.params_g),
            jax.tree.leaves(new_state.params_g),
            jax.tree.leaves(aux["g_grads"])):
        tname = gname(path)
        rg = ref_g_grads[tname].numpy()
        ours_d = np.asarray(new, np.float64) - np.asarray(old, np.float64)
        ref_d = (after[tname] - g_before[tname]).numpy().astype(np.float64)
        grel = np.abs(np.asarray(gleaf, np.float64) - rg).max() \
            / max(np.abs(rg).max(), 1e-12)
        drel = np.abs(ours_d - ref_d).max() / max(np.abs(ref_d).max(),
                                                  1e-12)
        rows.append((drel, grel, float(np.abs(rg).max()) / gmax, path))
    probe_projection(trainer, state, aux, ref_g_grads, gname)
    rows.sort(reverse=True)
    print(f"{'delta_rel':>10} {'grad_rel':>10} {'g/gmax':>10}  path")
    for drel, grel, gratio, path in rows[:15]:
        print(f"{drel:10.3e} {grel:10.3e} {gratio:10.3e}  {path}")




def probe_projection(trainer, state, aux, ref_g_grads, gname):
    """Print the AdamP channel/layer projection margins for each leaf."""
    import math
    delta = 0.1
    for path, leaf, gleaf in zip(leaf_paths(state.params_g),
                                 jax.tree.leaves(state.params_g),
                                 jax.tree.leaves(aux["g_grads"])):
        if "stages/3/blocks/0/blocks/1/pointwise/v" not in path:
            continue
        p = np.asarray(leaf, np.float64)
        g_ours = np.asarray(gleaf, np.float64)
        g_ref = ref_g_grads[gname(path)].numpy().astype(np.float64)
        for tag, g in (("ours", g_ours), ("ref", g_ref)):
            pc = p.reshape(p.shape[0], -1)
            gc = g.reshape(p.shape[0], -1)
            cos_c = np.abs((pc * gc).sum(1)) / (
                np.linalg.norm(pc, axis=1) * np.linalg.norm(gc, axis=1)
                + 1e-30)
            thr_c = delta / math.sqrt(pc.shape[1])
            pl = p.reshape(1, -1)
            gl = g.reshape(1, -1)
            cos_l = np.abs((pl * gl).sum(1)) / (
                np.linalg.norm(pl) * np.linalg.norm(gl) + 1e-30)
            thr_l = delta / math.sqrt(pl.shape[1])
            print(f"{tag}: chan max={cos_c.max():.8e} thr={thr_c:.8e} "
                  f"project={cos_c.max() < thr_c}; layer "
                  f"max={cos_l.max():.8e} thr={thr_l:.8e} "
                  f"project={cos_l.max() < thr_l}")
if __name__ == "__main__":
    main()
