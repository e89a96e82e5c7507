"""Cross-framework model-level parity: transplant JAX param pytrees into the
reference's own PyTorch graphs and assert output parity.

This is the test the per-op oracles can't replace: it catches a wrong
SpecBlock mean/std, L2Norm eps, stage-scale placement, or ELU/pad subtlety
at assembled-model scale. Reference graphs under test:
  * models/hilcodec/modules/seanet.py:249-479  (batch encoder/decoder)
  * models/hilcodec/streaming.py:25-752        (cache-explicit streaming)
  * models/encodec/modules/seanet.py:66-243    (EnCodec SEANet + LSTM)
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_compat import import_reference
from hilcodec_tpu.utils.pytree import leaf_paths

torch = pytest.importorskip("torch")

# tiny-but-structured shared config (2 stages, 2 resblock dilations)
TINY = dict(n_filters=8, n_fft_base=16, n_residual_layers=1, ratios=[4, 2],
            kernel_size=5, last_kernel_size=5, residual_kernel_size=5,
            dilation_base=1, skip="identity", act_all=False, bias=True,
            res_scale=0.577)
SPEC_MEANS = (-4.5, -4.3, -4.0)
SPEC_STDS = (2.8, 2.9, 3.0)

_WN = {"v": "weight_v", "g": "weight_g", "b": "bias"}


def _to_torch_sd(params, name_fn):
    """JAX tree -> torch state-dict via a path->torch-name function."""
    sd = {}
    for path, leaf in zip(leaf_paths(params), jax.tree.leaves(params)):
        sd[name_fn(path)] = torch.from_numpy(np.asarray(leaf).copy())
    return sd


def _load(tmodel, sd, allowed_missing=("spec.weight",)):
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    for m in missing:
        assert any(m.endswith(suf) for suf in allowed_missing), m


# ---------------------------------------------------------------------------
# HILCodec batch graphs (modules/seanet.py)
# ---------------------------------------------------------------------------

def _hil_enc_torch_name(path: str) -> str:
    """JAX Encoder param path -> reference SEANetEncoder param name."""
    m = re.fullmatch(r"conv_pre/(\w)", path)
    if m:
        return f"conv_pre.1.conv.conv.{_WN[m.group(1)]}"
    m = re.fullmatch(r"stages/(\d+)/spec/layer/(\w)", path)
    if m:
        return f"spec_blocks.{m.group(1)}.layer.conv.conv.{_WN[m.group(2)]}"
    m = re.fullmatch(r"stages/(\d+)/spec/scale_param", path)
    if m:
        return f"spec_blocks.{m.group(1)}.scale_param"
    m = re.fullmatch(r"stages/(\d+)/blocks/(\d+)/res_scale_param", path)
    if m:
        return f"blocks.{m.group(1)}.{m.group(2)}.res_scale_param"
    m = re.fullmatch(
        r"stages/(\d+)/blocks/(\d+)/blocks/(\d+)/(pointwise|depthwise)/(\w)",
        path)
    if m:
        i, j, k, kind, leaf = m.groups()
        idx = 3 * int(k) + (1 if kind == "pointwise" else 2)
        return f"blocks.{i}.{j}.block.{idx}.conv.conv.{_WN[leaf]}"
    m = re.fullmatch(r"stages/(\d+)/down_(pw|dw)/(\w)", path)
    if m:
        i, kind, leaf = m.groups()
        idx = 2 if kind == "pw" else 3
        return f"downsample.{i}.{idx}.conv.conv.{_WN[leaf]}"
    m = re.fullmatch(r"spec_post/layer/(\w)", path)
    if m:
        return f"spec_post.layer.conv.conv.{_WN[m.group(1)]}"
    if path == "spec_post/scale_param":
        return "spec_post.scale_param"
    m = re.fullmatch(r"post_(dw|pw)/(\w)", path)
    if m:
        idx = 1 if m.group(1) == "dw" else 2
        return f"conv_post.{idx}.conv.conv.{_WN[m.group(2)]}"
    raise KeyError(path)


def _hil_dec_torch_name(path: str, tdec) -> str:
    """JAX Decoder param path -> reference SEANetDecoder `model.N` name.
    Module indices are read off the instantiated torch Sequential (they
    depend on act_all/n_residual), not hardcoded."""
    keys = list(tdec.state_dict().keys())
    convtr_idx = sorted({int(m.group(1)) for k in keys
                         if (m := re.match(r"model\.(\d+)\.convtr", k))})
    res_idx = sorted({int(m.group(1)) for k in keys
                      if (m := re.match(r"model\.(\d+)\.res_scale_param",
                                        k))})
    conv_idx = sorted({int(m.group(1)) for k in keys
                       if (m := re.match(r"model\.(\d+)\.conv\.conv", k))})
    n_stages = len(convtr_idx)
    n_res = len(res_idx) // n_stages
    res_by_stage = [res_idx[i * n_res:(i + 1) * n_res]
                    for i in range(n_stages)]

    m = re.fullmatch(r"pre_pw/(\w)", path)
    if m:
        return f"model.{conv_idx[0]}.conv.conv.{_WN[m.group(1)]}"
    m = re.fullmatch(r"pre_dw/(\w)", path)
    if m:
        return f"model.{conv_idx[1]}.conv.conv.{_WN[m.group(1)]}"
    m = re.fullmatch(r"conv_post/(\w)", path)
    if m:
        return f"model.{conv_idx[-1]}.conv.conv.{_WN[m.group(1)]}"
    m = re.fullmatch(r"stages/(\d+)/up_dw/(\w)", path)
    if m:
        return (f"model.{convtr_idx[int(m.group(1))]}.convtr.convtr."
                f"{_WN[m.group(2)]}")
    m = re.fullmatch(r"stages/(\d+)/up_pw/(\w)", path)
    if m:
        return (f"model.{convtr_idx[int(m.group(1))] + 1}.conv.conv."
                f"{_WN[m.group(2)]}")
    m = re.fullmatch(r"stages/(\d+)/blocks/(\d+)/res_scale_param", path)
    if m:
        return f"model.{res_by_stage[int(m.group(1))][int(m.group(2))]}" \
               f".res_scale_param"
    m = re.fullmatch(
        r"stages/(\d+)/blocks/(\d+)/blocks/(\d+)/(pointwise|depthwise)/(\w)",
        path)
    if m:
        i, j, k, kind, leaf = m.groups()
        base = res_by_stage[int(i)][int(j)]
        idx = 3 * int(k) + (1 if kind == "pointwise" else 2)
        return f"model.{base}.block.{idx}.conv.conv.{_WN[leaf]}"
    raise KeyError(path)


def _jax_encoder(dimension=16):
    from hilcodec_tpu.models.hilcodec import Encoder
    return Encoder(channels=1, dimension=dimension,
                   n_filters=TINY["n_filters"], n_fft_base=TINY["n_fft_base"],
                   n_residual_layers=TINY["n_residual_layers"],
                   ratios=tuple(TINY["ratios"]),
                   kernel_size=TINY["kernel_size"],
                   last_kernel_size=TINY["last_kernel_size"],
                   residual_kernel_size=TINY["residual_kernel_size"],
                   dilation_base=TINY["dilation_base"], skip=TINY["skip"],
                   act_all=TINY["act_all"], l2norm=True, bias=True,
                   spec="stft", spec_compression="log",
                   res_scale=TINY["res_scale"], spec_means=SPEC_MEANS,
                   spec_stds=SPEC_STDS)


def _torch_encoder(dimension=16):
    seanet = import_reference("models.hilcodec.modules.seanet")
    return seanet.SEANetEncoder(
        channels=1, dimension=dimension, causal=True, l2norm=True,
        spec="stft", spec_compression="log",
        spec_means=list(SPEC_MEANS), spec_stds=list(SPEC_STDS), **TINY)


def test_hilcodec_encoder_batch_parity(rng):
    enc = _jax_encoder()
    params = enc.init(jax.random.PRNGKey(3))
    tenc = _torch_encoder()
    _load(tenc, _to_torch_sd(params, _hil_enc_torch_name))
    tenc.eval()

    x = (rng.standard_normal((2, 1, 512)) * 0.3).astype(np.float32)
    ours = np.asarray(enc.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = tenc(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_hilcodec_decoder_batch_parity(rng):
    from hilcodec_tpu.models.hilcodec import Decoder
    dec = Decoder(channels=1, dimension=16, n_filters=TINY["n_filters"],
                  n_residual_layers=TINY["n_residual_layers"],
                  ratios=tuple(TINY["ratios"]),
                  kernel_size=TINY["kernel_size"],
                  last_kernel_size=TINY["last_kernel_size"],
                  residual_kernel_size=TINY["residual_kernel_size"],
                  dilation_base=TINY["dilation_base"], skip=TINY["skip"],
                  act_all=TINY["act_all"], bias=True,
                  final_activation="Tanh", res_scale=TINY["res_scale"])
    params = dec.init(jax.random.PRNGKey(4))

    seanet = import_reference("models.hilcodec.modules.seanet")
    dec_kw = {k: v for k, v in TINY.items() if k != "n_fft_base"}
    tdec = seanet.SEANetDecoder(channels=1, dimension=16, causal=True,
                                final_activation="Tanh", **dec_kw)
    _load(tdec, _to_torch_sd(params,
                             lambda p: _hil_dec_torch_name(p, tdec)))
    tdec.eval()

    z = rng.standard_normal((2, 16, 64)).astype(np.float32)
    ours = np.asarray(dec.apply(params, jnp.asarray(z)))
    with torch.no_grad():
        ref = tdec(torch.from_numpy(z)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_hilcodec_encoder_batch_parity_fullsize(rng):
    """The shipped speech topology (64/96ch, strides [8,5,4,2], 2 enc
    resblocks) — assembled-network parity at real scale."""
    from hilcodec_tpu.models.hilcodec import Encoder
    enc = Encoder(channels=1, dimension=128, n_filters=64, n_fft_base=64,
                  n_residual_layers=2, ratios=(8, 5, 4, 2), kernel_size=5,
                  last_kernel_size=5, residual_kernel_size=5,
                  dilation_base=1, skip="identity", act_all=False,
                  l2norm=True, bias=True, spec="stft",
                  spec_compression="log", res_scale=0.5773502691896258)
    params = enc.init(jax.random.PRNGKey(5))

    seanet = import_reference("models.hilcodec.modules.seanet")
    tenc = seanet.SEANetEncoder(
        channels=1, dimension=128, n_filters=64, n_fft_base=64,
        n_residual_layers=2, ratios=[8, 5, 4, 2], kernel_size=5,
        last_kernel_size=5, residual_kernel_size=5, dilation_base=1,
        skip="identity", causal=True, act_all=False, l2norm=True,
        bias=True, spec="stft", spec_compression="log",
        res_scale=0.5773502691896258)
    _load(tenc, _to_torch_sd(params, _hil_enc_torch_name))
    tenc.eval()

    x = (rng.standard_normal((1, 1, 24000)) * 0.3).astype(np.float32)
    ours = np.asarray(enc.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = tenc(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# HILCodec streaming graph (streaming.py) — folded params + cache threading
# ---------------------------------------------------------------------------

def _fold_enc_torch_name(path: str) -> str:
    p = re.sub(r"/w$", ".weight", re.sub(r"/b$", ".bias", path))
    p = re.sub(r"stages/(\d+)/blocks/(\d+)/blocks/(\d+)/pointwise",
               r"blocks.\1.\2.block.\3.pointwise.1", p)
    p = re.sub(r"stages/(\d+)/blocks/(\d+)/blocks/(\d+)/depthwise",
               r"blocks.\1.\2.block.\3.depthwise", p)
    p = re.sub(r"stages/(\d+)/spec/layer", r"spec_blocks.\1.layer", p)
    p = re.sub(r"stages/(\d+)/down_pw", r"downsample_pointwise.\1.1", p)
    p = re.sub(r"stages/(\d+)/down_dw", r"downsample_depthwise.\1", p)
    p = p.replace("spec_post/layer", "spec_post.layer")
    p = p.replace("post_dw", "conv_post_depthwise")
    p = p.replace("post_pw", "conv_post_pointwise")
    return "encoder." + p.replace("/", ".")


def _fold_dec_torch_name(path: str) -> str:
    p = re.sub(r"/w$", ".weight", re.sub(r"/b$", ".bias", path))
    p = re.sub(r"stages/(\d+)/blocks/(\d+)/blocks/(\d+)/pointwise",
               r"blocks.\1.\2.block.\3.pointwise.1", p)
    p = re.sub(r"stages/(\d+)/blocks/(\d+)/blocks/(\d+)/depthwise",
               r"blocks.\1.\2.block.\3.depthwise", p)
    p = re.sub(r"stages/(\d+)/up_dw", r"upsample_depthwise.\1", p)
    p = re.sub(r"stages/(\d+)/up_pw", r"upsample_pointwise.\1", p)
    p = p.replace("pre_pw", "conv_pre_pointwise")
    p = p.replace("pre_dw", "conv_pre_depthwise")
    return "decoder." + p.replace("/", ".")


def test_hilcodec_streaming_parity(rng):
    """Folded JAX params transplanted into the reference cache-explicit
    streaming graph (streaming.py:25-752): frame-by-frame latents, RVQ
    tokens, and decoded wav must agree."""
    from hilcodec_tpu.models.codec import CodecModel
    from hilcodec_tpu.models.hilcodec import HILCodec
    from hilcodec_tpu.ops.rvq import ResidualVQ

    codec = HILCodec(channels_enc=TINY["n_filters"],
                     channels_dec=TINY["n_filters"],
                     n_fft_base=TINY["n_fft_base"], n_residual_enc=1,
                     n_residual_dec=1, strides=(4, 2), vq_dim=16,
                     res_scale_enc=TINY["res_scale"],
                     res_scale_dec=TINY["res_scale"])
    vq = ResidualVQ(dim=16, codebook_size=32, num_quantizers=2,
                    kmeans_init=False)
    model = CodecModel(codec, vq)
    params, vq_state = model.init(jax.random.PRNGKey(6))
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(jax.random.PRNGKey(7),
                                          vq_state["embed"].shape)
    folded = model.fold_params(params)

    st = import_reference("models.hilcodec.streaming")
    tmodel = st.HILCodec(
        channels_enc=TINY["n_filters"], channels_dec=TINY["n_filters"],
        n_fft_base=TINY["n_fft_base"], n_residual_enc=1, n_residual_dec=1,
        strides=[4, 2],
        vq_kwargs={"dim": 16, "codebook_size": 32, "num_quantizers": 2},
        res_scale_enc=TINY["res_scale"], res_scale_dec=TINY["res_scale"])
    # sets every merged flag so forward consumes folded weights
    tmodel.remove_weight_reparameterizations()

    sd = _to_torch_sd(folded["encoder"], _fold_enc_torch_name)
    sd.update(_to_torch_sd(folded["decoder"], _fold_dec_torch_name))
    embed = np.asarray(vq_state["embed"])  # [n_q, size, dim]
    for i in range(embed.shape[0]):
        e = torch.from_numpy(embed[i].copy())
        sd[f"quantizer.layers.{i}.embed"] = e
        sd[f"dequantizer.layers.{i}.embed"] = e
    # missing = intentionally-not-transplanted leaves: fixed STFT bases
    # (spec.weight), scales fused into convs by the fold (res_scale_param,
    # SpecBlock scale_param), and inference-dead EMA stats (ema_num)
    _load(tmodel, sd,
          allowed_missing=("spec.weight", "res_scale_param", ".scale_param",
                           "ema_num"))
    tmodel.eval()

    hop = codec.hop_length
    n_frames = 8
    wav = (rng.standard_normal((1, 1, hop * n_frames)) * 0.3
           ).astype(np.float32)

    # ours: scan-based streaming over the folded params
    enc_cache, dec_cache = model.init_cache(1)
    tokens, _ = model.encode_stream(folded, vq_state, jnp.asarray(wav),
                                    enc_cache)
    wav_out, _ = model.decode_stream(folded, vq_state, tokens, dec_cache)
    tokens = np.asarray(tokens)
    wav_out = np.asarray(wav_out)

    # reference: explicit per-frame cache threading (test_onnx.py loop)
    x = torch.from_numpy(wav)
    cache_e = tmodel.encoder.initialize_cache(x)
    cache_d = tmodel.decoder.initialize_cache(x)
    ref_tokens, ref_wav = [], []
    with torch.no_grad():
        for i in range(n_frames):
            frame = x[:, :, i * hop:(i + 1) * hop]
            z, cache_e = tmodel.encoder(frame, *cache_e)
            idx = tmodel.quantizer(z, 2)            # [n, B, T']
            ref_tokens.append(idx.numpy())
            q = tmodel.dequantizer(idx, 2)          # [B, T', C]
            # streaming Decoder.forward takes [B, T', C] and transposes
            # internally (streaming.py:619-621)
            y, cache_d = tmodel.decoder(q, *cache_d)
            ref_wav.append(y.numpy())
    ref_tokens = np.concatenate(ref_tokens, axis=-1)
    ref_wav = np.concatenate(ref_wav, axis=-1)

    np.testing.assert_array_equal(tokens, ref_tokens)
    np.testing.assert_allclose(wav_out, ref_wav, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# EnCodec SEANet + LSTM (models/encodec/modules/seanet.py)
# ---------------------------------------------------------------------------

def _encodec_enc_torch_name(path: str, n_stages: int, n_res: int) -> str:
    per = n_res + 2
    m = re.fullmatch(r"conv_pre/(\w)", path)
    if m:
        return f"model.0.conv.conv.{_WN[m.group(1)]}"
    m = re.fullmatch(r"stages/(\d+)/blocks/(\d+)/convs/(\d+)/(\w)", path)
    if m:
        i, j, k, leaf = (int(m.group(1)), int(m.group(2)), int(m.group(3)),
                         m.group(4))
        mod = 1 + i * per + j
        return f"model.{mod}.block.{2 * k + 1}.conv.conv.{_WN[leaf]}"
    m = re.fullmatch(r"stages/(\d+)/blocks/(\d+)/shortcut/(\w)", path)
    if m:
        mod = 1 + int(m.group(1)) * per + int(m.group(2))
        return f"model.{mod}.shortcut.conv.conv.{_WN[m.group(3)]}"
    m = re.fullmatch(r"stages/(\d+)/down/(\w)", path)
    if m:
        mod = 1 + int(m.group(1)) * per + n_res + 1
        return f"model.{mod}.conv.conv.{_WN[m.group(2)]}"
    m = re.fullmatch(r"lstm/layers/(\d+)/([wb])_(ih|hh)", path)
    if m:
        mod = 1 + n_stages * per
        kind = "weight" if m.group(2) == "w" else "bias"
        return f"model.{mod}.lstm.{kind}_{m.group(3)}_l{m.group(1)}"
    m = re.fullmatch(r"conv_post/(\w)", path)
    if m:
        mod = 1 + n_stages * per + 2
        return f"model.{mod}.conv.conv.{_WN[m.group(1)]}"
    raise KeyError(path)


def _encodec_dec_torch_name(path: str, n_stages: int, n_res: int) -> str:
    per = n_res + 2
    m = re.fullmatch(r"conv_pre/(\w)", path)
    if m:
        return f"model.0.conv.conv.{_WN[m.group(1)]}"
    m = re.fullmatch(r"lstm/layers/(\d+)/([wb])_(ih|hh)", path)
    if m:
        kind = "weight" if m.group(2) == "w" else "bias"
        return f"model.1.lstm.{kind}_{m.group(3)}_l{m.group(1)}"
    m = re.fullmatch(r"stages/(\d+)/up/(\w)", path)
    if m:
        mod = 2 + int(m.group(1)) * per + 1
        return f"model.{mod}.convtr.convtr.{_WN[m.group(2)]}"
    m = re.fullmatch(r"stages/(\d+)/blocks/(\d+)/convs/(\d+)/(\w)", path)
    if m:
        i, j, k, leaf = (int(m.group(1)), int(m.group(2)), int(m.group(3)),
                         m.group(4))
        mod = 2 + i * per + 2 + j
        return f"model.{mod}.block.{2 * k + 1}.conv.conv.{_WN[leaf]}"
    m = re.fullmatch(r"stages/(\d+)/blocks/(\d+)/shortcut/(\w)", path)
    if m:
        mod = 2 + int(m.group(1)) * per + 2 + int(m.group(2))
        return f"model.{mod}.shortcut.conv.conv.{_WN[m.group(3)]}"
    m = re.fullmatch(r"conv_post/(\w)", path)
    if m:
        mod = 2 + n_stages * per + 1
        return f"model.{mod}.conv.conv.{_WN[m.group(1)]}"
    raise KeyError(path)


def test_encodec_seanet_lstm_parity(rng):
    from hilcodec_tpu.models.encodec import EncodecDecoder, EncodecEncoder
    se = import_reference("models.encodec.modules.seanet")

    kw = dict(channels=1, dimension=16, n_filters=4, n_residual_layers=1,
              ratios=[4, 2], kernel_size=7, last_kernel_size=7,
              residual_kernel_size=3, dilation_base=2, true_skip=False,
              compress=2, lstm=1)
    enc = EncodecEncoder(1, 16, 4, 1, (4, 2), "ELU", None, "weight_norm",
                         7, 7, 3, 2, False, 2, 1, "reflect")
    p_enc = enc.init(jax.random.PRNGKey(8))
    tenc = se.SEANetEncoder(causal=True, **kw)
    _load(tenc, _to_torch_sd(
        p_enc, lambda p: _encodec_enc_torch_name(p, 2, 1)))
    tenc.eval()

    dec = EncodecDecoder(1, 16, 4, 1, (4, 2), "ELU", None, "weight_norm",
                         7, 7, 3, 2, False, 2, 1, None, "reflect")
    p_dec = dec.init(jax.random.PRNGKey(9))
    tdec = se.SEANetDecoder(causal=True, **kw)
    _load(tdec, _to_torch_sd(
        p_dec, lambda p: _encodec_dec_torch_name(p, 2, 1)))
    tdec.eval()

    x = (rng.standard_normal((2, 1, 512)) * 0.3).astype(np.float32)
    ours_z = np.asarray(enc.apply(p_enc, jnp.asarray(x)))
    with torch.no_grad():
        ref_z = tenc(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours_z, ref_z, rtol=1e-4, atol=1e-5)

    ours_y = np.asarray(dec.apply(p_dec, jnp.asarray(ref_z)))
    with torch.no_grad():
        ref_y = tdec(torch.from_numpy(ref_z)).numpy()
    np.testing.assert_allclose(ours_y, ref_y, rtol=1e-4, atol=1e-5)
