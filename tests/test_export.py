"""export.py end-to-end: deploy npz + zero caches in the reference layout.

Reference: scripts/HILCodec Onnx.ipynb -> onnx/hil_speech_cache_{enc,dec}.npz
(22 tensors / 32,511 f32 enc; 30 / 43,968 dec for the shipped speech
topology — BASELINE.md "Streaming state per stream").
"""
import os
import runpy
import sys

import numpy as np


def test_export_cli_writes_reference_cache_layout(tmp_path, monkeypatch):
    out = str(tmp_path / "hil")
    monkeypatch.setattr(sys, "argv", [
        "export.py", "-c", "configs/hilcodec_speech_synth.yaml",
        "-o", out])
    runpy.run_path("export.py", run_name="__main__")

    deploy = np.load(out + "_deploy.npz")
    assert "codebooks" in deploy
    # folded params: no weight-norm {v,g} pairs survive the fold
    assert not any(k.endswith("/v") and k[:-2] + "/g" in deploy.files
                   for k in deploy.files)

    enc = np.load(out + "_cache_enc.npz")
    dec = np.load(out + "_cache_dec.npz")
    assert list(enc.files) == [f"e_in{i}" for i in range(len(enc.files))]
    assert list(dec.files) == [f"d_in{i}" for i in range(len(dec.files))]
    n_enc = sum(int(np.prod(enc[k].shape)) for k in enc.files)
    n_dec = sum(int(np.prod(dec[k].shape)) for k in dec.files)
    # the reference onnx/hil_speech_* layout, exactly
    assert (len(enc.files), n_enc) == (22, 32511)
    assert (len(dec.files), n_dec) == (30, 43968)
    assert all(not enc[k].any() for k in enc.files)
    assert os.path.getsize(out + "_deploy.npz") > 10_000


def test_stablehlo_export_roundtrip(tmp_path):
    """`export_stablehlo` serializes the per-dispatch streaming programs
    (reference onnx/hil_*_enc/dec.onnx role) and the artifact alone —
    deserialized with no model code — reproduces the live model's tokens
    and wav bit-exactly, with the cache carry intact across dispatches."""
    import importlib.util

    import jax
    import jax.numpy as jnp

    from hilcodec_tpu.models.codec import CodecModel
    from hilcodec_tpu.models.hilcodec import HILCodec
    from hilcodec_tpu.ops.rvq import ResidualVQ

    spec = importlib.util.spec_from_file_location("export_cli", "export.py")
    export_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(export_cli)

    model = CodecModel(
        HILCodec(channels_enc=8, channels_dec=8, n_residual_enc=1,
                 n_residual_dec=1, strides=(4, 2), res_scale_enc=0.577,
                 res_scale_dec=0.577, vq_dim=8),
        ResidualVQ(dim=8, codebook_size=16, num_quantizers=2,
                   kmeans_init=False))
    params, vq_state = model.init(jax.random.PRNGKey(0))
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(
        jax.random.PRNGKey(1), vq_state["embed"].shape, jnp.float32)
    params = model.fold_params(params)

    out = str(tmp_path / "tiny")
    written = export_cli.export_stablehlo(
        model, params, vq_state, out, streams=2, frames=1,
        platforms=("tpu", "cpu"))
    assert set(written) == {out + "_enc.stablehlo", out + "_dec.stablehlo"}
    assert all(n > 1000 for n in written.values())

    enc = jax.export.deserialize(
        open(out + "_enc.stablehlo", "rb").read())
    dec = jax.export.deserialize(
        open(out + "_dec.stablehlo", "rb").read())

    # compare against the jitted live step (same compiled math; the eager
    # op-by-op path can differ in the last float bit on CPU)
    live_enc = jax.jit(lambda w, c: model.encode_stream(
        params, vq_state, w, c, frames_per_step=1, megakernel=False,
        stream_chunks=1))
    live_dec = jax.jit(lambda t, c: model.decode_stream(
        params, vq_state, t, c, frames_per_step=1, megakernel=False,
        stream_chunks=1))

    hop = model.hop_length
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 1, 3 * hop)) * 0.3,
                      jnp.float32)
    ce, cd = model.init_cache(2)
    ce_live, cd_live = model.init_cache(2)
    for f in range(3):
        frame = wav[:, :, f * hop:(f + 1) * hop]
        tok, ce = enc.call(frame, ce)
        wav_out, cd = dec.call(tok, cd)
        tok_live, ce_live = live_enc(frame, ce_live)
        wav_live, cd_live = live_dec(tok_live, cd_live)
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(tok_live))
        np.testing.assert_array_equal(np.asarray(wav_out),
                                      np.asarray(wav_live))


def test_export_cli_avocodo_family(tmp_path, monkeypatch):
    """export.py works for the avocodo family via build_codec_model
    (previously crashed: the bare AvocodoModel has no (params, vq_state)
    init)."""
    out = str(tmp_path / "avo")
    monkeypatch.setattr(sys, "argv", [
        "export.py", "-c", "configs/avocodo_synth.yaml", "-o", out])
    runpy.run_path("export.py", run_name="__main__")
    enc = np.load(out + "_cache_enc.npz")
    dec = np.load(out + "_cache_dec.npz")
    deploy = np.load(out + "_deploy.npz")
    assert "codebooks" in deploy
    assert len(enc.files) and len(dec.files)
    assert all(not enc[k].any() for k in enc.files)
