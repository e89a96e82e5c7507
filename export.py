"""Export a trained checkpoint to deployment artifacts.

The reference's export notebook (scripts/HILCodec Onnx.ipynb) remaps the
training state dict into the streaming module tree, removes weight norm,
merges scalings, and dumps per-stage ONNX graphs + zero-cache .npz files.
Here the equivalent is a pure pytree transform:

  * `{name}_deploy.npz`   — folded inference parameters (weight-norm
                            removed, scale/normalization constants merged;
                            streaming.py:740-747 semantics) + RVQ codebooks
  * `{name}_cache_enc.npz` / `{name}_cache_dec.npz`
                          — zero streaming caches in the reference's
                            e_in{i}/d_in{i} layout (onnx/hil_*_cache_*.npz)

With `--stablehlo` it additionally serializes the compiled one-dispatch
streaming programs themselves (weights baked in, like the reference's
ONNX graphs) via `jax.export` — the TPU-native counterpart of
`onnx/hil_*_enc/dec.onnx`:

  * `{name}_enc.stablehlo` — (wav[B,1,F*hop], cache) -> (tokens, cache)
  * `{name}_dec.stablehlo` — (tokens[n_q,B,F], cache) -> (wav, cache)

Artifacts are exported for both 'tpu' and 'cpu' platforms; any jax
process can `jax.export.deserialize(blob).call(...)` them without the
model code or config (`tests/test_export.py` roundtrips this).

Usage: python export.py -c CONFIG --ckpt logs/run/00150.ckpt.npz -o hil
"""

import argparse
import os

import numpy as np


def export_stablehlo(model, params, vq_state, output, streams=1, frames=1,
                     platforms=("tpu", "cpu")):
    """Serialize the per-dispatch streaming enc/dec programs (folded
    params and codebooks baked in as constants) as portable StableHLO.
    Returns {path: n_bytes}."""
    import jax
    import jax.numpy as jnp

    hop = model.hop_length
    n_q = model.vq.num_quantizers

    def enc_step(wav, cache_enc):
        return model.encode_stream(params, vq_state, wav, cache_enc,
                                   frames_per_step=frames,
                                   megakernel=False, stream_chunks=1)

    def dec_step(tokens, cache_dec):
        return model.decode_stream(params, vq_state, tokens, cache_dec,
                                   frames_per_step=frames,
                                   megakernel=False, stream_chunks=1)

    cache_enc, cache_dec = model.init_cache(streams)
    wav_spec = jax.ShapeDtypeStruct((streams, 1, frames * hop), jnp.float32)
    tok_spec = jax.ShapeDtypeStruct((n_q, streams, frames), jnp.int32)
    spec = lambda tree: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)

    written = {}
    for name, fn, args in (
            ("enc", enc_step, (wav_spec, spec(cache_enc))),
            ("dec", dec_step, (tok_spec, spec(cache_dec)))):
        exp = jax.export.export(jax.jit(fn), platforms=list(platforms))(*args)
        blob = exp.serialize()
        path = f"{output}_{name}.stablehlo"
        with open(path, "wb") as f:
            f.write(blob)
        written[path] = len(blob)
    return written


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("-o", "--output", default="deploy/model")
    p.add_argument("--stablehlo", action="store_true",
                   help="also serialize the streaming enc/dec programs "
                        "as portable StableHLO (jax.export)")
    p.add_argument("--streams", type=int, default=1,
                   help="batch dimension baked into the --stablehlo export")
    p.add_argument("--frames", type=int, default=1,
                   help="frames per dispatch in the --stablehlo export")
    ns = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hilcodec_tpu.models.registry import build_codec_model
    from hilcodec_tpu.utils.checkpoint import _flatten, load_checkpoint
    from hilcodec_tpu.utils.hparams import load_config

    hps = load_config(ns.config)
    model = build_codec_model(hps.get("model", "hilcodec"),
                        hps.model_kwargs.to_dict())

    params, vq_state = model.init(jax.random.PRNGKey(0))
    if ns.ckpt:
        from hilcodec_tpu.train.loop import build_trainer
        trainer = build_trainer(hps)
        state, _ = load_checkpoint(
            ns.ckpt, trainer.init_state(jax.random.PRNGKey(0)))
        params, vq_state = state.params_g, state.vq_state
    if hasattr(model, "fold_params"):
        params = model.fold_params(params)

    os.makedirs(os.path.dirname(ns.output) or ".", exist_ok=True)
    flat = _flatten(params)
    flat["codebooks"] = np.asarray(vq_state["embed"])
    with open(f"{ns.output}_deploy.npz", "wb") as f:
        np.savez_compressed(f, **flat)

    cache_enc, cache_dec = model.init_cache(1)
    np.savez(f"{ns.output}_cache_enc.npz",
             **{f"e_in{i}": np.asarray(c) for i, c in enumerate(cache_enc)})
    np.savez(f"{ns.output}_cache_dec.npz",
             **{f"d_in{i}": np.asarray(c) for i, c in enumerate(cache_dec)})

    n_enc = sum(int(np.prod(c.shape)) for c in cache_enc)
    n_dec = sum(int(np.prod(c.shape)) for c in cache_dec)
    print(f"wrote {ns.output}_deploy.npz ({len(flat)} tensors), "
          f"cache_enc ({len(cache_enc)} tensors / {n_enc} f32), "
          f"cache_dec ({len(cache_dec)} tensors / {n_dec} f32)")

    if ns.stablehlo:
        written = export_stablehlo(model, params, vq_state, ns.output,
                                   streams=ns.streams, frames=ns.frames)
        for path, n in written.items():
            print(f"wrote {path} ({n / 1e6:.1f} MB serialized StableHLO, "
                  f"streams={ns.streams}, frames={ns.frames})")


if __name__ == "__main__":
    main()
