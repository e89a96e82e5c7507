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

Usage: python export.py -c CONFIG --ckpt logs/run/00150.ckpt.npz -o hil
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("-o", "--output", default="deploy/model")
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


if __name__ == "__main__":
    main()
