"""Time the full GAN train step on-chip, f32 vs bf16 mixed precision.

Usage: python scripts/bench_train_step.py [bf16|f32] [batch]
Prints one JSON line {dtype, batch, ms_per_step, audio_s_per_s}.
"""
import dataclasses
import json
import sys

sys.path.insert(0, ".")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "f32"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hilcodec_tpu.train.loop import build_trainer
    from hilcodec_tpu.utils.hparams import load_config

    hps = load_config("configs/hilcodec_speech_synth.yaml")
    trainer = build_trainer(hps)
    if which == "bf16":
        trainer = dataclasses.replace(trainer,
                                      compute_dtype=jnp.bfloat16)
    state = trainer.init_state(jax.random.PRNGKey(0))
    seg = hps.train.get("segment_size", 24000)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, 1, seg)).astype(np.float32) * 0.1)
    step = jax.jit(trainer.train_step, donate_argnums=(0,))
    state, m = step(state, wav, jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss/freq"])
    reps = 10
    t0 = time.perf_counter()
    for i in range(reps):
        state, m = step(state, wav, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(m["loss/freq"])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "dtype": which, "batch": batch,
        "ms_per_step": round(dt * 1e3, 1),
        "audio_s_per_s": round(batch * seg / 24000 / dt, 1),
        "finite": float(m["finite"]),
        "freq": float(m["loss/freq"]),
    }))


if __name__ == "__main__":
    main()
