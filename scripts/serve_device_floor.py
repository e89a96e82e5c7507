"""Device-side slot-tick floor: what one SlotEngine tick costs ON THE CHIP,
separated from this environment's host<->device tunnel round trip.

Runs the compiled 128-slot roundtrip step back-to-back K times feeding the
cache outputs forward (exactly the serving dependency chain) with fresh
int16 inputs, syncing once at the end — the per-tick quotient is the
pipelined device floor a host-attached deployment would see, the serving
analogue of bench.py's in-scan number and r03's "pipelined dispatch
0.96-1.18 ms/frame".

Usage: python scripts/serve_device_floor.py [slots] [ticks]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    slots = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/hilcodec_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    from hilcodec_tpu.models.registry import build_codec_model
    from hilcodec_tpu.serve import SlotEngine
    from hilcodec_tpu.utils.hparams import load_config
    import jax.numpy as jnp

    hps = load_config("configs/hilcodec_speech.yaml")
    model = build_codec_model("hilcodec", hps.model_kwargs.to_dict())
    with jax.default_device(jax.devices("cpu")[0]):
        params, vq_state = model.init(jax.random.PRNGKey(0))
    vq_state = dict(vq_state)
    vq_state["embed"] = jax.random.normal(
        jax.random.PRNGKey(1), vq_state["embed"].shape, jnp.float32)

    eng = SlotEngine(model, params, vq_state, slots=slots, mode="roundtrip")
    print(f"warmup: {eng.warmup():.1f}s", flush=True)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((slots, 1, eng.hop)) * 3000).astype(np.int16)
    on = np.ones(slots, bool)
    off = np.zeros(slots, bool)
    xj, onj, offj = jnp.asarray(x), jnp.asarray(on), jnp.asarray(off)

    # back-to-back: only the cache chain serializes; uploads/step dispatch
    # pipeline. One final fetch syncs everything.
    ce, cd = eng._cache_enc, eng._cache_dec
    packed, ce, cd = eng._step(xj, onj, offj, ce, cd)  # warm data path
    t0 = time.perf_counter()
    for _ in range(ticks):
        packed, ce, cd = eng._step(xj, onj, offj, ce, cd)
    np.asarray(packed)
    dt = time.perf_counter() - t0
    per_tick_ms = dt / ticks * 1e3
    audio_ms = eng.hop / hps.data.sampling_rate * 1e3
    print(f"device tick floor: {per_tick_ms:.3f} ms/tick "
          f"({slots} slots, {audio_ms:.2f} ms audio/frame) -> "
          f"{slots * audio_ms / per_tick_ms:.1f}x aggregate real-time "
          f"serving capacity per chip", flush=True)


if __name__ == "__main__":
    main()
