"""Streaming codec server: N concurrent client streams share ONE resident
compiled frame step over a fixed slot batch on the chip.

The reference's deployment unit is one ONNX session per stream per CPU core
(/root/reference/test_onnx.py); the TPU-native unit is the batched frame
program (128 streams ~ 1712x real-time on one v5e, BASELINE.md), so serving
means multiplexing client streams onto batch rows — see
hilcodec_tpu/serve/engine.py for the slot/mask design.

Usage:
  python serve.py -c CONFIG [--ckpt CKPT] [--port P] [--slots S]
                  [--mode roundtrip|encode|decode] [-n N_QUANTIZERS]

Drive it with scripts/serve_load.py (load generator + latency report).
"""

import argparse
import asyncio


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=0,
                   help="0 = pick a free port (printed at startup)")
    p.add_argument("--slots", type=int, default=16)
    p.add_argument("--mode", default="roundtrip",
                   choices=["roundtrip", "encode", "decode"])
    p.add_argument("-n", "--num_quantizers", type=int, default=None)
    p.add_argument("--gather-ms", type=float, default=0.0,
                   help="micro-batch window: wait this many ms after the "
                        "first pending frame so more slots join each tick")
    p.add_argument("--mesh", action="store_true",
                   help="shard the slot axis over all local devices "
                        "(slots must divide the device count)")
    ns = p.parse_args()

    # startup progress is the difference between "compiling" and "crashed":
    # round-4's chip window was lost to a silent pre-"serving" hang, so dump
    # all thread stacks to stderr every 120 s until the server is up
    import faulthandler
    faulthandler.dump_traceback_later(120, repeat=True)

    import jax

    # persistent compile cache: a cold start of the full init + slot
    # program otherwise costs minutes of tiny-op compiles (bench.py does
    # the same; the cache is shared)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/hilcodec_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from hilcodec_tpu.models.registry import build_codec_model
    from hilcodec_tpu.serve import SlotEngine, serve_forever
    from hilcodec_tpu.utils.hparams import load_config

    hps = load_config(ns.config)
    model = build_codec_model(hps.get("model", "hilcodec"),
                              hps.model_kwargs.to_dict())
    # init is hundreds of tiny ops — on the TPU backend each costs its own
    # XLA compile (measured: ~2 min of startup); the host CPU backend does
    # it in seconds and the weights move to device on first use
    with jax.default_device(jax.devices("cpu")[0]):
        params, vq_state = model.init(jax.random.PRNGKey(0))
    vq_state = dict(vq_state)
    if ns.ckpt:
        from hilcodec_tpu.train.loop import build_trainer
        from hilcodec_tpu.utils.checkpoint import load_checkpoint
        trainer = build_trainer(hps)
        state, _ = load_checkpoint(
            ns.ckpt, trainer.init_state(jax.random.PRNGKey(0)))
        params, vq_state = state.params_g, dict(state.vq_state)
    else:
        import jax.numpy as jnp
        vq_state["embed"] = jax.random.normal(
            jax.random.PRNGKey(1), vq_state["embed"].shape, jnp.float32)
        print("WARNING: no --ckpt given — serving UNTRAINED random weights "
              "(latency/throughput bench mode; audio output is garbage)",
              flush=True)

    mesh = None
    if ns.mesh:
        from hilcodec_tpu.parallel.mesh import data_parallel_mesh
        mesh = data_parallel_mesh()
    print(f"building {ns.slots}-slot engine (mode={ns.mode})...", flush=True)
    engine = SlotEngine(model, params, vq_state, slots=ns.slots,
                        n=ns.num_quantizers, mode=ns.mode, mesh=mesh)
    print("compiling slot program (warmup tick)...", flush=True)
    dt = engine.warmup()
    print(f"warmup done in {dt:.1f}s", flush=True)
    faulthandler.cancel_dump_traceback_later()
    asyncio.run(serve_forever(engine, hps.data.sampling_rate,
                              ns.host, ns.port, gather_ms=ns.gather_ms))


if __name__ == "__main__":
    main()
