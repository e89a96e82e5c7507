"""Training CLI: ``python train.py -n NAME -c CONFIG [-p a.b=v ...] [-f]``.

Reference entry points train.py / train_torchrun.py collapse into one: a
single JAX process drives every local TPU chip via shard_map (no mp.spawn,
no process groups); multi-host runs use `jax.distributed.initialize` from
env and the same code path.
"""

import os

from hilcodec_tpu.utils.hparams import get_hparams


def main():
    hps, ns = get_hparams()
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax
        jax.distributed.initialize()

    import jax
    try:  # persistent compile cache: the GAN step is a multi-minute compile
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/hilcodec_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from hilcodec_tpu.train.loop import TrainLoop
    loop = TrainLoop(hps, run_dir=hps.model_dir)
    loop.init_or_resume()
    loop.run()


if __name__ == "__main__":
    main()
