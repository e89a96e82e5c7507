"""Worker for the 2-process jax.distributed smoke test (run by
tests/test_multihost.py). One process = one fake host with 2 virtual CPU
devices; the dp mesh spans all 4 devices of both processes, exercising the
exact multi-host path of train.py (jax.distributed.initialize + global mesh
+ make_array_from_process_local_data batch feeding).
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num", type=int, required=True)
    ap.add_argument("--id", type=int, required=True)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num, process_id=args.id)
    assert jax.process_count() == args.num
    assert len(jax.local_devices()) == 2
    assert jax.device_count() == 2 * args.num

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_step import tiny_trainer
    from hilcodec_tpu.train.step import make_parallel_train_step

    trainer = tiny_trainer()
    mesh = Mesh(np.array(jax.devices()), ("dp",))

    # identical seed on every process -> identical local state; replicate
    # onto the global mesh (replicated determinism replaces DDP broadcast)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep,
                                                         np.asarray(x)),
        state)

    # each process feeds ITS OWN batch shard (2 items/process, global 4)
    hop = trainer.model.hop_length
    rng = np.random.default_rng(100 + args.id)
    wav_local = (rng.standard_normal((2, 1, hop * 128)) * 0.3
                 ).astype(np.float32)
    sharding = NamedSharding(mesh, P("dp"))
    wav = jax.make_array_from_process_local_data(sharding, wav_local)

    step = make_parallel_train_step(trainer, mesh, "dp")
    for i in range(2):
        state, metrics = step(state, wav, jax.random.PRNGKey(7))
    jax.block_until_ready(state.params_g)

    assert float(metrics["finite"]) == 1.0
    assert int(np.asarray(state.iteration)) == 2
    checksum = float(sum(np.abs(np.asarray(l)).sum()
                         for l in jax.tree.leaves(state.params_g)))
    loss = float(metrics["loss/freq"])
    print(f"RESULT {checksum:.10e} {loss:.10e}", flush=True)


if __name__ == "__main__":
    main()
