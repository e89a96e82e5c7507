import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.parallel.mesh import (assert_replicas_consistent,
                                        data_parallel_mesh, process_mean,
                                        replicate, shard_batch)


def test_mesh_and_placement():
    mesh = data_parallel_mesh()
    assert mesh.shape["dp"] == 8
    batch = {"wav": np.zeros((16, 1, 100), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert len(sharded["wav"].addressable_shards) == 8
    assert sharded["wav"].addressable_shards[0].data.shape == (2, 1, 100)

    params = {"w": np.ones((4, 4), np.float32)}
    rep = replicate(mesh, params)
    assert_replicas_consistent(rep)  # replicated => identical shards


def test_process_mean_single_host():
    assert process_mean(3.5, weight=2.0) == 3.5


def test_consistency_detects_divergence():
    mesh = data_parallel_mesh()
    # a sharded (non-replicated) array has different shards -> must raise
    from jax.sharding import NamedSharding, PartitionSpec as P
    x = jax.device_put(jnp.arange(16.0).reshape(8, 2),
                       NamedSharding(mesh, P("dp")))
    with pytest.raises(AssertionError):
        assert_replicas_consistent({"x": x})
