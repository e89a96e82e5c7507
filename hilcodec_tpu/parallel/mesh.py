"""Mesh construction + multi-host helpers.

Replaces the reference's NCCL process-group plumbing (train.py:41-61,
train_torchrun.py:42-55; full collective site list in SURVEY.md §2.11):
one JAX process per host drives all local chips; data parallelism is a 1-D
mesh with `psum` collectives inside the compiled step; host-side logging
reductions use process allgather.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices: Optional[Sequence] = None,
                       axis: str = "dp") -> Mesh:
    """1-D mesh over all (local by default) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a host batch with the leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_streams(mesh: Mesh, wav=None, cache=None, tokens=None,
                  axis: str = "dp"):
    """Place streaming-serving tensors over the mesh for SPMD inference.

    Concurrent streams scale across chips by sharding the stream (batch)
    dimension: wav [B, 1, T] and every cache tensor [B, C, L] shard their
    leading axis; token arrays [n_q, B, T'] shard axis 1 (the reference's
    token layout, test_onnx.py:97-100). Params stay replicated (use
    `replicate`). The jitted `encode_stream`/`decode_stream` then compile
    to fully-parallel per-chip programs with no collectives — streaming
    serving is embarrassingly parallel over streams.

    Returns the same structure(s), device-placed; any of wav/cache/tokens
    may be None.
    """
    batch_sh = NamedSharding(mesh, P(axis))
    token_sh = NamedSharding(mesh, P(None, axis))
    out = []
    if wav is not None:
        out.append(jax.device_put(wav, batch_sh))
    if cache is not None:
        out.append(jax.tree.map(lambda x: jax.device_put(x, batch_sh),
                                cache))
    if tokens is not None:
        out.append(jax.device_put(tokens, token_sh))
    return out[0] if len(out) == 1 else tuple(out)


def process_mean(value: float, weight: float = 1.0) -> float:
    """Cross-host weighted mean for logging/metric reductions
    (dist.reduce(dst=0) analogue, metrics.py:137)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    arr = np.asarray([value * weight, weight], np.float64)
    summed = multihost_utils.process_allgather(arr).sum(axis=0)
    return float(summed[0] / max(summed[1], 1e-12))


def assert_replicas_consistent(tree, rtol: float = 1e-6,
                               atol: float = 1e-7) -> None:
    """Replica-divergence check (wrapper.py:306-314): every addressable
    shard of every leaf must hold identical values."""
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        shards = getattr(leaf, "addressable_shards", None)
        if not shards or len(shards) < 2:
            continue
        first = np.asarray(shards[0].data)
        for s in shards[1:]:
            np.testing.assert_allclose(
                first, np.asarray(s.data), rtol=rtol, atol=atol,
                err_msg=f"replica divergence at {kp}")
