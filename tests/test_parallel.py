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


def test_stream_sharded_serving_parity():
    """Streaming serving scale-out: sharding the stream dim over the mesh
    must be bit-identical to the single-device path (no collectives)."""
    from hilcodec_tpu.models.codec import CodecModel
    from hilcodec_tpu.models.hilcodec import HILCodec
    from hilcodec_tpu.ops.rvq import ResidualVQ
    from hilcodec_tpu.parallel.mesh import shard_streams

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

    B, hop, L = 16, model.hop_length, 6
    wav = jax.random.normal(jax.random.PRNGKey(2), (B, 1, L * hop),
                            jnp.float32) * 0.3
    ce, cd = model.init_cache(B)

    def run(wav, ce, cd):
        tokens, ce = model.encode_stream(params, vq_state, wav, ce)
        out, cd = model.decode_stream(params, vq_state, tokens, cd)
        return tokens, out

    tokens_ref, out_ref = jax.jit(run)(wav, ce, cd)

    mesh = data_parallel_mesh()
    wav_s, ce_s = shard_streams(mesh, wav=wav, cache=ce)
    cd_s = shard_streams(mesh, cache=cd)
    tokens_s, out_s = jax.jit(run)(wav_s, ce_s, cd_s)
    assert len(out_s.addressable_shards) == 8

    np.testing.assert_array_equal(np.asarray(tokens_ref),
                                  np.asarray(tokens_s))
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_s),
                               rtol=0, atol=0)
