import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.ops.shape_gain import (ResidualShapeGainVQ,
                                         ShapeGainCodebook)


def test_shape_gain_quantize_reconstruction(rng):
    cb = ShapeGainCodebook(dim=8, shape_codebook_size=16,
                           gain_codebook_size=4)
    state = cb.init_state(jax.random.PRNGKey(0))
    x = rng.standard_normal((32, 8)).astype(np.float32)
    q, s_ind, g_ind, g_t = cb.quantize(jnp.asarray(x), state)
    assert q.shape == (32, 8)
    # quantize = exp(gain) * shape, with shape rows from the codebook
    shape_q = np.asarray(state["shape"])[np.asarray(s_ind)]
    gain_q = np.exp(np.asarray(state["gain"])[np.asarray(g_ind)])
    np.testing.assert_allclose(np.asarray(q), gain_q[:, None] * shape_q,
                               rtol=1e-5)


def test_shape_gain_train_step_updates(rng):
    cb = ShapeGainCodebook(dim=8, shape_codebook_size=16,
                           gain_codebook_size=4, decay=0.5,
                           ema_num_threshold=0.5, ema_num_initial=0.5)
    state = cb.init_state(jax.random.PRNGKey(0))
    x = (rng.standard_normal((64, 8)) * 2).astype(np.float32)
    q, new_state, nr_s, nr_g = cb.train_step(jnp.asarray(x), state,
                                             jax.random.PRNGKey(1))
    # shape codebook stays unit-norm
    norms = np.linalg.norm(np.asarray(new_state["shape"]), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    assert not np.allclose(np.asarray(state["gain"]),
                           np.asarray(new_state["gain"]))


def test_residual_shape_gain_vq(rng):
    rvq = ResidualShapeGainVQ(dim=8, num_quantizers=3,
                              shape_codebook_size=16, gain_codebook_size=4)
    state = rvq.init_state(jax.random.PRNGKey(0))
    x = rng.standard_normal((2, 8, 10)).astype(np.float32)  # [B, C, T]
    q, new_state, loss, replaces = rvq(jnp.asarray(x), state,
                                       jax.random.PRNGKey(1))
    assert q.shape == x.shape
    assert float(loss) >= 0
    assert replaces.shape == (3,)
    # eval mode leaves state unchanged
    q2, st2, _, _ = rvq(jnp.asarray(x), state, jax.random.PRNGKey(1),
                        training=False)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
