"""Determinism + end-to-end checkpoint->inference roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_train_step import tiny_trainer


@pytest.mark.slow
def test_train_steps_bit_deterministic(rng):
    """Same seeds => bit-identical state after 2 steps (the reference's
    determinism levers, SURVEY.md §5.2, hold by construction here —
    verified)."""
    wav = (rng.standard_normal((2, 1, 8 * 128)) * 0.3).astype(np.float32)

    def run():
        tr = tiny_trainer()
        st = tr.init_state(jax.random.PRNGKey(0))
        step = jax.jit(tr.train_step)
        for i in range(2):
            st, _ = step(st, jnp.asarray(wav), jax.random.PRNGKey(i))
        return st

    a, b = run(), run()
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_checkpoint_to_inference_roundtrip(tmp_path, rng):
    """Save a train checkpoint, reload it, fold params, and verify the
    streaming tokens match the unfolded offline tokens (the deploy path
    end to end)."""
    from hilcodec_tpu.utils.checkpoint import (load_checkpoint,
                                               save_checkpoint)

    tr = tiny_trainer()
    state = tr.init_state(jax.random.PRNGKey(0))
    wav = (rng.standard_normal((2, 1, 8 * 128)) * 0.3).astype(np.float32)
    step = jax.jit(tr.train_step)
    state, _ = step(state, jnp.asarray(wav), jax.random.PRNGKey(1))

    path = save_checkpoint(str(tmp_path), 1, state)
    template = tr.init_state(jax.random.PRNGKey(0))
    restored, _ = load_checkpoint(path, template)

    model = tr.model
    params, vq_state = restored.params_g, dict(restored.vq_state)
    tok_raw = np.asarray(model.encode(params, vq_state,
                                      jnp.asarray(wav[:1])))
    folded = model.fold_params(params)
    cache_enc, _ = model.init_cache(1)
    tok_st, _ = model.encode_stream(folded, vq_state,
                                    jnp.asarray(wav[:1]), cache_enc)
    match = (tok_raw == np.asarray(tok_st)).mean()
    assert match > 0.98, match
