"""Optimizers + schedulers: math parity against hand-computed references."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hilcodec_tpu.train.optim import (SAM, AdamP, RAdam, SGDP,
                                      apply_updates, make_group_fn,
                                      make_optimizer)
from hilcodec_tpu.train.schedulers import (CosineAnnealingWarmup,
                                           CosineAnnealingWarmupRestarts,
                                           EmptyScheduler, ReduceLROnPlateau,
                                           make_scheduler)


def _np_adamp_step(p, g, m, v, step, lr, betas, eps, wd, delta, wd_ratio):
    """Numpy restatement of optim/adamp.py:73-131 (one step, one tensor)."""
    b1, b2 = betas
    bc1 = 1 - b1 ** step
    bc2 = 1 - b2 ** step
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    denom = np.sqrt(v) / math.sqrt(bc2) + eps
    perturb = m / denom
    wd_r = 1.0
    if p.ndim > 1:
        def cos(a, b, view):
            a2, b2_ = a.reshape(*view), b.reshape(*view)
            num = (a2 * b2_).sum(1)
            den = np.maximum(np.linalg.norm(a2, axis=1)
                             * np.linalg.norm(b2_, axis=1), eps)
            return np.abs(num / den)

        ch_view = (p.shape[0], -1)
        ly_view = (1, -1)
        d_ch = p.reshape(*ch_view).shape[1]
        d_ly = p.size
        expand = (-1,) + (1,) * (p.ndim - 1)

        def project(pp, pert, view):
            p2 = pp.reshape(*view)
            norm = np.linalg.norm(p2, axis=1).reshape(expand if view[0] != 1
                                                      else (1,) * p.ndim)
            p_n = pp / (norm + eps)
            dot = (p_n * pert).reshape(*view).sum(1).reshape(
                expand if view[0] != 1 else (1,) * p.ndim)
            return pert - p_n * dot

        if cos(g, p, ch_view).max() < delta / math.sqrt(d_ch):
            perturb = project(p, perturb, ch_view)
            wd_r = wd_ratio
        elif cos(g, p, ly_view).max() < delta / math.sqrt(d_ly):
            perturb = project(p, perturb, ly_view)
            wd_r = wd_ratio
    new_p = p * (1 - lr * wd * wd_r) - lr / bc1 * perturb
    return new_p, m, v


@pytest.mark.parametrize("shape", [(6,), (4, 3), (4, 3, 5)])
def test_adamp_matches_reference_math(shape, rng):
    lr, betas, eps, wd = 5e-4, (0.5, 0.9), 1e-8, 1e-5
    delta, wd_ratio = 0.1, 0.1
    opt = AdamP(betas=betas, eps=eps, weight_decay=wd, delta=delta,
                wd_ratio=wd_ratio)
    p = rng.standard_normal(shape).astype(np.float32)
    params = {"w": jnp.asarray(p)}
    state = opt.init(params)
    for step in range(1, 4):
        g = rng.standard_normal(shape).astype(np.float32) * 0.1
        upd, state = opt.update({"w": jnp.asarray(g)}, state, params,
                                jnp.asarray(lr))
        params = apply_updates(params, upd)
        # numpy reference
        if step == 1:
            m_ref = np.zeros(shape, np.float32)
            v_ref = np.zeros(shape, np.float32)
        p, m_ref, v_ref = _np_adamp_step(p, g, m_ref, v_ref, step, lr,
                                         betas, eps, wd, delta, wd_ratio)
        np.testing.assert_allclose(np.asarray(params["w"]), p, rtol=2e-4,
                                   atol=1e-6)


def test_sgdp_and_radam_run(rng):
    for opt in (SGDP(momentum=0.9, weight_decay=1e-4),
                RAdam(weight_decay=1e-4)):
        params = {"w": jnp.asarray(rng.standard_normal((4, 3)),
                                   jnp.float32)}
        state = opt.init(params)
        for _ in range(3):
            g = {"w": jnp.asarray(rng.standard_normal((4, 3)),
                                  jnp.float32)}
            upd, state = opt.update(g, state, params, jnp.asarray(1e-3))
            params = apply_updates(params, upd)
        assert np.isfinite(np.asarray(params["w"])).all()


def test_sam_two_phase(rng):
    base = AdamP()
    sam = SAM(base=base, rho=0.05)
    params = {"w": jnp.ones((4,))}
    state = sam.init(params)
    g = {"w": jnp.asarray(rng.standard_normal(4), jnp.float32)}
    e_w, state = sam.first_step(g, params, state)
    norm = float(jnp.linalg.norm(jax.tree.leaves(e_w)[0]))
    np.testing.assert_allclose(norm, 0.05, rtol=1e-4)  # ||e_w|| == rho
    upd, state = sam.second_step(g, state, params, jnp.asarray(1e-3))
    assert np.isfinite(np.asarray(upd["w"])).all()


def test_group_fn_regex():
    fn = make_group_fn([
        {"regex_list": ["weight_v$", "/v$"], "project_channel": True},
        {"regex_list": ["bias"], "weight_decay": 0.0},
    ])
    assert fn("encoder/conv_pre/v") == {"project_channel": True}
    assert fn("disc/post/bias") == {"weight_decay": 0.0}
    assert fn("encoder/conv_pre/g") == {}


def test_scheduler_shapes():
    s = CosineAnnealingWarmup(warmup_iterations=100, T_max=50, eta_min=1e-6)
    # warmup ramp
    np.testing.assert_allclose(float(s(1.0, 0, 0)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(s(1.0, 49, 0)), 0.5, rtol=1e-5)
    # cosine after warmup
    np.testing.assert_allclose(float(s(1.0, 100, 0)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(s(1.0, 100, 50)), 1e-6, rtol=1e-3)
    mid = float(s(1.0, 100, 25))
    np.testing.assert_allclose(mid, (1 + 1e-6) / 2, rtol=1e-4)


def test_restarts_scheduler():
    s = CosineAnnealingWarmupRestarts(first_cycle_steps=10, max_lr=1.0,
                                      min_lr=0.1, warmup_steps=2)
    v0 = float(s(1.0, 0, 0))
    v_peak = float(s(1.0, 0, 2))
    v_end = float(s(1.0, 0, 9))
    v_restart = float(s(1.0, 0, 12))
    assert v0 < v_peak
    assert v_end < v_peak
    assert v_restart == pytest.approx(v_peak, rel=1e-4)


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(factor=0.5, patience=1)
    st = s.init_state()
    st = s.update(st, 1.0)   # best
    st = s.update(st, 1.0)   # bad 1
    st = s.update(st, 1.0)   # bad 2 -> decay
    assert st["scale"] == 0.5
    # the plateau multiplier rides TrainState.lr_scale; __call__ passes
    # the base LR through untouched
    assert float(s(1.0, 0, 0)) == 1.0
    assert float(s(1.0, 0, 0)) * st["scale"] == 0.5


def test_make_scheduler_factory():
    assert isinstance(make_scheduler(None, {}, 100), EmptyScheduler)
    s = make_scheduler("CosineAnnealingWarmup",
                       {"warmup_iterations": 10, "eta_min": 1e-6}, 150)
    assert s.T_max == 150
