"""Optimizers: AdamP / SGDP / RAdam / SAM as functional (optax-style)
gradient transformations, plus regex-partitioned per-parameter groups.

Reference: optim/adamp.py (the shipped optimizer), optim/sgdp.py,
optim/radam.py, optim/sam.py, optim/__init__.py:18-148 (param groups).

All transforms follow the optax protocol:
  init(params) -> state
  update(grads, state, params, lr) -> (updates, state)
with `updates` to be *added* to params. The learning rate is passed per step
(the schedulers in schedulers.py produce it), so one compiled train step
serves the whole schedule.
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.pytree import leaf_paths as _leaf_paths


Params = Any
Grads = Any


def _channel_cos(g: jnp.ndarray, p: jnp.ndarray, eps: float) -> jnp.ndarray:
    """|cosine| per output channel (dim-0 rows), AdamP's channel view."""
    g2 = g.reshape(g.shape[0], -1)
    p2 = p.reshape(p.shape[0], -1)
    num = jnp.sum(g2 * p2, axis=1)
    den = jnp.maximum(jnp.linalg.norm(g2, axis=1)
                      * jnp.linalg.norm(p2, axis=1), eps)
    return jnp.abs(num / den)


def _layer_cos(g: jnp.ndarray, p: jnp.ndarray, eps: float) -> jnp.ndarray:
    g2 = g.reshape(1, -1)
    p2 = p.reshape(1, -1)
    num = jnp.sum(g2 * p2, axis=1)
    den = jnp.maximum(jnp.linalg.norm(g2, axis=1)
                      * jnp.linalg.norm(p2, axis=1), eps)
    return jnp.abs(num / den)


def _project_channel(p: jnp.ndarray, perturb: jnp.ndarray,
                     eps: float) -> jnp.ndarray:
    """Remove the component of `perturb` parallel to p, per dim-0 row
    (adamp.py:17-23)."""
    expand = (-1,) + (1,) * (p.ndim - 1)
    norm = jnp.linalg.norm(p.reshape(p.shape[0], -1), axis=1).reshape(expand)
    p_n = p / (norm + eps)
    dot = jnp.sum((p_n * perturb).reshape(p.shape[0], -1),
                  axis=1).reshape(expand)
    return perturb - p_n * dot


def _project_layer(p: jnp.ndarray, perturb: jnp.ndarray,
                   eps: float) -> jnp.ndarray:
    norm = jnp.linalg.norm(p.reshape(1, -1), axis=1)
    p_n = p / (norm + eps)
    dot = jnp.sum(p_n * perturb)
    return perturb - p_n * dot


def _adamp_projection(p: jnp.ndarray, grad: jnp.ndarray,
                      perturb: jnp.ndarray, delta: float, wd_ratio: float,
                      eps: float, project_channel: bool
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale-invariance projection with the cosine-sim gate
    (adamp.py:57-71, 115-123). Data-dependent branches become selects."""
    if project_channel:
        return _project_channel(p, perturb, eps), jnp.asarray(wd_ratio)
    if p.ndim <= 1:
        return perturb, jnp.asarray(1.0)
    d_ch = p.reshape(p.shape[0], -1).shape[1]
    d_ly = p.size
    ch_gate = jnp.max(_channel_cos(grad, p, eps)) < delta / math.sqrt(d_ch)
    ly_gate = jnp.max(_layer_cos(grad, p, eps)) < delta / math.sqrt(d_ly)
    proj_ch = _project_channel(p, perturb, eps)
    proj_ly = _project_layer(p, perturb, eps)
    out = jnp.where(ch_gate, proj_ch, jnp.where(ly_gate, proj_ly, perturb))
    wd = jnp.where(ch_gate | ly_gate, wd_ratio, 1.0)
    return out, wd


class AdamPState(NamedTuple):
    step: jnp.ndarray
    exp_avg: Params
    exp_avg_sq: Params


@dataclasses.dataclass(frozen=True)
class AdamP:
    """AdamP (adamp.py:36-132): Adam whose update is projected off the
    radial direction for scale-invariant weights, with damped weight decay.

    `group_fn(path) -> dict` optionally overrides per-leaf hyperparams
    (the regex param-group mechanism); overridable keys: project_channel,
    weight_decay, lr_scale.
    """
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.0
    delta: float = 0.1
    wd_ratio: float = 0.1
    nesterov: bool = False
    group_fn: Optional[Callable[[str], Dict[str, Any]]] = None

    def init(self, params: Params) -> AdamPState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamPState(jnp.zeros((), jnp.int32), zeros,
                          jax.tree.map(jnp.zeros_like, params))

    def update(self, grads: Grads, state: AdamPState, params: Params,
               lr: jnp.ndarray) -> Tuple[Params, AdamPState]:
        b1, b2 = self.betas
        step = state.step + 1
        bc1 = 1 - b1 ** step.astype(jnp.float32)
        bc2 = 1 - b2 ** step.astype(jnp.float32)

        new_m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                             state.exp_avg, grads)
        new_v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                             state.exp_avg_sq, grads)

        paths = _leaf_paths(params)

        def leaf(path, p, g, m, v):
            opts = self.group_fn(path) if self.group_fn else {}
            project_channel = opts.get("project_channel", False)
            weight_decay = opts.get("weight_decay", self.weight_decay)
            lr_leaf = lr * opts.get("lr_scale", 1.0)
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + self.eps
            if self.nesterov:
                perturb = (b1 * m + (1 - b1) * g) / denom
            else:
                perturb = m / denom
            perturb, wd = _adamp_projection(p, g, perturb, self.delta,
                                            self.wd_ratio, self.eps,
                                            project_channel)
            update = -lr_leaf / bc1 * perturb
            if weight_decay > 0:
                # p *= (1 - lr*wd_decay*wd_ratio), expressed additively
                update = update - lr_leaf * weight_decay * wd * p
            return update

        updates = _tree_map_with_path(leaf, paths, params, grads, new_m,
                                      new_v)
        return updates, AdamPState(step, new_m, new_v)


class SGDPState(NamedTuple):
    momentum: Params


@dataclasses.dataclass(frozen=True)
class SGDP:
    """SGD + AdamP projection (sgdp.py)."""
    momentum: float = 0.0
    dampening: float = 0.0
    weight_decay: float = 0.0
    delta: float = 0.1
    wd_ratio: float = 0.1
    nesterov: bool = False
    eps: float = 1e-8
    group_fn: Optional[Callable[[str], Dict[str, Any]]] = None

    def init(self, params: Params) -> SGDPState:
        return SGDPState(jax.tree.map(jnp.zeros_like, params))

    def update(self, grads: Grads, state: SGDPState, params: Params,
               lr: jnp.ndarray) -> Tuple[Params, SGDPState]:
        mu, damp = self.momentum, self.dampening
        new_buf = jax.tree.map(lambda b, g: mu * b + (1 - damp) * g,
                               state.momentum, grads)
        paths = _leaf_paths(params)

        def leaf(path, p, g, buf):
            opts = self.group_fn(path) if self.group_fn else {}
            weight_decay = opts.get("weight_decay", self.weight_decay)
            lr_leaf = lr * opts.get("lr_scale", 1.0)
            d_p = g + mu * buf if self.nesterov else buf
            wd = jnp.asarray(1.0)
            if p.ndim > 1:
                d_p, wd = _adamp_projection(p, g, d_p, self.delta,
                                            self.wd_ratio, self.eps, False)
            update = -lr_leaf * d_p
            if weight_decay > 0:
                update = update - (lr_leaf * weight_decay * wd
                                   / (1 - mu)) * p
            return update

        updates = _tree_map_with_path(leaf, paths, params, grads, new_buf)
        return updates, SGDPState(new_buf)


class RAdamState(NamedTuple):
    step: jnp.ndarray
    exp_avg: Params
    exp_avg_sq: Params


@dataclasses.dataclass(frozen=True)
class RAdam:
    """Rectified Adam (radam.py; Liu et al. 2020)."""
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.0

    def init(self, params: Params) -> RAdamState:
        return RAdamState(jnp.zeros((), jnp.int32),
                          jax.tree.map(jnp.zeros_like, params),
                          jax.tree.map(jnp.zeros_like, params))

    def update(self, grads: Grads, state: RAdamState, params: Params,
               lr: jnp.ndarray) -> Tuple[Params, RAdamState]:
        b1, b2 = self.betas
        step = state.step + 1
        t = step.astype(jnp.float32)
        bc1 = 1 - b1 ** t
        bc2 = 1 - b2 ** t
        rho_inf = 2.0 / (1.0 - b2) - 1.0
        rho_t = rho_inf - 2.0 * t * (b2 ** t) / bc2
        rect = jnp.sqrt(((rho_t - 4) * (rho_t - 2) * rho_inf)
                        / jnp.maximum((rho_inf - 4) * (rho_inf - 2) * rho_t,
                                      1e-12))
        use_rect = rho_t > 5.0

        if self.weight_decay:
            grads = jax.tree.map(lambda g, p: g + self.weight_decay * p,
                                 grads, params)
        new_m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                             state.exp_avg, grads)
        new_v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                             state.exp_avg_sq, grads)

        def leaf(p, g, m, v):
            denom = jnp.sqrt(v / bc2) + self.eps
            adaptive = -lr * rect / bc1 * m / denom
            unrect = -lr / bc1 * m
            return jnp.where(use_rect, adaptive, unrect)

        updates = jax.tree.map(leaf, params, grads, new_m, new_v)
        return updates, RAdamState(step, new_m, new_v)


class SAMState(NamedTuple):
    e_w: Params          # current perturbation (zero outside an ascent step)
    base_state: Any


@dataclasses.dataclass(frozen=True)
class SAM:
    """Sharpness-aware minimization (sam.py:5-65), functional two-phase:

      e_w, st = sam.first_step(grads, params, state)
      params_adv = tree_add(params, e_w)
      ... recompute grads at params_adv ...
      updates, st = sam.second_step(grads_adv, st, params, lr)

    (`update` on the combined transform alternates the two phases the way
    the reference's step() toggle does when driven by a single-grad loop.)
    """
    base: Any            # inner transform (e.g. AdamP)
    rho: float = 0.05
    adaptive: bool = False

    def init(self, params: Params) -> SAMState:
        return SAMState(jax.tree.map(jnp.zeros_like, params),
                        self.base.init(params))

    def first_step(self, grads: Grads, params: Params,
                   state: SAMState) -> Tuple[Params, SAMState]:
        sq = jax.tree.map(
            lambda p, g: jnp.sum(jnp.square((jnp.abs(p) if self.adaptive
                                             else 1.0) * g)),
            params, grads)
        norm = jnp.sqrt(sum(jax.tree.leaves(sq)))
        scale = self.rho / (norm + 1e-12)
        e_w = jax.tree.map(
            lambda p, g: (jnp.square(p) if self.adaptive else 1.0) * g
            * scale, params, grads)
        return e_w, SAMState(e_w, state.base_state)

    def second_step(self, grads_adv: Grads, state: SAMState, params: Params,
                    lr: jnp.ndarray) -> Tuple[Params, SAMState]:
        updates, base_state = self.base.update(grads_adv, state.base_state,
                                               params, lr)
        zero = jax.tree.map(jnp.zeros_like, state.e_w)
        return updates, SAMState(zero, base_state)


# ---------------------------------------------------------------------------
# regex param groups (optim/__init__.py:18-127)
# ---------------------------------------------------------------------------



def _tree_map_with_path(fn, paths: List[str], params: Params, *rest):
    leaves_list = [jax.tree.leaves(params)] + [jax.tree.leaves(r)
                                               for r in rest]
    treedef = jax.tree.structure(params)
    out = [fn(path, *leaves)
           for path, *leaves in zip(paths, *leaves_list)]
    return jax.tree.unflatten(treedef, out)


def make_group_fn(optimizer_groups: Optional[List[Dict[str, Any]]]
                  ) -> Optional[Callable[[str], Dict[str, Any]]]:
    """Build the per-leaf hyperparameter override from a config
    `optimizer_groups` list: [{regex_list: [...], **overrides}, ...].
    Later groups override earlier ones (matching the reference's
    iterative partitioning)."""
    if not optimizer_groups:
        return None
    compiled = [([re.compile(r) for r in g["regex_list"]],
                 {k: v for k, v in g.items() if k != "regex_list"})
                for g in optimizer_groups]

    def group_fn(path: str) -> Dict[str, Any]:
        opts: Dict[str, Any] = {}
        for regexes, overrides in compiled:
            if any(r.search(path) for r in regexes):
                opts.update(overrides)
        return opts

    return group_fn


def make_optimizer(name: str, kwargs: Dict[str, Any],
                   optimizer_groups: Optional[List[Dict[str, Any]]] = None):
    """Factory mirroring optim/__init__.py:151-172. Returns (transform,
    base_lr)."""
    kw = dict(kwargs)
    lr = kw.pop("lr", 1e-3)
    group_fn = make_group_fn(optimizer_groups)
    if name == "AdamP":
        kw.setdefault("betas", (0.9, 0.999))
        kw["betas"] = tuple(kw["betas"])
        return AdamP(group_fn=group_fn, **kw), lr
    if name == "SGDP":
        return SGDP(group_fn=group_fn, **kw), lr
    if name == "RAdam":
        kw["betas"] = tuple(kw.get("betas", (0.9, 0.999)))
        return RAdam(**kw), lr
    if name == "SAM":
        base_name = kw.pop("base_optimizer")
        base_kwargs = kw.pop("base_optimizer_kwargs", {})
        base, base_lr = make_optimizer(base_name, base_kwargs,
                                       optimizer_groups)
        return SAM(base=base, **kw), base_lr
    if name in ("Adam", "AdamW"):
        # plain Adam == AdamP with projection short-circuited off
        kw.setdefault("betas", (0.9, 0.999))
        kw["betas"] = tuple(kw["betas"])
        return AdamP(group_fn=group_fn, delta=-1.0, **kw), lr
    raise ValueError(f"unknown optimizer {name}")


def apply_updates(params: Params, updates: Params) -> Params:
    return jax.tree.map(lambda p, u: p + u, params, updates)
