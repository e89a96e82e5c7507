"""LR schedulers as pure functions of (iteration, epoch).

Reference: optim/lr_scheduler.py. The reference mutates optimizer.lr with a
per-iteration `warmup_step()` and per-epoch `step()`; here each scheduler is
a pure `lr(base_lr, iteration, epoch) -> float-array` usable inside one
compiled train step.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EmptyScheduler:
    """Constant LR (optim/lr_scheduler.py:12-24)."""

    def __call__(self, base_lr, iteration, epoch):
        return jnp.asarray(base_lr, jnp.float32)


@dataclasses.dataclass(frozen=True)
class CosineAnnealingWarmup:
    """Per-iteration linear warmup + per-epoch cosine decay
    (optim/lr_scheduler.py:296-358).

    lr = base * it/warmup                      while it <= warmup_iterations
       = eta_min + (base-eta_min)*(1+cos(pi*epoch/T_max))/2   afterwards
    """
    warmup_iterations: int
    T_max: float
    eta_min: float = 0.0

    def __call__(self, base_lr, iteration, epoch):
        base = jnp.asarray(base_lr, jnp.float32)
        it = jnp.asarray(iteration, jnp.float32)
        ep = jnp.asarray(epoch, jnp.float32)
        warm = base * jnp.minimum(it + 1.0, self.warmup_iterations) \
            / self.warmup_iterations
        cos = self.eta_min + (base - self.eta_min) * \
            (1.0 + jnp.cos(ep * math.pi / self.T_max)) / 2.0
        return jnp.where(it < self.warmup_iterations, warm, cos)


@dataclasses.dataclass(frozen=True)
class CosineAnnealingWarmupRestarts:
    """SGDR-style warm restarts with linear warmup inside each cycle
    (optim/lr_scheduler.py:27-115)."""
    first_cycle_steps: int
    cycle_mult: float = 1.0
    max_lr: float = 0.1
    min_lr: float = 0.001
    warmup_steps: int = 0
    gamma: float = 1.0

    def __call__(self, base_lr, iteration, epoch):
        # epoch-granular: `epoch` indexes the schedule like the reference's
        # step(epoch) calls
        t = jnp.asarray(epoch, jnp.float32)
        if self.cycle_mult == 1.0:
            cycle = jnp.floor(t / self.first_cycle_steps)
            t_cur = t - cycle * self.first_cycle_steps
            cycle_steps = jnp.asarray(self.first_cycle_steps, jnp.float32)
        else:
            m = self.cycle_mult
            n = jnp.floor(jnp.log(
                t / self.first_cycle_steps * (m - 1) + 1) / math.log(m))
            offset = self.first_cycle_steps * (m ** n - 1) / (m - 1)
            t_cur = t - offset
            cycle = n
            cycle_steps = self.first_cycle_steps * m ** n
        max_lr = self.max_lr * (self.gamma ** cycle)
        warm = (max_lr - self.min_lr) * (t_cur + 1) / self.warmup_steps \
            + self.min_lr if self.warmup_steps > 0 else max_lr
        cos = self.min_lr + (max_lr - self.min_lr) * (1 + jnp.cos(
            math.pi * (t_cur - self.warmup_steps)
            / jnp.maximum(cycle_steps - self.warmup_steps, 1.0))) / 2
        return jnp.where(t_cur < self.warmup_steps, warm, cos)


@dataclasses.dataclass(frozen=True)
class ReduceLROnPlateau:
    """Metric-driven decay (optim/lr_scheduler.py:118-293). Stateful by
    nature; implemented host-side: call `update(state, metric)` once per
    epoch (after validation) and feed `state['scale']` to the train step's
    `TrainState.lr_scale`. Semantics match the reference step(): is_better
    with rel/abs threshold modes, cooldown, and `initial_patience` epochs
    during which the LR is never reduced. (Note: the reference's own epoch
    loop calls `scheduler.step()` with no metric — wrapper.py:318 — so
    selecting ReduceLROnPlateau there crashes; here it is actually driven.)
    """
    factor: float = 0.1
    patience: int = 10
    initial_patience: int = 0
    threshold: float = 1e-4
    threshold_mode: str = "rel"
    cooldown: int = 0
    mode: str = "min"
    min_lr: float = 0.0
    eps: float = 1e-8

    def init_state(self) -> dict:
        worst = math.inf if self.mode == "min" else -math.inf
        return {"best": worst, "bad_epochs": 0, "cooldown": 0,
                "scale": 1.0, "epoch": 0}

    def _is_better(self, a: float, best: float) -> bool:
        if self.mode == "min" and self.threshold_mode == "rel":
            return a < best * (1.0 - self.threshold)
        if self.mode == "min":
            return a < best - self.threshold
        if self.threshold_mode == "rel":
            return a > best * (1.0 + self.threshold)
        return a > best + self.threshold

    def update(self, state: dict, metric: float,
               base_lr: Optional[float] = None) -> dict:
        state = dict(state)
        state["epoch"] += 1
        if self._is_better(float(metric), state["best"]):
            state["best"] = float(metric)
            state["bad_epochs"] = 0
        else:
            state["bad_epochs"] += 1
        if state["epoch"] <= self.initial_patience:
            return state
        if state["cooldown"] > 0:
            state["cooldown"] -= 1
            state["bad_epochs"] = 0
        if state["bad_epochs"] > self.patience:
            # min_lr bounds the absolute LR (reference _reduce_lr); as a
            # multiplier that is min_lr / base_lr when base_lr is known
            floor = self.min_lr / base_lr if base_lr else 0.0
            new_scale = max(state["scale"] * self.factor, floor)
            if state["scale"] - new_scale > self.eps:
                state["scale"] = new_scale
            state["cooldown"] = self.cooldown
            state["bad_epochs"] = 0
        return state

    def __call__(self, base_lr, iteration, epoch):
        # the plateau multiplier rides TrainState.lr_scale, not the schedule
        return jnp.asarray(base_lr, jnp.float32)


def make_scheduler(name: Optional[str], kwargs: dict, max_epochs: int):
    """Factory mirroring optim/__init__.py:174-194."""
    kw = dict(kwargs or {})
    kw.pop("warn", None)
    if name in (None, "EmptyScheduler"):
        return EmptyScheduler()
    if name in ("CosineAnnealingWarmup",):
        kw.setdefault("T_max", max_epochs)
        return CosineAnnealingWarmup(**kw)
    if name == "CosineAnnealingLR":
        kw.setdefault("T_max", max_epochs)
        return CosineAnnealingWarmup(warmup_iterations=0, **kw)
    if name == "CosineAnnealingWarmupRestarts":
        return CosineAnnealingWarmupRestarts(**kw)
    if name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(**kw)
    raise ValueError(f"unknown scheduler {name}")
