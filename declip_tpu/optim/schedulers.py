"""Iteration-domain, warmup-aware LR schedules.

Rebuilds prototype/lr_scheduler/scheduler.py as pure ``step -> lr`` callables
(optax schedule functions). Reference semantics preserved:

- linear warmup from ``base_lr`` to ``warmup_lr`` over ``warmup_steps``
  (scheduler.py:41-84); after warmup the decay law runs on ``warmup_lr``;
- ``Step``: multiply by lr_mults at milestones (scheduler.py:87-144);
- ``StepDecay``: x rate every step_size after warmup (scheduler.py:147-197);
- ``Cosine``: cosine from warmup_lr to min_lr over the remaining steps
  (scheduler.py:200-249);
- ``Poly``: (1 - t)^power toward min_lr (scheduler.py:252-301).

Epoch variants (StepEpoch/CosineEpoch, lr_scheduler/__init__.py:4-17) are
converted to iterations by the caller.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp

from declip_tpu.utils.registry import SCHEDULERS

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _warmup(step, base_lr: float, warmup_lr: float, warmup_steps: int):
    if warmup_steps <= 0:
        return jnp.asarray(warmup_lr, jnp.float32)
    frac = jnp.minimum(step.astype(jnp.float32) / warmup_steps, 1.0)
    return base_lr + (warmup_lr - base_lr) * frac


def _with_warmup(decay_fn: Callable, base_lr, warmup_lr, warmup_steps) -> Schedule:
    def schedule(step):
        step = jnp.asarray(step)
        warm = _warmup(step, base_lr, warmup_lr, warmup_steps)
        after = decay_fn(jnp.maximum(step - warmup_steps, 0))
        return jnp.where(step < warmup_steps, warm, after)

    return schedule


@SCHEDULERS.register(name="Step")
def step_schedule(base_lr: float, warmup_lr: float, warmup_steps: int,
                  lr_mults: Sequence[float], lr_steps: Sequence[int],
                  max_iter: int = 0, **_) -> Schedule:
    lr_steps = [s - warmup_steps for s in lr_steps]

    def decay(s):
        lr = jnp.asarray(warmup_lr, jnp.float32)
        mult = jnp.ones((), jnp.float32)
        acc = 1.0
        for milestone, m in zip(lr_steps, lr_mults):
            acc *= m
            mult = jnp.where(s >= milestone, acc, mult)
        return lr * mult

    return _with_warmup(decay, base_lr, warmup_lr, warmup_steps)


@SCHEDULERS.register(name="StepDecay")
def step_decay_schedule(base_lr: float, warmup_lr: float, warmup_steps: int,
                        step_size: int, rate: float, max_iter: int = 0, **_
                        ) -> Schedule:
    def decay(s):
        n = jnp.floor(s.astype(jnp.float32) / step_size)
        return warmup_lr * jnp.power(rate, n)

    return _with_warmup(decay, base_lr, warmup_lr, warmup_steps)


@SCHEDULERS.register(name="Cosine")
def cosine_schedule(base_lr: float, warmup_lr: float, warmup_steps: int,
                    max_iter: int, min_lr: float = 0.0, **_) -> Schedule:
    total = max(max_iter - warmup_steps, 1)

    def decay(s):
        frac = jnp.clip(s.astype(jnp.float32) / total, 0.0, 1.0)
        cos = 0.5 * (1 + jnp.cos(math.pi * frac))
        return min_lr + (warmup_lr - min_lr) * cos

    return _with_warmup(decay, base_lr, warmup_lr, warmup_steps)


@SCHEDULERS.register(name="Poly")
def poly_schedule(base_lr: float, warmup_lr: float, warmup_steps: int,
                  max_iter: int, power: float = 1.0, min_lr: float = 0.0, **_
                  ) -> Schedule:
    total = max(max_iter - warmup_steps, 1)

    def decay(s):
        frac = jnp.clip(s.astype(jnp.float32) / total, 0.0, 1.0)
        return min_lr + (warmup_lr - min_lr) * jnp.power(1 - frac, power)

    return _with_warmup(decay, base_lr, warmup_lr, warmup_steps)


def scheduler_entry(cfg, *, max_iter: int, iters_per_epoch: int = 1) -> Schedule:
    """Build a schedule from a `{type, kwargs}` node.

    Epoch-domain types (StepEpoch/CosineEpoch) convert ``lr_epochs`` /
    ``max_epoch`` to iterations like lr_scheduler/__init__.py:4-17.
    """
    kind = cfg["type"]
    kwargs = dict(cfg.get("kwargs") or {})
    kwargs.setdefault("max_iter", max_iter)
    if "warmup_epoch" in kwargs:
        kwargs["warmup_steps"] = int(
            kwargs.pop("warmup_epoch") * iters_per_epoch)
    kwargs.setdefault("warmup_steps", 0)
    if kind == "StepEpoch":
        kind = "Step"
        kwargs["lr_steps"] = [
            int(e * iters_per_epoch) for e in kwargs.pop("lr_epochs")
        ]
    elif kind == "CosineEpoch":
        kind = "Cosine"
    return SCHEDULERS.get(kind)(**kwargs)
