"""Functional EMA over the train-state param tree.

Rebuilds prototype/utils/ema.py as pure pytree ops carried in TrainState:
- warmup-ramped decay ``min(decay, (1+t)/(warmup+t))`` (ema.py:36-40),
- ``inner_T`` stride (update only when ``step % inner_T == 0``; effective
  decay ``decay**inner_T``, ema.py:16-18,41-42),
- swap-in/out for eval is trivial here: evaluation just uses the EMA tree.

Deltas: fp32 shadow (the reference offers float64 — unnecessary under fp32
master params); ``copy_init=False`` zero-init is reproduced.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


class EmaConfig(NamedTuple):
    decay: float
    warmup: int = 1
    inner_T: int = 1
    copy_init: bool = False

    @property
    def effective_decay(self) -> float:
        return self.decay ** self.inner_T if self.inner_T > 1 else self.decay


def init_ema(params, cfg: EmaConfig):
    f = (lambda v: v.astype(jnp.float32)) if cfg.copy_init else (
        lambda v: jnp.zeros_like(v, jnp.float32)
    )
    return jax.tree.map(f, params)


def ema_step(ema_params, params, step, cfg: EmaConfig):
    """One EMA update; no-op on steps not divisible by inner_T."""
    decay = jnp.minimum(
        cfg.effective_decay,
        (1.0 + step.astype(jnp.float32)) / (cfg.warmup + step.astype(jnp.float32)),
    )
    do_update = (step % cfg.inner_T) == 0

    def upd(e, p):
        new = e * decay + (1 - decay) * p.astype(jnp.float32)
        return jnp.where(do_update, new, e)

    return jax.tree.map(upd, ema_params, params)
