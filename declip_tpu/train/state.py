"""Train state: one pytree carrying everything a training step mutates.

The reference scatters this across mutable module attributes, optimizer
internals and solver fields (model params, BN running stats, FP16 master
weights, EMA shadow dict, NN memory banks, EMA_logit_scale buffer,
last_iter). Here it is a single flax.struct dataclass so the whole step is a
pure function ``(state, batch) -> (state, metrics)`` that pjit shards/donates
as one unit.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp

from declip_tpu.models.memory_bank import BankState


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # int32 scalar — number of completed steps
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    bank_text: Optional[BankState] = None
    # EMA_logit_scale guard state (declip_solver.py:64-86)
    logit_ema_buffer: Optional[jax.Array] = None
    logit_clip_count: Optional[jax.Array] = None
    # MoCo/CLSA momentum encoder + negatives queue (moco_builder.py:33-68)
    ssl: Optional[Any] = None

    @property
    def int_step(self) -> int:
        return int(self.step)


def new_train_state(
    *,
    params,
    batch_stats,
    opt_state,
    ema_params=None,
    bank_text: Optional[BankState] = None,
    step: int = 0,
    with_logit_guard: bool = False,
    ssl=None,
) -> TrainState:
    return TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        ema_params=ema_params,
        bank_text=bank_text,
        ssl=ssl,
        logit_ema_buffer=(
            jnp.asarray(3.125, jnp.float32) if with_logit_guard else None
        ),
        logit_clip_count=(
            jnp.zeros((), jnp.int32) if with_logit_guard else None
        ),
    )
