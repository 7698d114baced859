"""Legacy pure-vision SSL pretraining builders: MoCo, SimCLR, CLSA.

Rebuilds prototype/utils/{moco,simclr,clsa}_builder.py (SURVEY.md §2.7 —
support machinery predating the CLIP solvers, kept for capability parity).

TPU translation notes:
- MoCo's momentum encoder + negatives queue are functional state (like the
  NN memory bank); ShuffleBN (moco_builder's group-split batch shuffling, a
  workaround for per-GPU BN statistics leaking) is unnecessary under SPMD —
  BatchNorm statistics are already global across the mesh, which removes the
  information leak ShuffleBN patches; an optional batch permutation is kept
  for strict parity experiments.
- SimCLR is a thin projector head + NT-Xent (declip_tpu.losses.nt_xent).
- CLSA adds the stronger-augmentation DDM loss on top of MoCo.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from declip_tpu.losses import nt_xent
from declip_tpu.models.heads import ProjectionMLP


class MoCoState(NamedTuple):
    key_params: Any  # EMA (momentum) encoder params
    queue: jax.Array  # [K, dim] normalized negatives
    queue_ptr: jax.Array  # int32


def init_moco_state(params, rng: jax.Array, queue_size: int, dim: int
                    ) -> MoCoState:
    q = jax.random.normal(rng, (queue_size, dim))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return MoCoState(jax.tree.map(jnp.copy, params), q,
                     jnp.zeros((), jnp.int32))


def momentum_update(state: MoCoState, params, m: float = 0.999) -> MoCoState:
    new_key = jax.tree.map(
        lambda k, p: m * k + (1 - m) * p, state.key_params, params
    )
    return state._replace(key_params=new_key)


def enqueue_keys(state: MoCoState, keys: jax.Array) -> MoCoState:
    k = keys.shape[0]
    size = state.queue.shape[0]
    start = jnp.minimum(state.queue_ptr, size - k)
    queue = jax.lax.dynamic_update_slice(
        state.queue, jax.lax.stop_gradient(keys), (start, 0))
    ptr = jnp.where(state.queue_ptr + k >= size, 0, state.queue_ptr + k)
    return state._replace(queue=queue, queue_ptr=ptr)


def moco_loss(q: jax.Array, k: jax.Array, queue: jax.Array,
              temperature: float = 0.07) -> jax.Array:
    """InfoNCE with the queue as negatives (moco_builder forward)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    k = jax.lax.stop_gradient(
        k / jnp.linalg.norm(k, axis=-1, keepdims=True))
    l_pos = jnp.einsum("nd,nd->n", q, k)[:, None]
    l_neg = jnp.einsum("nd,kd->nk", q, queue)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    labels = jnp.zeros((q.shape[0],), jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -logp[jnp.arange(q.shape[0]), labels].mean()


class SimCLRHead(nn.Module):
    """2-layer projection head (simclr_builder.py)."""

    hidden_dim: int = 2048
    out_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


def simclr_loss(z1: jax.Array, z2: jax.Array, temperature: float = 0.5
                ) -> jax.Array:
    return nt_xent(z1, z2, temperature)


def clsa_ddm_loss(strong_logits: jax.Array, weak_logits: jax.Array,
                  temperature: float = 0.2) -> jax.Array:
    """CLSA distributional divergence: CE between the weak view's sharpened
    distribution and the strong view's (clsa_builder.py)."""
    target = jax.nn.softmax(
        jax.lax.stop_gradient(weak_logits).astype(jnp.float32) / temperature,
        axis=-1,
    )
    logp = jax.nn.log_softmax(strong_logits.astype(jnp.float32), axis=-1)
    return -(target * logp).sum(axis=-1).mean()
