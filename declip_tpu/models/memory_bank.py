"""Functional NNCLR nearest-neighbour feature queue.

Rebuilds prototype/model/utils/nnclr_modules/{memory_bank,nn_memory_bank}.py
as pure functions over an explicit ``BankState`` pytree carried in the train
state (the reference keeps the bank as an unregistered module attribute and
deliberately excludes it from checkpoints, memory_bank.py:62-65 — here it is
explicit state; whether to checkpoint it is the saver's choice, default not).

The bank holds ``size`` L2-normalized feature rows; queries are a single
[B, size] MXU matmul + top-k. All ops are jit-safe (static shapes, ring
pointer carried as a traced scalar).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class BankState(NamedTuple):
    bank: jax.Array  # [size, dim] L2-normalized rows
    ptr: jax.Array  # int32 scalar, next write position


def init_bank(rng: jax.Array, size: int, dim: int, dtype=jnp.float32) -> BankState:
    """Random normalized init, matching memory_bank.py:55-65."""
    bank = jax.random.normal(rng, (size, dim), dtype=jnp.float32)
    bank = bank / jnp.linalg.norm(bank, axis=-1, keepdims=True)
    return BankState(bank.astype(dtype), jnp.zeros((), jnp.int32))


def enqueue(state: BankState, batch: jax.Array) -> BankState:
    """Ring write of a [B, dim] batch at ptr.

    Delta vs reference (memory_bank.py:70-87): on wrap the reference writes a
    partial batch and discards the tail; we clamp the write start to
    ``size - B`` so the full batch always lands, then wrap the pointer — both
    keep the bank a FIFO of the most recent features.
    """
    size = state.bank.shape[0]
    b = batch.shape[0]
    batch = jax.lax.stop_gradient(batch).astype(state.bank.dtype)
    start = jnp.minimum(state.ptr, size - b)
    bank = jax.lax.dynamic_update_slice(state.bank, batch, (start, 0))
    new_ptr = jnp.where(state.ptr + b >= size, 0, state.ptr + b)
    return BankState(bank, new_ptr)


def query_topk(
    state: BankState, x: jax.Array, topk: int = 1
) -> Tuple[jax.Array, ...]:
    """Return the top-k nearest bank rows for each row of x.

    Matches nn_memory_bank.py:42-65: cosine similarity (both sides
    normalized), returns a tuple of k arrays each [B, dim] — the reference
    returns a list indexed the same way.
    """
    x = jax.lax.stop_gradient(x)
    bank = state.bank.astype(x.dtype)
    # The reference normalizes BOTH sides before the similarity matmul —
    # but only the returned rows matter, and per-row top-k indices are
    # invariant to (a) any positive per-query scale (skip normalizing x)
    # and (b) materializing a normalized [M, D] bank copy: divide the
    # similarity COLUMNS by the bank row norms instead. Measured on v5e
    # (2^16 x 1024, B=128): speed is a WASH vs the normalize-then-top_k
    # form (~1.9 ms either way — the query is dispatch/fixed-overhead
    # bound, not HBM bound), but this form never materializes the 134 MB
    # bf16 bank copy, which matters when the 268 MB fp32 bank shares HBM
    # with the 2-view R50 step. Equality with the reference math is tested
    # (tests/test_models.py::test_bank_query_matches_naive).
    sim = jnp.einsum("nd,md->nm", x, bank,
                     preferred_element_type=jnp.float32)
    norms = jnp.sqrt(
        jnp.sum(jnp.square(bank.astype(jnp.float32)), axis=-1)) + 1e-10
    sim = sim / norms[None, :]
    if topk == 1:
        # lax.top_k lowers to a (slow) sort-based TopK custom call; argmax
        # is a single VPU reduction with the same first-max tie-breaking
        # (the reference's own commented-out argmax path,
        # nn_memory_bank.py:62-63)
        return (bank[jnp.argmax(sim, axis=-1)],)
    _, idx = jax.lax.top_k(sim, topk)  # [B, k]
    return tuple(bank[idx[:, i]] for i in range(topk))
