"""GradCache: exact full-batch contrastive gradients at 1/M activation
memory (beyond-reference; Gao et al. 2021, "Scaling Deep Contrastive
Learning Batch Size under Memory Limited Setup", arXiv:2101.06983).

The contrastive methods here couple samples ONLY through the loss (InfoNCE
denominators over the global batch) — tower forwards are per-sample. That
makes the gradient separable into

    dL/dtheta = sum_c  (dOut_c/dtheta)^T (dL/dOut_c)  +  dL/dtheta|_loss

so the step can run in three phases, none of which ever holds more than one
chunk's tower activations:

  1. **embedding pass** — ``lax.map`` over M chunks, towers forward only;
     XLA frees each iteration's intermediates (nothing needs them — no
     autodiff taping in this pass).
  2. **loss pass** — differentiate the loss assembly over the merged
     [B, ...] outputs (and params, for loss-side param uses like DeCLIP's
     bank projector). Outputs are embedding-sized, so this is cheap.
  3. **gradient pass** — ``lax.scan`` over chunks; each iteration re-runs
     one chunk's forward under ``jax.vjp`` and injects the cached output
     cotangent. Residuals live only inside the iteration.

Cost: one extra forward (~+33% step FLOPs) for O(B/M) activation memory —
the TPU-native answer to "HBM caps the per-chip batch" (v5e: 16GB). Unlike
plain gradient accumulation, the InfoNCE negatives remain the FULL batch:
the math is bit-equivalent to the unchunked step up to reduction order
(fp32 parity ~1e-6, tests/test_grad_cache.py).

Scope: any model whose train forward carries NO batch_stats — CLIP and
FILIP ViT towers (both parity-tested). Refused loudly for
- anything with BatchNorm in the train forward: ResNet towers, and
  DeCLIP/SLIP/DeFILIP (their SimSiam projection MLPs are BatchNorm by
  reference design, heads.py) — batch statistics couple samples inside the
  FORWARD, violating separability;
- MoE towers: router capacity/aux loss are batch-coupled in the forward;
- SSL methods (queue/momentum-encoder state has its own step shape).
(Extending to DeCLIP would mean hoisting the [B, D]-cheap SimSiam heads
out of the tower forward into the loss pass — model surgery deferred;
the DeCLIP north star is R50, which is BN-excluded anyway.)

Config: ``grad_cache: {chunks: M}`` (M must divide the per-host batch).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["make_cached_value_and_grad"]


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def make_cached_value_and_grad(
    forward_out: Callable,
    losses_from_out: Callable,
    n_chunks: int,
    mesh=None,
) -> Callable:
    """Build ``(params, state, batch) -> ((total, (metrics, None, out,
    None)), grads)`` matching ``jax.value_and_grad(loss_fn, has_aux=True)``'s
    contract in train_step.py, with the three-phase schedule above.

    ``forward_out(params, state, chunk) -> (out, mutated)`` and
    ``losses_from_out(params, out, state, moe_aux) -> (total, metrics)``
    are the split halves of the standard step's loss_fn.

    batch_stats come back ``None`` (callers must run BN-free towers — the
    Solver enforces this before building the step).
    """

    def value_and_grad(params, state, batch):
        def chunked(x):
            b = x.shape[0]
            if b % n_chunks:
                raise ValueError(
                    f"grad_cache: batch {b} not divisible by "
                    f"chunks={n_chunks}")
            return x.reshape(n_chunks, b // n_chunks, *x.shape[1:])

        chunks = jax.tree.map(chunked, batch)
        if mesh is not None and "data" in mesh.axis_names:
            # keep each chunk sharded over the data axes (the reshape moves
            # the sharded dim; without the pin GSPMD may gather the batch)
            from jax.sharding import NamedSharding, PartitionSpec as P
            from declip_tpu.parallel.mesh import batch_axes

            daxes = batch_axes(mesh)
            bspec = daxes if len(daxes) > 1 else daxes[0]
            chunks = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(None, bspec))), chunks)

        chunk_b = jax.tree.leaves(chunks)[0].shape[1]

        # ---- phase 1: embeddings, no residuals ------------------------
        def fwd_chunk(ch):
            out, _ = forward_out(params, state, ch)
            return out

        stacked = jax.lax.map(fwd_chunk, chunks)

        # per-sample leaves ([M, b, ...] from a [b, ...] chunk output)
        # merge to [B, ...]; batch-independent leaves (logit_scale & co,
        # [M, ...]) are identical across chunks — take chunk 0's
        single = jax.eval_shape(
            fwd_chunk, jax.tree.map(lambda x: x[0], chunks))
        is_per_sample = jax.tree.map(
            lambda s: s.ndim >= 1 and s.shape[0] == chunk_b, single)

        def merge(x, per_sample):
            return (x.reshape(-1, *x.shape[2:]) if per_sample else x[0])

        out = jax.tree.map(merge, stacked, is_per_sample)

        # ---- phase 2: differentiate the loss over merged outputs -------
        def loss_on(p, o):
            return losses_from_out(p, o, state, None)

        (total, metrics), (loss_pgrad, out_cot) = jax.value_and_grad(
            loss_on, argnums=(0, 1), has_aux=True)(params, out)

        def split_cot(c, per_sample):
            if per_sample:
                return c.reshape(n_chunks, -1, *c.shape[1:])
            # each chunk's forward produced the identical leaf from the
            # same params: dividing the cotangent spreads the chain rule
            # so the scan's sum reconstructs it exactly
            return jnp.broadcast_to(
                c / n_chunks, (n_chunks,) + c.shape).astype(c.dtype)

        cots = jax.tree.map(split_cot, out_cot, is_per_sample)

        # ---- phase 3: chunked backward with injected cotangents --------
        def body(acc, xs):
            ch, cot = xs
            _, vjp = jax.vjp(lambda p: forward_out(p, state, ch)[0], params)
            (pg,) = vjp(cot)
            return _tree_add(acc, pg), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        tower_grads, _ = jax.lax.scan(body, zeros, (chunks, cots))
        grads = _tree_add(tower_grads, loss_pgrad)
        return (total, (metrics, None, out, None)), grads

    return value_and_grad
