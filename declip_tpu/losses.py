"""Loss functions (JAX) — parity with prototype/loss_functions/.

All take fp32 logits/features and return scalar fp32 losses. Collective
gathering happens in declip_tpu.ops.contrastive; these are pure math.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from declip_tpu.ops.contrastive import cross_entropy

IGNORE_INDEX = -100


def label_smooth_ce(logits: jax.Array, labels: jax.Array, smooth_ratio: float,
                    num_classes: int) -> jax.Array:
    """LabelSmoothCELoss (loss.py:7-21)."""
    v = smooth_ratio / num_classes
    one_hot = jnp.full(logits.shape, v, jnp.float32)
    one_hot = one_hot.at[jnp.arange(logits.shape[0]), labels].set(
        1 - smooth_ratio + v
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(logp * one_hot).sum() / logits.shape[0]


def _cosine(p: jax.Array, z: jax.Array) -> jax.Array:
    p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    return (p * z).sum(axis=-1).mean()


def simsiam_loss(p1, z1, p2, z2) -> jax.Array:
    """Symmetric negative cosine with stop-gradient on z
    (SimsiamLoss, loss.py:49-81)."""
    z1 = jax.lax.stop_gradient(z1)
    z2 = jax.lax.stop_gradient(z2)
    return -0.5 * (_cosine(p1, z2) + _cosine(p2, z1))


def simsiam_loss_minimize(p: jax.Array, z_candidates: jax.Array) -> jax.Array:
    """D_minimize: max cosine over candidate axis (loss.py:57-62).
    p: [B, D]; z_candidates: [B, K, D] (stop-gradient applied)."""
    z = jax.lax.stop_gradient(z_candidates)
    p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    sim = jnp.einsum("bd,bkd->bk", p, z)
    return sim.max(axis=-1).mean()


def mlm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Masked-token CE ignoring -100 (declip.py:326-334).

    logits [B, L, V], labels int [B, L]. Mean over selected positions; if a
    batch happens to select zero tokens the loss is 0 (the reference would
    NaN there).
    """
    mask = (labels != IGNORE_INDEX).astype(jnp.float32)
    safe_labels = jnp.where(labels == IGNORE_INDEX, 0, labels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1.0)
    return (nll * mask).sum() / denom


def nt_xent(z_i: jax.Array, z_j: jax.Array, temperature: float = 0.5) -> jax.Array:
    """SimCLR NT-Xent over the local batch (nt_xent.py:6-44)."""
    b = z_i.shape[0]
    p = jnp.concatenate([z_i, z_j], axis=0)
    p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-12)
    sim = (p @ p.T).astype(jnp.float32) / temperature  # [2B, 2B]

    pos_idx = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    pos = jnp.take_along_axis(sim, pos_idx[:, None], axis=-1)[:, 0]

    diag = jnp.eye(2 * b, dtype=bool)
    pos_mask = jnp.zeros((2 * b, 2 * b), bool).at[
        jnp.arange(2 * b), pos_idx
    ].set(True)
    neg_mask = ~(diag | pos_mask)

    # CE with positive in column 0 against all negatives
    neg = jnp.where(neg_mask, sim, -jnp.inf)
    denom = jnp.logaddexp(pos, jax.nn.logsumexp(neg, axis=-1))
    return (denom - pos).mean()


def nt_xent_gather(
    z_i: jax.Array,
    z_ib: jax.Array,
    z_j: jax.Array,
    z_jb: jax.Array,
    labels: jax.Array,
    temperature: float = 0.1,
) -> jax.Array:
    """SimCLR against gathered embeddings (NT_Xent_gather, nt_xent.py:47-97).

    z_i/z_j: local views [B, D]; z_ib/z_jb: gathered views [GB, D];
    labels: this shard's global row offsets (``rank*B + arange``).
    """
    b = z_i.shape[0]
    gb = z_ib.shape[0]
    p0 = jnp.concatenate([z_i, z_j], axis=0)  # [2B, D]
    p1 = jnp.concatenate([z_ib, z_jb], axis=0)  # [2GB, D]
    p0 = p0 / (jnp.linalg.norm(p0, axis=-1, keepdims=True) + 1e-12)
    p1 = p1 / (jnp.linalg.norm(p1, axis=-1, keepdims=True) + 1e-12)
    sim = (p0 @ p1.T).astype(jnp.float32) / temperature  # [2B, 2GB]

    ids = jnp.arange(b)
    rows = jnp.concatenate([ids, ids + b])
    # positives: row i (view1) <-> gathered view2 column, and vice versa
    pos_cols = jnp.concatenate([labels + gb, labels])
    pos = sim[rows, pos_cols]

    # negatives: everything except the 4 self/positive columns per row pair
    col = jnp.arange(2 * gb)[None, :]
    lab2 = jnp.concatenate([labels, labels])[:, None]
    self_mask = (col == lab2) | (col == lab2 + gb)
    neg = jnp.where(self_mask, -jnp.inf, sim)

    denom = jnp.logaddexp(pos, jax.nn.logsumexp(neg, axis=-1))
    return (denom - pos).mean()


def nt_xent_convirt(
    zis: jax.Array,
    zjs: jax.Array,
    temperature: float = 0.1,
    alpha: float = 0.75,
    norm: bool = True,
) -> jax.Array:
    """ConVIRT image-text soft-CE NT-Xent (nt_xent_ConVIRT.py:4-86)."""
    if norm:
        zis = zis / (jnp.linalg.norm(zis, axis=-1, keepdims=True) + 1e-12)
        zjs = zjs / (jnp.linalg.norm(zjs, axis=-1, keepdims=True) + 1e-12)
    b = zis.shape[0]
    logits_ab = (zis @ zjs.T).astype(jnp.float32) / temperature
    logits_ba = (zjs @ zis.T).astype(jnp.float32) / temperature
    labels = jnp.arange(b)
    # reference softXEnt sums over batch then /B == mean CE
    loss_a = cross_entropy(logits_ab, labels)
    loss_b = cross_entropy(logits_ba, labels)
    return alpha * loss_a + (1 - alpha) * loss_b
