"""Mixup / CutMix batch augmentation (jit-safe).

Rebuilds prototype/utils/misc.py:482-532 (mixup_data/cutmix_data/rand_bbox —
plumbed but disabled in the reference solvers; provided here as working,
device-side ops).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mixup_data(rng: jax.Array, x: jax.Array, y: jax.Array, alpha: float = 1.0
               ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (mixed_x, y_a, y_b, lam)."""
    r1, r2 = jax.random.split(rng)
    lam = jax.random.beta(r1, alpha, alpha) if alpha > 0 else jnp.float32(1.0)
    perm = jax.random.permutation(r2, x.shape[0])
    mixed = lam * x + (1 - lam) * x[perm]
    return mixed, y, y[perm], lam


def rand_bbox(rng: jax.Array, h: int, w: int, lam: jax.Array):
    """CutMix box; returns (x1, y1, x2, y2) as traced ints."""
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_w = (w * cut_rat).astype(jnp.int32)
    cut_h = (h * cut_rat).astype(jnp.int32)
    r1, r2 = jax.random.split(rng)
    cx = jax.random.randint(r1, (), 0, w)
    cy = jax.random.randint(r2, (), 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    return x1, y1, x2, y2


def cutmix_data(rng: jax.Array, x: jax.Array, y: jax.Array, alpha: float = 1.0
                ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """x: [B, H, W, C]. Returns (mixed_x, y_a, y_b, lam_adjusted)."""
    r1, r2, r3 = jax.random.split(rng, 3)
    lam = jax.random.beta(r1, alpha, alpha) if alpha > 0 else jnp.float32(1.0)
    perm = jax.random.permutation(r2, x.shape[0])
    b, h, w, c = x.shape
    x1, y1, x2, y2 = rand_bbox(r3, h, w, lam)
    row = jnp.arange(h)[None, :, None, None]
    col = jnp.arange(w)[None, None, :, None]
    inside = ((row >= y1) & (row < y2) & (col >= x1) & (col < x2))
    mixed = jnp.where(inside, x[perm], x)
    lam_adj = 1.0 - ((x2 - x1) * (y2 - y1)) / (h * w)
    return mixed, y, y[perm], lam_adj
