"""Blockwise InfoNCE must match the dense computation in value and grads."""

import jax
import jax.numpy as jnp
import numpy as np

from declip_tpu.ops.contrastive import (
    chunked_clip_pair_loss,
    chunked_cross_entropy,
    clip_pair_loss,
    cross_entropy,
    similarity_logits,
)


def test_chunked_ce_matches_dense(rng):
    a = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(24, 16)), jnp.float32)
    scale = jnp.asarray(10.0)
    labels = jnp.asarray(rng.integers(0, 24, size=(8,)))
    dense = cross_entropy(similarity_logits(a, b, scale), labels)
    for chunk in (4, 8, 24):
        ours = chunked_cross_entropy(a, b, scale, labels, chunk_size=chunk)
        np.testing.assert_allclose(float(ours), float(dense), rtol=1e-5)


def test_chunked_pair_loss_and_grads(rng):
    img = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    scale = jnp.asarray(25.0)

    def dense(img, txt):
        return clip_pair_loss(img, txt, scale)[0]

    def chunked(img, txt):
        return chunked_clip_pair_loss(img, txt, scale, chunk_size=4)

    np.testing.assert_allclose(
        float(chunked(img, txt)), float(dense(img, txt)), rtol=1e-5)
    g1 = jax.grad(dense, argnums=(0, 1))(img, txt)
    g2 = jax.grad(chunked, argnums=(0, 1))(img, txt)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-5)


def test_chunked_ce_non_divisible(rng):
    """Prime gathered size must still chunk (padding, not c->1 degradation)."""
    a = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(23, 8)), jnp.float32)  # prime
    scale = jnp.asarray(7.0)
    labels = jnp.asarray(rng.integers(0, 23, size=(4,)))
    dense = cross_entropy(similarity_logits(a, b, scale), labels)
    ours = chunked_cross_entropy(a, b, scale, labels, chunk_size=8)
    np.testing.assert_allclose(float(ours), float(dense), rtol=1e-5)


def test_late_interaction_non_divisible(rng):
    from declip_tpu.ops.filip_ops import late_interaction_logits

    d1 = jnp.asarray(rng.normal(size=(3, 4, 8)), jnp.float32)
    d2 = jnp.asarray(rng.normal(size=(7, 5, 8)), jnp.float32)  # prime
    out = late_interaction_logits(d1, d2, jnp.asarray(1.5), chunk_size=3)
    naive = 1.5 * np.einsum("bnd,lmd->blnm", np.asarray(d1),
                            np.asarray(d2)).max(-1).mean(-1)
    np.testing.assert_allclose(np.asarray(out), naive, rtol=1e-5)
