"""FILIP token-wise late-interaction similarity.

Computes ``logits[b, l] = scale * mean_n max_m <d1[b, n], d2[l, m]>`` —
max over the other side's tokens, mean over own tokens
(prototype/model/filip.py:96-105).

Memory: the naive form materializes [B, GB, N1, N2]; with B=128, GB=4096,
16x16 selected tokens that is >500MB fp32 (SURVEY.md §5.7's hazard). The XLA
implementation chunks the gathered dimension with ``lax.map`` so peak memory
is [B, C, N1, N2] per chunk; a fused Pallas kernel is the planned follow-up
(same contract).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def late_interaction_logits(
    dense_1: jax.Array,
    dense_2_gathered: jax.Array,
    scale: jax.Array,
    chunk_size: int = 512,
) -> jax.Array:
    """dense_1 [B, N1, D] (normalized), dense_2_gathered [GB, N2, D]
    -> [B, GB] fp32 logits."""
    b, n1, d = dense_1.shape
    gb, n2, _ = dense_2_gathered.shape
    c = min(chunk_size, gb)
    # pad to a chunk multiple (not shrink c — a prime gb would serialize);
    # padded output columns are sliced off at the end
    nchunks = -(-gb // c)
    pad = nchunks * c - gb

    def per_chunk(d2_chunk):
        sim = jnp.einsum(
            "bnd,lmd->blnm", dense_1, d2_chunk,
            preferred_element_type=jnp.float32,
        )
        return sim.max(axis=-1).mean(axis=-1)  # [B, C]

    if nchunks == 1:
        out = per_chunk(dense_2_gathered)
    else:
        padded = jnp.pad(dense_2_gathered, ((0, pad), (0, 0), (0, 0)))
        chunks = padded.reshape(nchunks, c, n2, d)
        out = lax.map(per_chunk, chunks)  # [nchunks, B, C]
        out = out.transpose(1, 0, 2).reshape(b, nchunks * c)[:, :gb]
    return scale.astype(jnp.float32) * out
