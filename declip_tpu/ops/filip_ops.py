"""FILIP token-wise late-interaction similarity.

Computes ``logits[b, l] = scale * mean_n max_m <d1[b, n], d2[l, m]>`` —
max over the other side's tokens, mean over own tokens
(prototype/model/filip.py:96-105).

Memory: the naive form materializes [B, GB, N1, N2]; with B=128, GB=4096,
16x16 selected tokens that is >500MB fp32 (SURVEY.md §5.7's hazard). The XLA
implementation chunks the gathered dimension with ``lax.map`` and
rematerializes the per-chunk similarity in the backward (without
``jax.checkpoint`` the scan STACKS every chunk's [B, C, N1, N2] residual —
the full hazard tensor again; measured OOM at B=128, GB=4096 on v5e).

The default on TPU is the fused Pallas kernel (ops/filip_pallas.py), which
keeps the similarity tile in VMEM end to end — measured A/B in
tools/bench_li.py / README. ``DECLIP_FILIP_LI_IMPL={pallas,xla}`` overrides.
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

    @jax.checkpoint
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


def dispatch_late_interaction(cfg=None):
    """Config/env-selected late-interaction implementation.

    Order: ``cfg.filip_dense.impl`` > ``$DECLIP_FILIP_LI_IMPL`` > default
    (fused Pallas on TPU — measured 1.17-1.47x over the remat'd chunked XLA
    path fwd+bwd at production shapes on v5e, tools/bench_li.py; the
    UN-remat'd XLA path OOMs outright in backward — XLA elsewhere).
    The Pallas kernel unrolls one MXU matmul per key token, so wide
    unselected key sets (N2 > 32, e.g. select_topk off) fall back to XLA."""
    import os

    impl = None
    if cfg:
        impl = (cfg.get("filip_dense") or {}).get("impl")
    impl = impl or os.environ.get("DECLIP_FILIP_LI_IMPL")
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from declip_tpu.ops.filip_pallas import late_interaction_logits_pallas

        def fn(d1, d2, scale):
            if d2.shape[1] > 32:
                return late_interaction_logits(d1, d2, scale)
            return late_interaction_logits_pallas(d1, d2, scale)

        return fn
    return late_interaction_logits
