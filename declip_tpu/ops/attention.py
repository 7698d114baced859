"""Multi-head attention compute op with XLA and Pallas paths.

Replaces the reference's cuDNN ``nn.MultiheadAttention``
(prototype/model/image_encoder/base_transformer.py:33) and
``F.multi_head_attention_forward`` in AttentionPool2d
(prototype/model/image_encoder/modified_resnet.py:75-94).

Sequences in this workload are tiny (77 text tokens, 50/197 image patches), so
the XLA path — two batched matmuls with an fp32 softmax, fully fused by XLA
onto the MXU — is the default. A Pallas flash-attention path exists for the
longer-sequence configs (ViT-B/16 and dense FILIP work) and is selected with
``impl='pallas'`` (falls back to XLA off-TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.checkpoint, static_argnums=(3, 4))
def _xla_attention(q, k, v, causal: bool, scale: float):
    """q,k,v: [B, H, L, Dh]; softmax in fp32 for stability (bf16 inputs).

    Rematerialized: without the checkpoint, the fp32 [B, H, L, L] logits AND
    probabilities are saved for backward inside the nn.scan layer stack —
    ~4GB of the train step's temp memory at B=128 ViT-B/32. Recomputing them
    (flash-attention-style) costs ~5% FLOPs and enables 2x larger batches.

    TP: the sharding constraints (no-ops outside TP) pin the REMAT BODY'S
    layout — constraints outside a jax.checkpoint don't reach the ops the
    backward pass recomputes, and XLA's partitioner then free-chooses
    shardings inside the body and replicate-repartitions at its boundary
    ("Involuntary full rematerialization", spmd_partitioner.cc).
    """
    from declip_tpu.parallel.tp import DATA, MODEL, constrain

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = constrain(logits * scale, DATA, MODEL, None, None)
    if causal:
        L, Lk = logits.shape[-2], logits.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (L, Lk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (L, Lk), 1)
        logits = jnp.where(col <= row, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    probs = constrain(probs, DATA, MODEL, None, None)
    return constrain(
        jnp.einsum("bhqk,bhkd->bhqd", probs, v), DATA, MODEL, None, None)


# Measured crossover on v5e (fwd+bwd, bf16, batched A/B in bench.py):
# XLA's fused-softmax attention wins at L<=197 (ViT-B/16 patches, 77 text
# tokens); the Pallas kernel wins at L=257 (ViT-L/14: 151.5 vs 117.1
# pairs/s/chip train step, +29%) where the remat'd [B,H,L,L] fp32 logits
# round-trip through HBM starts to dominate. 'auto' switches at this line.
_PALLAS_MIN_LEN = 224


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Batched MHA core. Shapes ``[B, H, L, Dh]`` -> ``[B, H, Lq, Dh]``.

    ``impl``: 'xla' | 'pallas' | 'auto' (self-attention at L >=
    _PALLAS_MIN_LEN on TPU takes the fused Pallas kernel, everything else
    the XLA path — per-length measured default)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto":
        impl = (
            "pallas"
            if (jax.default_backend() == "tpu"
                and q.shape[-2] == k.shape[-2]
                and q.shape[-2] >= _PALLAS_MIN_LEN)
            else "xla"
        )
    if impl == "pallas":
        return _pallas_attention(q, k, v, causal, scale)
    return _xla_attention(q, k, v, causal, scale)


def _pallas_attention(q, k, v, causal: bool, scale: float) -> jax.Array:
    """Pallas kernel dispatch, mesh-aware.

    A bare ``pallas_call`` under GSPMD is a custom call the partitioner
    cannot shard: measured on an 8-device mesh it REPLICATES — every device
    all-gathers the full batch and runs the whole kernel (12 all-gathers in
    the compiled HLO). So under a multi-device mesh (the solver installs the
    tp.py activation context for every one) the kernel is wrapped in
    shard_map: batch over the data axes, heads over 'model' when TP is
    active — per-device kernels on local shards, zero collectives, matching
    how the XLA path's activations are already laid out. Shapes that don't
    divide the mesh fall back to the XLA path (always correct)."""
    from declip_tpu.ops.flash_attention import flash_attention
    from declip_tpu.parallel.tp import _ACT, in_manual_region

    mesh = _ACT["mesh"]
    if mesh is None or mesh.devices.size == 1 or in_manual_region(q):
        # single chip (bench, serving), no installed context, OR already
        # inside a shard_map body (the pp.py pipeline schedule): the arrays
        # are per-device local shards there and a nested shard_map over the
        # same mesh errors at trace time — run the bare kernel on the local
        # shard. No silent fallback: flash_attention itself switches to
        # interpret mode off-TPU, so any exception here is a real kernel
        # bug.
        return flash_attention(q, k, v, causal=causal, scale=scale)
    from jax.sharding import PartitionSpec as P

    da, ma = _ACT["data"], _ACT["model"]

    def _flat(a):
        # the data entry can nest tuples (multi-slice ('dcn','data') inside
        # the expert-mesh (data_axis, 'expert') pair) — P specs need it flat
        if a is None:
            return ()
        if isinstance(a, tuple):
            return tuple(x for n in a for x in _flat(n))
        return (a,)

    data_axes = _flat(da)
    data_size = 1
    for a in data_axes:
        data_size *= mesh.shape[a]
    if q.shape[0] % data_size:
        return _xla_attention(q, k, v, causal, scale)
    h_axis = None
    if ma is not None:
        if q.shape[1] % mesh.shape[ma]:
            # TP-active but heads don't divide: the head dim is (or will
            # be) 'model'-sharded by the surrounding matmuls — don't force
            # a head gather here, take the TP-validated XLA path
            return _xla_attention(q, k, v, causal, scale)
        h_axis = ma
    spec = P(data_axes if len(data_axes) > 1 else data_axes[0], h_axis)
    fn = functools.partial(flash_attention, causal=causal, scale=scale)
    return jax.shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, L, D] -> [B, H, L, D/H]"""
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, L, Dh] -> [B, L, H*Dh]"""
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)
