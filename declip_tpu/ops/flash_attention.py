"""Pallas fused attention for TPU.

Replaces the cuDNN MHA the reference leans on (base_transformer.py:33).
Workload note: every sequence in this framework is short (77 text tokens,
50/197 image patches), so classic flash *tiling* over keys is unnecessary —
the whole [L, L] score matrix for one (batch, head) fits comfortably in VMEM
(197x197 fp32 = 155KB). The win over XLA is fusing QK^T -> softmax -> PV in
VMEM so the [B, H, L, L] probability tensor never round-trips HBM.

Kernel: grid over (batch*heads); per program, one fused
load(q,k,v) -> scores(fp32) -> masked softmax -> out matmul. Sequence is
padded to the sublane multiple; padded KEY positions are masked to -inf
(padded query rows produce garbage that the caller slices off). Backward is
the standard recompute-probs flash backward, also one fused kernel.

Falls back to the XLA path off-TPU (ops/attention.py handles dispatch).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only exists on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, valid_len):
    # Matmul OPERANDS stay in the input dtype (bf16 on TPU) with fp32
    # accumulation via preferred_element_type — the MXU's native mode and
    # the same contraction dtype XLA uses for the unfused path. Measured
    # (experiments/attn_kernel_bench.py, L=257 B=32 H=16): throughput is a
    # WASH vs upcasting operands to fp32 first (fwd+bwd 1.63 vs 1.62 ms) —
    # this kernel is softmax/VPU-bound at these shapes, not MXU-bound —
    # so bf16 operands are kept for dtype parity with XLA, not speed.
    q = q_ref[0]  # [L, Dh]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [L, L] fp32
    L = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    mask = col < valid_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        mask = mask & (col <= row)
    s = jnp.where(mask, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale, causal, valid_len):
    # Same operand-dtype rule as the forward (see _fwd_kernel: measured
    # perf-neutral, kept for dtype parity with XLA). The softmax recompute
    # and the ds algebra stay fp32; p/ds are cast back to the operand
    # dtype only at the matmul boundary (standard bf16 flash backward).
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    dt = q.dtype

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    L = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    mask = col < valid_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        mask = mask & (col <= row)
    s = jnp.where(mask, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom

    dv = jax.lax.dot_general(
        p.astype(dt), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [L, Dh]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [L, L]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (jnp.where(mask, ds, 0.0) * scale).astype(dt)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(n: int, L: int, dh: int):
    return pl.BlockSpec(
        (1, L, dh), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM if _HAS_PLTPU else None,
    )


def _pad_lane(x, Lp: int, dp: int):
    bh, L, dh = x.shape
    return jnp.pad(x, ((0, 0), (0, Lp - L), (0, dp - dh)))


def _pads(q):
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    return _round_up(q.shape[1], sub), _round_up(q.shape[2], 128)


# The custom_vjp closes over UNPADDED [BH, L, Dh] tensors and pads inside
# each pass: saving the padded arrays instead costs real HBM in the layer
# stack — Dh=64 pads to the 128-lane tile, DOUBLING the q/k/v residuals
# held for backward (ViT-L/14 B=64: ~11GB of residuals, and custom_vjp
# residuals are opaque to jax.checkpoint, so remat can't recover them).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, causal: bool, scale: float, interpret: bool):
    return _flash_fwd(q, k, v, causal, scale, interpret)[0]


def _out_struct(shape, dtype, like):
    """ShapeDtypeStruct matching ``like``'s manual-axes varying set.

    Inside a ``check_vma=True`` shard_map body (the pp.py pipeline
    schedule) pallas_call outputs must declare their vma or tracing
    raises; outside one the vma set is empty and this is the plain
    struct."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _flash_fwd(q, k, v, causal, scale, interpret):
    # q,k,v: [BH, L, Dh] unpadded
    bh, L, dh = q.shape
    Lp, dp = _pads(q)
    qp, kp, vp = (_pad_lane(x, Lp, dp) for x in (q, k, v))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal,
                          valid_len=L),
        out_shape=_out_struct(qp.shape, q.dtype, qp),
        grid=(bh,),
        in_specs=[_specs(bh, Lp, dp)] * 3,
        out_specs=_specs(bh, Lp, dp),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :L, :dh], (q, k, v)


def _flash_bwd(causal, scale, interpret, res, g):
    q, k, v = res
    bh, L, dh = q.shape
    Lp, dp = _pads(q)
    qp, kp, vp, gp = (_pad_lane(x, Lp, dp) for x in (q, k, v, g))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, causal=causal,
                          valid_len=L),
        out_shape=[_out_struct(qp.shape, q.dtype, qp)] * 3,
        grid=(bh,),
        in_specs=[_specs(bh, Lp, dp)] * 4,
        out_specs=[_specs(bh, Lp, dp)] * 3,
        interpret=interpret,
    )(qp, kp, vp, gp)
    return tuple(d[:, :L, :dh] for d in (dq, dk, dv))


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """[B, H, L, Dh] fused attention. Pads L/Dh to TPU tiles internally."""
    b, h, L, dh = q.shape
    if scale is None:
        scale = dh ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def flat(x):
        return x.reshape(b * h, L, dh)

    out = _flash(flat(q), flat(k), flat(v), causal, scale, interpret)
    return out.reshape(b, h, L, dh)
