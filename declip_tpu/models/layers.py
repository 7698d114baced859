"""Shared NN building blocks: LayerNorm, QuickGELU, MHA, transformer core.

Rebuilds the reference's transformer core
(prototype/model/image_encoder/base_transformer.py, byte-identical copy at
prototype/model/text_encoder/base_transformer.py) the TPU way:

- bf16 compute / fp32 params with fp32 LayerNorm statistics,
- a single fused qkv projection feeding the attention op (MXU-friendly),
- layer stacking via ``nn.scan`` (one compiled block body instead of L
  unrolled copies — much faster XLA compiles, natural per-layer remat
  replacing torch ``checkpoint_sequential``, base_transformer.py:66-73).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from declip_tpu.ops.attention import dot_product_attention, merge_heads, split_heads
from declip_tpu.parallel.tp import BATCH_ALL, DATA, MODEL, SEQ, constrain

Dtype = Any


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — reference QuickGELU (base_transformer.py:24-26)."""
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of compute dtype."""

    dtype: Dtype = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(
            epsilon=self.epsilon, dtype=jnp.float32, param_dtype=jnp.float32
        )(x.astype(jnp.float32))
        return y.astype(self.dtype)


def _normal_or_default(std: Optional[float]):
    if std is None:
        return nn.initializers.lecun_normal()
    return nn.initializers.normal(stddev=std)


class MultiHeadAttention(nn.Module):
    """Self/cross attention with fused qkv projection.

    Parameter layout: ``qkv`` Dense [D, 3D] (+bias) and ``out`` Dense [D, D]
    (+bias) — the converter maps torch's in_proj_weight/out_proj onto these.
    """

    num_heads: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    qkv_std: Optional[float] = None
    out_std: Optional[float] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, kv: Optional[jax.Array] = None, *, causal: bool = False
    ) -> jax.Array:
        d = x.shape[-1]
        qkv_proj = nn.Dense(
            3 * d,
            dtype=self.dtype,
            name="qkv",
            kernel_init=_normal_or_default(self.qkv_std),
        )
        if kv is None:
            q, k, v = jnp.split(qkv_proj(x), 3, axis=-1)
        else:
            # shared-projection cross attention: q from x, k/v from kv (used
            # by AttentionPool's pooled query, modified_resnet.py:75-94)
            q = jnp.split(qkv_proj(x), 3, axis=-1)[0]
            _, k, v = jnp.split(qkv_proj(kv), 3, axis=-1)
        # TP: heads split over 'model' (no-ops unless the solver installed
        # the activation-sharding context — see parallel/tp.py constrain)
        q = constrain(split_heads(q, self.num_heads), DATA, MODEL, None, None)
        k = constrain(split_heads(k, self.num_heads), DATA, MODEL, None, None)
        v = constrain(split_heads(v, self.num_heads), DATA, MODEL, None, None)
        o = dot_product_attention(q, k, v, causal=causal, impl=self.attn_impl)
        o = constrain(merge_heads(o), DATA, None, MODEL)
        out = nn.Dense(
            d,
            dtype=self.dtype,
            name="out",
            kernel_init=_normal_or_default(self.out_std),
        )(o)
        # sp: the row-parallel output enters a LayerNorm region — token axis
        # over 'model' turns the all-reduce into a reduce-scatter (SEQ is
        # replicated unless sequence parallelism is enabled)
        return constrain(out, DATA, SEQ, None)


class MlpBlock(nn.Module):
    """c_fc -> QuickGELU -> c_proj (4x expansion), reference mlp block."""

    dtype: Dtype = jnp.float32
    fc_std: Optional[float] = None
    proj_std: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        h = nn.Dense(
            4 * d,
            dtype=self.dtype,
            name="c_fc",
            kernel_init=_normal_or_default(self.fc_std),
        )(x)
        h = constrain(h, DATA, None, MODEL)  # TP: hidden over 'model'
        out = nn.Dense(
            d,
            dtype=self.dtype,
            name="c_proj",
            kernel_init=_normal_or_default(self.proj_std),
        )(quick_gelu(h))
        return constrain(out, DATA, SEQ, None)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (base_transformer.py:29-53).

    Init stds follow the reference scheme (text_transformer.py:120-129):
    qkv ~ N(0, w^-0.5), out/c_proj ~ N(0, w^-0.5 (2L)^-0.5), c_fc ~ N(0,(2w)^-0.5).
    """

    num_heads: int
    total_layers: int
    dtype: Dtype = jnp.float32
    causal: bool = False
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, _=None):
        """Scan-compatible signature: (carry, None) -> (carry, None)."""
        # TP: residual stream is batch-sharded, replicated over 'model' —
        # or token-sharded over 'model' under sequence parallelism (sp)
        x = constrain(x, DATA, SEQ, None)
        width = x.shape[-1]
        attn_std = width ** -0.5
        proj_std = (width ** -0.5) * ((2 * self.total_layers) ** -0.5)
        fc_std = (2 * width) ** -0.5
        x = x + MultiHeadAttention(
            self.num_heads,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            qkv_std=attn_std,
            out_std=proj_std,
            name="attn",
        )(LayerNorm(self.dtype, name="ln_1")(x), causal=self.causal)
        x = x + MlpBlock(
            self.dtype, fc_std=fc_std, proj_std=proj_std, name="mlp"
        )(LayerNorm(self.dtype, name="ln_2")(x))
        return x, None


class Transformer(nn.Module):
    """Stack of residual blocks, scanned over depth.

    ``remat=True`` replaces torch gradient checkpointing
    (base_transformer.py:66-73): each layer's activations are rematerialized
    in the backward pass, trading FLOPs for HBM.

    Parameters live under ``layers`` with a leading [L] axis from nn.scan.
    """

    width: int
    layers: int
    heads: int
    causal: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    # backward memory/recompute trade-off knob (measured on v5e, README):
    #   'policy' (default) — save MXU outputs w/o batch dims, recompute
    #       elementwise + attention probs (3.2x less backward memory);
    #   'dots'   — additionally save the [B,H,L,L] attention probs;
    #   'all'    — save everything (no recompute; scan still stores each
    #       layer's residuals — biggest memory).
    # remat=True (the reference `checkpoint:` kwarg) overrides with full
    # recompute.
    remat_policy: str = "policy"
    # lax.scan unroll factor over depth. Measured on v5e (README): FULL
    # unroll is +15% train throughput on CLIP ViT-B/32 vs the rolled loop
    # (XLA schedules/fuses across layer boundaries), while PARTIAL unroll
    # (2 or 4) is -22% — the leftover loop blocks cross-layer scheduling
    # and the bigger body defeats the rolled loop's cache locality.
    #   -1 (default) = auto: full unroll on accelerators, rolled on CPU
    #        (keeps test/dry-run compiles small and the CPU compile cache
    #        stable);  0 = always full;  >=1 = explicit factor.
    scan_unroll: int = -1

    def _resolve_unroll(self) -> int:
        if self.scan_unroll == 0:
            return self.layers
        if self.scan_unroll < 0:  # auto (see scan_unroll comment)
            return self.layers if jax.default_backend() != "cpu" else 1
        return self.scan_unroll

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        block = ResidualAttentionBlock
        if self.remat:
            # reference `checkpoint:` semantics: full activation remat
            # (torch checkpoint_sequential, base_transformer.py:66-73)
            block = nn.remat(block, prevent_cse=False)
        else:
            # default: save only MXU (matmul) outputs per layer; recompute
            # LayerNorm/GELU/softmax in backward. Under nn.scan the naive
            # policy saves ~370MB/layer of elementwise intermediates at
            # B=128 L=77 W=512 — this policy cuts transformer backward
            # memory 3.2x for a few percent of (VPU-only) recompute.
            policy = {
                "policy":
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                "dots": jax.checkpoint_policies.dots_saveable,
                "all": jax.checkpoint_policies.everything_saveable,
            }[self.remat_policy]
            block = nn.remat(block, prevent_cse=False, policy=policy)
        scanned = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.layers,
            unroll=self._resolve_unroll(),
            metadata_params={nn.PARTITION_NAME: "layers"},
        )
        mod = scanned(
            self.heads,
            total_layers=self.layers,
            dtype=self.dtype,
            causal=self.causal,
            attn_impl=self.attn_impl,
            name="layers",
        )
        # pipeline parallelism (parallel/pp.py): when the Solver installed a
        # pipeline context and the depth divides the stage count, run the
        # SAME stacked [L] params through the GPipe shard_map schedule
        # instead of the scan. Params/checkpoints are identical either way;
        # init always takes the scan path to create them.
        from declip_tpu.parallel.pp import pipeline_stages, pipeline_transformer
        if not self.is_initializing() and pipeline_stages(self.layers):
            stacked = self.scope.get_variable("params", "layers")
            return pipeline_transformer(
                stacked, x,
                ResidualAttentionBlock(
                    self.heads, total_layers=self.layers, dtype=self.dtype,
                    causal=self.causal, attn_impl=self.attn_impl),
                remat_policy="full" if self.remat else self.remat_policy,
                unroll=self._resolve_unroll(),
            )
        y, _ = mod(x, None)
        return y
