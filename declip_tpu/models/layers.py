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

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from declip_tpu.ops.attention import dot_product_attention, merge_heads, split_heads
from declip_tpu.parallel.tp import BATCH_ALL, DATA, EXPERT, MODEL, SEQ, constrain

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
    attn_impl: str = "auto"
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


class MoeMlpBlock(nn.Module):
    """Mixture-of-Experts replacement for :class:`MlpBlock`.

    Beyond-reference capability (the reference has no MoE; this is the
    sparse-scaling analogue of its dense towers): GShard/Switch-style
    token-choice top-k routing with a static per-expert capacity, built
    entirely from dense one-hot einsums — no sorts on the hot path, static
    shapes, every FLOP lands on the MXU, which is the TPU-native
    formulation (Lepikhin et al., arXiv:2006.16668; Fedus et al.,
    arXiv:2101.03961).

    Per token: router logits (fp32) -> softmax -> top-k experts with
    renormalized gates. Each expert owns a ``capacity = ceil(k * n_tokens /
    num_experts * capacity_factor)`` token buffer; overflow tokens are
    dropped from the expert path (the residual connection still carries
    them — standard capacity semantics). Dispatch/combine are [n, E, C]
    one-hot tensors; expert FFNs are batched [E, D, H] / [E, H, D] einsums.

    Expert parallelism: the [E, ...] tensors carry EXPERT activation pins
    and the params shard over an 'expert' mesh axis (``parallelism:
    {ep: N}``, parallel/tp.py rules) — XLA inserts the dispatch/return
    all-to-alls across the expert groups.

    The auxiliary load-balance loss (Switch eq. 4: ``E * Σ_e f_e · P_e``
    with f from the top-1 assignments) is returned to the caller;
    :class:`Transformer` sows the depth-summed value into the ``"moe"``
    collection, which the train step folds into the total loss.
    """

    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dtype: Dtype = jnp.float32
    fc_std: Optional[float] = None
    proj_std: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        b, t, d = x.shape
        n, e, h = b * t, self.num_experts, 4 * x.shape[-1]
        k = min(self.top_k, e)
        cap = min(n, max(1, math.ceil(k * n * self.capacity_factor / e)))
        xf = x.reshape(n, d)

        router = self.param(
            "router", nn.initializers.normal(stddev=d ** -0.5), (d, e),
            jnp.float32)
        # routing decisions in fp32 at full precision — tiny [n,d]x[d,e]
        # matmul, and bf16 logit ties would make expert choice hardware-
        # dependent
        logits = jnp.dot(xf.astype(jnp.float32), router,
                         precision=jax.lax.Precision.HIGHEST)
        probs = jax.nn.softmax(logits, axis=-1)  # [n, E]

        combine = jnp.zeros((n, e, cap), jnp.float32)
        taken = jnp.zeros((e,), jnp.int32)  # capacity slots consumed
        remaining = probs
        gate_sum = jnp.zeros((n,), jnp.float32)
        first_choice = None
        for _ in range(k):
            idx = jnp.argmax(remaining, axis=-1)  # [n]
            if first_choice is None:
                first_choice = idx
            onehot = jax.nn.one_hot(idx, e, dtype=jnp.int32)
            # position of each token inside its chosen expert's buffer:
            # running count of earlier tokens choosing the same expert this
            # pass, offset by slots consumed in earlier passes
            pos = jnp.cumsum(onehot, axis=0) - onehot + taken  # [n, E]
            keep = (pos < cap) & (onehot > 0)
            gate = jnp.take_along_axis(probs, idx[:, None], axis=-1)[:, 0]
            slot = jax.nn.one_hot(jnp.clip(pos, 0, cap - 1), cap,
                                  dtype=jnp.float32) * keep[..., None]
            combine = combine + gate[:, None, None] * slot
            gate_sum = gate_sum + gate * jnp.any(keep, axis=-1)
            taken = taken + jnp.sum(onehot * keep, axis=0)
            remaining = remaining * (1 - onehot)
        # renormalize the k gates per token (dropped slots excluded); a
        # fully dropped token contributes zero and rides the residual
        combine = combine / jnp.maximum(gate_sum, 1e-9)[:, None, None]
        dispatch = (combine > 0).astype(self.dtype)

        wi = self.param("wi", _normal_or_default(self.fc_std), (e, d, h))
        bi = self.param("bi", nn.initializers.zeros, (e, h))
        wo = self.param("wo", _normal_or_default(self.proj_std), (e, h, d))
        bo = self.param("bo", nn.initializers.zeros, (e, d))

        xin = jnp.einsum("nec,nd->ecd", dispatch, xf.astype(self.dtype))
        xin = constrain(xin, EXPERT, None, None)
        hid = jnp.einsum("ecd,edh->ech", xin, wi.astype(self.dtype))
        hid = quick_gelu(hid + bi[:, None].astype(self.dtype))
        hid = constrain(hid, EXPERT, None, None)
        out = jnp.einsum("ech,ehd->ecd", hid, wo.astype(self.dtype))
        out = out + bo[:, None].astype(self.dtype)
        out = constrain(out, EXPERT, None, None)
        y = jnp.einsum("nec,ecd->nd", combine.astype(self.dtype), out)

        # Switch load-balance loss: fraction of tokens whose FIRST choice
        # is e  x  mean router prob on e, scaled by E (==1 at uniform)
        frac = jnp.mean(jax.nn.one_hot(first_choice, e, dtype=jnp.float32),
                        axis=0)
        aux = e * jnp.sum(frac * jnp.mean(probs, axis=0))
        return constrain(y.reshape(b, t, d), DATA, SEQ, None), aux


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (base_transformer.py:29-53).

    Init stds follow the reference scheme (text_transformer.py:120-129):
    qkv ~ N(0, w^-0.5), out/c_proj ~ N(0, w^-0.5 (2L)^-0.5), c_fc ~ N(0,(2w)^-0.5).
    """

    num_heads: int
    total_layers: int
    dtype: Dtype = jnp.float32
    causal: bool = False
    attn_impl: str = "auto"
    # MoE knobs (0 = dense reference MLP; see MoeMlpBlock)
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x: jax.Array, _=None):
        """Scan-compatible signature: (carry, None) -> (carry, aux|None)."""
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
        x2 = LayerNorm(self.dtype, name="ln_2")(x)
        if self.moe_experts:
            y, aux = MoeMlpBlock(
                self.moe_experts, top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor, dtype=self.dtype,
                fc_std=fc_std, proj_std=proj_std, name="moe",
            )(x2)
            return x + y, aux
        x = x + MlpBlock(
            self.dtype, fc_std=fc_std, proj_std=proj_std, name="mlp"
        )(x2)
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
    attn_impl: str = "auto"
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
    # MoE (every-layer token-choice routing; see MoeMlpBlock). 0 = dense.
    # The depth-summed Switch aux loss is sown into the "moe" collection
    # (scaled by moe_aux_weight); the train step adds it to the total loss.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01

    def _resolve_unroll(self) -> int:
        if self.scan_unroll == 0:
            return self.layers
        if self.scan_unroll < 0:  # auto (see scan_unroll comment)
            return self.layers if jax.default_backend() != "cpu" else 1
        return self.scan_unroll

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        block = ResidualAttentionBlock
        # prevent_cse: inside a ROLLED lax.scan the loop structure already
        # stops XLA from CSE-merging the backward recompute with saved
        # forward values, so barriers would only hurt scheduling. But under
        # the full/partial-unroll default (scan_unroll auto -> full on TPU)
        # the bodies are inlined and CSE silently DEFEATS the remat —
        # measured: ViT-L/14 B=64 `checkpoint: True` compiled to the same
        # 17.8GB as no-remat. Emit barriers whenever bodies are unrolled.
        prevent_cse = self._resolve_unroll() > 1
        if self.remat:
            # reference `checkpoint:` semantics: full activation remat
            # (torch checkpoint_sequential, base_transformer.py:66-73)
            block = nn.remat(block, prevent_cse=prevent_cse)
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
            # The CSE hazard exists here too, but the trade is OPPOSITE to
            # the full-remat branch: measured on chip (v5e, B=128/B=32
            # defaults), emitting barriers in this default policy branch
            # costs 3.5-8% step throughput on EVERY model (DeCLIP-R50
            # 729.9->696.3, CLIP B/32 2008.6->1883.7, DeCLIP B/32
            # 969.9->891.5, ViT-L/14 156.9->151.3 pairs/s) because the
            # optimization_barriers fence XLA's elementwise fusion across
            # layer boundaries — while the memory the policy remat protects
            # (~VPU intermediates) is NOT load-bearing at default batch
            # sizes. Let CSE keep the fused/faster program here; when
            # activation memory actually binds, users set `checkpoint: true`
            # (full remat, barrier-protected above) — that path was the
            # measured ViT-L/14 B=64 17.8GB bug, and it keeps its barriers.
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
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            name="layers",
        )
        # pipeline parallelism (parallel/pp.py): when the Solver installed a
        # pipeline context and the depth divides the stage count, run the
        # SAME stacked [L] params through the GPipe shard_map schedule
        # instead of the scan. Params/checkpoints are identical either way;
        # init always takes the scan path to create them.
        from declip_tpu.parallel.pp import pipeline_stages, pipeline_transformer
        if not self.is_initializing() and pipeline_stages(self.layers):
            if self.moe_experts:
                raise NotImplementedError(
                    "parallelism: pp does not compose with MoE towers yet")
            stacked = self.scope.get_variable("params", "layers")
            return pipeline_transformer(
                stacked, x,
                ResidualAttentionBlock(
                    self.heads, total_layers=self.layers, dtype=self.dtype,
                    causal=self.causal, attn_impl=self.attn_impl),
                remat_policy="full" if self.remat else self.remat_policy,
                unroll=self._resolve_unroll(),
            )
        y, aux = mod(x, None)
        if self.moe_experts and not self.is_initializing():
            # [L] stacked per-layer aux -> one scalar; the train step sums
            # the mutated "moe" collection into the loss (no-op whenever
            # the collection is not mutable: eval/inference applies)
            self.sow("moe", "aux_loss",
                     self.moe_aux_weight * jnp.sum(aux),
                     reduce_fn=lambda a, b: a + b, init_fn=lambda: 0.0)
        return y
