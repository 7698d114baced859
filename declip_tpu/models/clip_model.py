"""CLIP dual-encoder base model.

Rebuilds prototype/model/clip.py. Key structural difference from the
reference: the model returns *local, normalized features* and the clamped
logit scale; the global-batch similarity logits are computed in the loss
layer (declip_tpu.ops.contrastive) where the mesh is known. The reference
instead all-gathers inside ``forward`` via a hand-written autograd op
(clip.py:25-49) — under pjit/SPMD that collective is inserted by XLA.

``use_allgather`` is accepted for config compatibility and forwarded to the
loss layer's decision to build global logits.
"""

from __future__ import annotations

import inspect
import os
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from declip_tpu.utils.registry import MODELS
from declip_tpu.models.resnet import modified_resnet_R50, modified_resnet_R101
from declip_tpu.models.text import text_transformers
from declip_tpu.models.vit import (
    visual_transformer_B32,
    visual_transformer_B16,
    visual_transformer_L14,
)

Dtype = Any

LOGIT_SCALE_INIT = float(np.log(1 / 0.07))
LOGIT_SCALE_MAX = 100.0


def l2_normalize(x: jax.Array, eps: float = 0.0) -> jax.Array:
    """Reference normalizes image features with no eps, text with +1e-10
    (clip.py:128-130)."""
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def compact_mlm(words: jax.Array, labels: jax.Array, max_positions: int):
    """Gather (up to) ``max_positions`` masked token positions ahead of the
    vocab-sized MLM projection.

    The reference projects ALL context positions to vocab size and lets
    CrossEntropy(ignore_index=-100) discard the unmasked rows
    (declip.py:326-334) — at vocab 49409 / B=128 that materializes a
    [B, 77, V] logits tensor (~1.9 GB fp32) of which only ~15% of rows carry
    gradient. A stable argsort puts the masked positions first (in sequence
    order); truncating to a static cap keeps the CE *bit-identical* whenever
    the per-sequence masked count <= max_positions (P(count > 24) < 1e-4 for
    15% masking of 77 tokens) while cutting MLM-head FLOPs and logits memory
    ~70%. Positions past the cap are dropped (documented delta).
    """
    masked = labels != -100
    order = jnp.argsort(
        jnp.logical_not(masked).astype(jnp.int32), axis=1, stable=True)
    order = order[:, :max_positions]
    words = jnp.take_along_axis(words, order[..., None], axis=1)
    labels = jnp.take_along_axis(labels, order, axis=1)
    return words, labels


def _takes_train(module: nn.Module) -> bool:
    # ResNet towers thread a `train` flag for BatchNorm; ViT/text do not.
    return "train" in inspect.signature(type(module).__call__).parameters


def call_tower(module: nn.Module, x: jax.Array, *, train: bool, **kw):
    if _takes_train(module):
        return module(x, train=train, **kw)
    return module(x, **kw)


class CLIP(nn.Module):
    visual: nn.Module
    text: nn.Module
    use_allgather: bool = True
    dtype: Dtype = jnp.float32
    # SigLIP-style learnable pairwise-loss bias (beyond-reference): set e.g.
    # ``clip: {logit_bias_init: -10}`` together with ``loss_impl: {type:
    # sigmoid|sigmoid_chunked|sigmoid_ring}``. None = no param (reference
    # checkpoint-key parity preserved).
    logit_bias_init: Optional[float] = None
    # None = reference init log(1/0.07) (clip.py:43); the SigLIP recipe sets
    # ``clip: {logit_scale_init: 2.302585}`` (= log 10, Zhai et al. 2023 §3.1)
    logit_scale_init: Optional[float] = None

    def setup(self):
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(
                LOGIT_SCALE_INIT if self.logit_scale_init is None
                else self.logit_scale_init), (1,)
        )
        if self.logit_bias_init is not None:
            self.logit_bias = self.param(
                "logit_bias",
                nn.initializers.constant(self.logit_bias_init), (1,))

    def scale_value(self) -> jax.Array:
        """exp(s) clamped to <=100 (clip.py:134); zero grad past the clamp."""
        return jnp.minimum(jnp.exp(self.logit_scale[0]), LOGIT_SCALE_MAX)

    def encode_image(self, image: jax.Array, *, train: bool = False, **kw):
        return call_tower(self.visual, image, train=train, **kw)

    def encode_text(self, tokens: jax.Array, **kw):
        return self.text(tokens, **kw)

    def __call__(self, batch: Dict[str, jax.Array], *, train: bool = True):
        images = batch["images"]
        if images.shape[-1] > 3:  # multi-view input: CLIP uses view 1 only
            images = images[..., :3]
        image_embed = self.encode_image(images, train=train)
        text_embed = self.encode_text(batch["tokens"])
        out = {
            "image_embed": l2_normalize(image_embed),
            "text_embed": l2_normalize(text_embed, eps=1e-10),
            "logit_scale": self.scale_value(),
        }
        if self.logit_bias_init is not None:
            out["logit_bias"] = self.logit_bias[0]
        return out


def resolve_bn_stats_groups(bn_world: int, *, use_sync_bn: bool = True,
                            bn_group_size: int = 1) -> int:
    """Map the reference's BN config knobs to a batch-group count.

    Mirrors modified_resnet.py:116-142: ``use_sync_bn: False`` binds plain
    nn.BatchNorm2d (per-rank stats; bn_group_size ignored); otherwise stats
    sync over contiguous groups of ``bn_group_size`` ranks. Returns the
    number of contiguous groups the global batch axis splits into (1 =
    global-batch stats)."""
    if use_sync_bn is False:
        return max(1, bn_world)
    if bn_group_size > 1 and bn_world > bn_group_size:
        if bn_world % bn_group_size:
            import logging

            logging.getLogger("declip_tpu").warning(
                "bn_group_size=%d does not divide the data-parallel world "
                "%d (the reference's simple_group_split would reject this "
                "too) — falling back to global-batch BN statistics.",
                bn_group_size, bn_world)
            return 1
        return bn_world // bn_group_size
    return 1


def build_towers(kwargs: dict, image_factory, *, default_text_width: int = 512):
    """Shared factory plumbing for all method models.

    Mirrors the reference factories (clip.py:149-165): kwargs carries
    ``image_encode``, ``text_encode`` and method kwargs under ``clip``.
    """
    from declip_tpu.tokenizer import get_tokenizer

    image_kwargs = dict(kwargs.get("image_encode") or {})
    text_kwargs = dict(kwargs.get("text_encode") or {})
    # MoE towers (beyond-reference, models/layers.py MoeMlpBlock): config
    # form ``image_encode/text_encode: {moe: {num_experts: E, top_k: K,
    # capacity_factor: C, aux_weight: W}}`` expands to the tower's moe_*
    # fields. Transformer towers only — a moe dict on a ResNet tower fails
    # loudly in the factory (unknown kwarg).
    for tk in (image_kwargs, text_kwargs):
        moe = tk.pop("moe", None)
        if moe:
            tk["moe_experts"] = int(moe.get("num_experts", 0))
            for src, dst in (("top_k", "moe_top_k"),
                             ("capacity_factor", "moe_capacity_factor"),
                             ("aux_weight", "moe_aux_weight")):
                if src in moe:
                    tk[dst] = moe[src]
    # use_sync_bn/bn_group_size/bn_sync_stats (declip88m configs,
    # modified_resnet.py:116-142) resolve to per-group batch statistics
    # inside the jitted SPMD step (BatchNorm.stats_groups, models/resnet.py):
    # with the global batch laid out rank-contiguously over the 'data' mesh
    # axis, reshape-grouped moments reproduce the reference's semantics
    # exactly — use_sync_bn: False is plain per-rank BatchNorm2d
    # (modified_resnet.py:141-142, bn_group_size is then IGNORED like the
    # reference ignores it), use_sync_bn: True + bn_group_size: G is grouped
    # SyncBN over world/G contiguous rank groups (simple_group_split,
    # dist.py:39-46). The data-parallel world is injected by the caller as
    # ``bn_world`` (the solver passes its mesh's data ways; plain
    # single-device builds default to 1 = global stats, which IS SyncBN
    # group==world there). Parity: tests/test_grouped_bn.py.
    bn_world = int(image_kwargs.pop("bn_world", 1) or 1)
    if ("use_sync_bn" in image_kwargs or "bn_group_size" in image_kwargs
            ) and not image_kwargs.get("bn_axis_name"):
        image_kwargs.setdefault(
            "bn_stats_groups",
            resolve_bn_stats_groups(
                bn_world,
                use_sync_bn=image_kwargs.get("use_sync_bn", True),
                bn_group_size=int(image_kwargs.get("bn_group_size") or 1)))
    dtype = kwargs.get("dtype", jnp.float32)
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    image_kwargs.setdefault("dtype", dtype)
    text_kwargs.setdefault("dtype", dtype)
    encode_type = text_kwargs.get("text_encode_type") or "Transformer"
    if "vocab_size" not in text_kwargs and encode_type == "Transformer":
        bpe_path = text_kwargs.get("bpe_path")
        if bpe_path is not None and not os.path.exists(bpe_path):
            bpe_path = None  # reference configs carry cluster-relative paths
        text_kwargs["bpe_path"] = bpe_path
        text_kwargs["vocab_size"] = get_tokenizer(bpe_path).vocab_size
    visual = image_factory(**image_kwargs)
    text = text_transformers(**text_kwargs)
    clip_kwargs = dict(kwargs.get("clip") or {})
    clip_kwargs["dtype"] = dtype
    return visual, text, clip_kwargs


@MODELS.register
def clip_res50(**kwargs) -> CLIP:
    visual, text, ck = build_towers(kwargs, modified_resnet_R50)
    return CLIP(visual=visual, text=text, **ck)


@MODELS.register
def clip_res101(**kwargs) -> CLIP:
    visual, text, ck = build_towers(kwargs, modified_resnet_R101)
    return CLIP(visual=visual, text=text, **ck)


@MODELS.register
def clip_vitb32(**kwargs) -> CLIP:
    visual, text, ck = build_towers(kwargs, visual_transformer_B32)
    return CLIP(visual=visual, text=text, **ck)


@MODELS.register
def clip_vitb16(**kwargs) -> CLIP:
    visual, text, ck = build_towers(kwargs, visual_transformer_B16)
    return CLIP(visual=visual, text=text, **ck)


def _l14_defaults(kwargs: dict) -> dict:
    """ViT-L/14 tower pairing (OpenAI CLIP geometry): 768-dim joint space,
    768-wide/12-head text tower. Beyond-reference — the reference ships only
    B-width factories (clip.py:149-165)."""
    kwargs = dict(kwargs)
    ie = dict(kwargs.get("image_encode") or {})
    ie.setdefault("embed_dim", 768)
    kwargs["image_encode"] = ie
    te = dict(kwargs.get("text_encode") or {})
    te.setdefault("embed_dim", 768)
    te.setdefault("transformer_width", 768)
    te.setdefault("transformer_heads", 12)
    kwargs["text_encode"] = te
    return kwargs


@MODELS.register
def clip_vitl14(**kwargs) -> CLIP:
    visual, text, ck = build_towers(_l14_defaults(kwargs),
                                    visual_transformer_L14)
    return CLIP(visual=visual, text=text, **ck)


@MODELS.register
def clip_vitl14_336(**kwargs) -> CLIP:
    """OpenAI CLIP's high-res variant: 336px / 14px patches -> 577 image
    tokens, the deepest sequence any tower here runs (attn_impl 'auto'
    routes it to the fused Pallas kernel on TPU)."""
    kwargs = _l14_defaults(kwargs)
    kwargs["image_encode"].setdefault("input_resolution", 336)
    visual, text, ck = build_towers(kwargs, visual_transformer_L14)
    return CLIP(visual=visual, text=text, **ck)
