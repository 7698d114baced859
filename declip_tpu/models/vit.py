"""CLIP-style Vision Transformer.

Rebuilds prototype/model/image_encoder/visual_transformer.py: non-overlapping
patchify, class token + learned positional embedding, pre/post LayerNorm,
linear projection to the joint embedding space.

TPU notes:
- Patchify is a space-to-depth reshape + Dense instead of a strided conv —
  mathematically identical for kernel==stride, and it lowers to a single large
  MXU matmul instead of a convolution.
- ``freeze_conv1`` (hardcoded True in the reference, visual_transformer.py:12)
  is functional here: the model exposes ``frozen_param_paths()`` and the
  optimizer applies a zero-gradient mask — the JAX analogue of
  ``requires_grad=False``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from declip_tpu.models.layers import LayerNorm, Transformer

Dtype = Any


class VisualTransformer(nn.Module):
    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    checkpoint: bool = False  # reference kwarg name for activation remat
    remat_policy: str = "policy"  # policy|dots|all (models/layers.py)
    scan_unroll: int = -1  # depth unroll: -1 auto / 0 full / n (layers.py)
    freeze_conv1: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # MoE tower (beyond-reference; models/layers.py MoeMlpBlock). Config
    # form: image_encode: {moe: {num_experts: E, ...}} — expanded by the
    # factories below.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = True,  # no BN/dropout — accepted for a uniform
        return_dense: bool = False,  # encoder interface (ResNet needs it)
        return_feature: bool = False,
    ):
        """x: [B, H, W, 3] (NHWC) -> [B, embed_dim] (+ optional extras).

        Matches visual_transformer.py:56-84: dense = patch tokens before
        ln_post, feature = pre-projection CLS.
        """
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        p = self.patch_size
        if h % p or w % p:
            raise ValueError(
                f"input {h}x{w} is not a multiple of patch_size={p}")
        gh, gw = h // p, w // p
        g0 = self.input_resolution // p  # grid the pos-emb was trained at
        scale = self.width ** -0.5

        # space-to-depth patchify: [B,H,W,3] -> [B, gh*gw, p*p*3] -> Dense
        x = x.astype(self.dtype)
        x = x.reshape(b, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * 3)
        x = nn.Dense(
            self.width,
            use_bias=False,
            dtype=self.dtype,
            name="patch_embed",
            kernel_init=nn.initializers.lecun_normal(),
        )(x)

        cls = self.param(
            "class_embedding", nn.initializers.normal(stddev=scale), (self.width,)
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (g0 * g0 + 1, self.width),
        )
        if (gh, gw) != (g0, g0):
            # off-train-resolution input (e.g. CLSA multi-resolution strong
            # views): bilinearly interpolate the patch grid of the positional
            # embedding — standard ViT practice; exact no-op at (g0, g0)
            grid = pos[1:].reshape(g0, g0, self.width).astype(jnp.float32)
            grid = jax.image.resize(
                grid, (gh, gw, self.width), method="bilinear")
            pos = jnp.concatenate(
                [pos[:1].astype(jnp.float32),
                 grid.reshape(gh * gw, self.width)], axis=0)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.width)), x], axis=1
        )
        x = x + pos.astype(self.dtype)
        x = LayerNorm(self.dtype, name="ln_pre")(x)
        x = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            remat=self.checkpoint,
            remat_policy=self.remat_policy,
            scan_unroll=self.scan_unroll,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_aux_weight=self.moe_aux_weight,
            name="transformer",
        )(x)

        dense_feat = x[:, 1:, :]
        feature = LayerNorm(self.dtype, name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj", nn.initializers.normal(stddev=scale), (self.width, self.embed_dim)
        )
        out = feature @ proj.astype(self.dtype)

        ret = [out]
        if return_dense:
            ret.append(dense_feat)
        if return_feature:
            ret.append(feature)
        return ret[0] if len(ret) == 1 else tuple(ret)

    def frozen_param_paths(self) -> Tuple[str, ...]:
        """Param subtrees the optimizer must not update (freeze_conv1)."""
        return ("patch_embed",) if self.freeze_conv1 else ()


def visual_transformer_B32(**kwargs) -> VisualTransformer:
    defaults = dict(
        input_resolution=224, patch_size=32, width=768, layers=12, heads=12
    )
    defaults.update(kwargs)
    return VisualTransformer(**defaults)


def visual_transformer_B16(**kwargs) -> VisualTransformer:
    defaults = dict(
        input_resolution=224, patch_size=16, width=768, layers=12, heads=12
    )
    defaults.update(kwargs)
    return VisualTransformer(**defaults)


def visual_transformer_L14(**kwargs) -> VisualTransformer:
    """ViT-L/14 (beyond-reference scale — the reference ships only B-width
    factories, clip.py:149-165). OpenAI CLIP ViT-L/14 geometry: width 1024,
    24 layers, 16 heads; pairs with the 768-wide text tower defaults in
    clip_model.clip_vitl14."""
    defaults = dict(
        input_resolution=224, patch_size=14, width=1024, layers=24, heads=16
    )
    defaults.update(kwargs)
    return VisualTransformer(**defaults)
