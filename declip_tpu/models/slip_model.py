"""SLIP model: CLIP + SimCLR image self-supervision branch.

Rebuilds prototype/model/slip.py: 3-view input (base + two strong augs split
from the channel axis, slip.py:248), a ``predictor_sim`` projection MLP
(hidden 4096 -> sim_dim 256, no output BN, slip.py:215) applied to the
pre-projection image feature, SimCLR NT-Xent over gathered embeddings
(computed in the loss layer).

The sim-head input is the tower's pre-projection feature (``return_feature``,
width-dim) for ViT; the pooled embedding for ResNet towers (which have no
separate pre-projection feature).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from declip_tpu.utils.registry import MODELS
from declip_tpu.models.clip_model import (
    LOGIT_SCALE_INIT,
    LOGIT_SCALE_MAX,
    _l14_defaults,
    build_towers,
    call_tower,
    l2_normalize,
)
from declip_tpu.models.heads import ProjectionMLP
from declip_tpu.models.resnet import ModifiedResNet, modified_resnet_R50
from declip_tpu.models.vit import visual_transformer_B32, visual_transformer_L14

Dtype = Any


class SLIP(nn.Module):
    visual: nn.Module
    text: nn.Module
    use_allgather: bool = True
    EDA: bool = True
    feature_dim: int = 1024
    sim_dim: int = 256
    forward_type: str = "split"
    return_sim: bool = True
    # SigLIP-style learnable pairwise-loss bias (see clip_model.CLIP)
    logit_bias_init: Any = None
    # None = reference init; SigLIP recipe: log 10 (see clip_model.CLIP)
    logit_scale_init: Any = None
    dtype: Dtype = jnp.float32

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
        if self.return_sim:
            self.predictor_sim = ProjectionMLP(
                hidden_dim=4096, out_dim=self.sim_dim, out_bn=False, dtype=self.dtype
            )

    def scale_value(self) -> jax.Array:
        return jnp.minimum(jnp.exp(self.logit_scale[0]), LOGIT_SCALE_MAX)

    def encode_image(self, image, *, train: bool = False, **kw):
        return call_tower(self.visual, image, train=train, **kw)

    def encode_text(self, tokens, **kw):
        return self.text(tokens, **kw)

    def _sim_feature(self, image, *, train: bool):
        if isinstance(self.visual, ModifiedResNet):
            return call_tower(self.visual, image, train=train)
        _, feature = self.visual(image, return_feature=True)
        return feature

    def __call__(self, batch: Dict[str, jax.Array], *, train: bool = True):
        images = batch["images"]  # [B, H, W, 9]: base + 2 aug views
        img_base, img_1, img_2 = jnp.split(images, 3, axis=-1)

        text_embed = self.text(batch["tokens"])
        image_embed = self.encode_image(img_base, train=train)

        out: Dict[str, Any] = {
            "image_embed": l2_normalize(image_embed),
            "text_embed": l2_normalize(text_embed, eps=1e-10),
            "logit_scale": self.scale_value(),
        }
        if self.logit_bias_init is not None:
            out["logit_bias"] = self.logit_bias[0]
        if self.return_sim:
            feat_1 = self._sim_feature(img_1, train=train)
            feat_2 = self._sim_feature(img_2, train=train)
            out["image_sim_1"] = self.predictor_sim(feat_1, train=train)
            out["image_sim_2"] = self.predictor_sim(feat_2, train=train)
        return out


@MODELS.register
def slip_res50(**kwargs) -> SLIP:
    visual, text, ck = build_towers(kwargs, modified_resnet_R50)
    return SLIP(visual=visual, text=text, **ck)


@MODELS.register
def slip_vitb32(**kwargs) -> SLIP:
    visual, text, ck = build_towers(kwargs, visual_transformer_B32)
    return SLIP(visual=visual, text=text, **ck)


@MODELS.register
def slip_vitl14(**kwargs) -> SLIP:
    visual, text, ck = build_towers(_l14_defaults(kwargs),
                                    visual_transformer_L14)
    return SLIP(visual=visual, text=text, **ck)
