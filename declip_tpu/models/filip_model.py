"""FILIP model: CLIP + token-wise late-interaction dense similarity.

Rebuilds prototype/model/filip.py: linear ``image_mapping``/``text_mapping``
heads to ``dense_embed_dim`` (filip.py:40-41), a separate dense logit scale
(filip.py:43-44), optional top-k token selection by cross-attention mass
(filip.py:78-87). The gathered max-mean late-interaction logits
(filip.py:96-105) are computed in declip_tpu.ops.filip_ops where the mesh is
known; this module returns the (normalized, optionally top-k-selected) dense
token features.

Like the reference (filip.py:118), the main text forward runs on MLM-masked
tokens when ``text_mask_type`` is set, and only view 1 of a two-view image
input is used (filip.py:111-112).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from declip_tpu.utils.registry import MODELS
from declip_tpu.models.clip_model import (
    LOGIT_SCALE_INIT,
    LOGIT_SCALE_MAX,
    _l14_defaults,
    build_towers,
    call_tower,
    compact_mlm,
    l2_normalize,
)
from declip_tpu.models.resnet import modified_resnet_R50
from declip_tpu.models.vit import visual_transformer_B32, visual_transformer_L14

Dtype = Any


def topk_token_select(feat_1: jax.Array, feat_2: jax.Array, k: int):
    """Select each side's top-k tokens by total cross-attention mass
    (filip.py:78-87). feats are [B, N, D], already normalized."""
    cross = jnp.einsum(
        "bnd,bmd->bnm", feat_1, feat_2, preferred_element_type=jnp.float32
    )
    _, id_1 = jax.lax.top_k(cross.sum(axis=2), k)  # [B, k]
    _, id_2 = jax.lax.top_k(cross.sum(axis=1), k)
    sel_1 = jnp.take_along_axis(feat_1, id_1[..., None], axis=1)
    sel_2 = jnp.take_along_axis(feat_2, id_2[..., None], axis=1)
    return sel_1, sel_2


class FILIP(nn.Module):
    visual: nn.Module
    text: nn.Module
    use_allgather: bool = True
    return_dense: bool = True
    text_mask_type: Any = None
    dense_mapping_image: int = 768
    dense_mapping_language: int = 512
    dense_embed_dim: int = 256
    select_topk: bool = False
    top_k: int = 16
    # accepted for reference-config compat (knobs of reference dead code)
    return_caption: bool = False
    return_nn_bank: bool = False
    nn_size: int = 2 ** 16
    nn_topk: int = 1
    EDA: bool = True
    feature_dim: int = 1024
    embed_dim: int = 768
    forward_type: str = "split"
    mask_rate: float = 0.75
    patch_number: int = 14
    text_mae_feature: bool = False
    return_simsiam: bool = False
    two_view: bool = False
    sparse: bool = False
    # see declip_model.DECLIP.mlm_max_positions
    mlm_max_positions: int = 24
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
        if self.return_dense:
            self.logit_scale_dense = self.param(
                "logit_scale_dense", nn.initializers.constant(LOGIT_SCALE_INIT), ()
            )
            self.image_mapping = nn.Dense(self.dense_embed_dim, dtype=self.dtype)
            self.text_mapping = nn.Dense(self.dense_embed_dim, dtype=self.dtype)
        if self.text_mask_type is not None:
            self.text_label_predictor = nn.Dense(
                self.text.vocab_size, dtype=self.dtype
            )

    def scale_value(self) -> jax.Array:
        return jnp.minimum(jnp.exp(self.logit_scale[0]), LOGIT_SCALE_MAX)

    def encode_image(self, image, *, train: bool = False, **kw):
        return call_tower(self.visual, image, train=train, **kw)

    def encode_text(self, tokens, **kw):
        return self.text(tokens, **kw)

    def encode_image_dense(self, image, *, train: bool = False):
        """Dense patch features for zero-shot late-interaction eval
        (filip.py:63-66)."""
        _, dense = call_tower(self.visual, image, train=train, return_dense=True)
        return self.image_mapping(dense)

    def encode_text_dense(self, tokens):
        """Dense token features for zero-shot late-interaction eval
        (filip.py:57-61)."""
        _, words = self.text(tokens, return_dense=True)
        return self.text_mapping(words)

    def __call__(self, batch: Dict[str, jax.Array], *, train: bool = True):
        images = batch["images"]
        if images.shape[-1] > 3:  # two-view input: use view 1 (filip.py:111-112)
            images = images[..., :3]

        mlm = self.text_mask_type is not None
        out: Dict[str, Any] = {}
        text_tokens = batch["mlm_tokens"] if mlm else batch["tokens"]
        text_embed, words = self.text(text_tokens, return_dense=True)
        if mlm:
            labels = batch["mlm_labels"]
            if self.mlm_max_positions and \
                    self.mlm_max_positions < words.shape[1]:
                words_mlm, labels = compact_mlm(
                    words, labels, self.mlm_max_positions)
            else:
                words_mlm = words
            out["mlm_logits"] = self.text_label_predictor(words_mlm)
            out["mlm_labels"] = labels

        image_embed, image_dense = call_tower(
            self.visual, images, train=train, return_dense=True
        )

        out["image_embed"] = l2_normalize(image_embed)
        out["text_embed"] = l2_normalize(text_embed, eps=1e-10)
        out["logit_scale"] = self.scale_value()
        if self.logit_bias_init is not None:
            out["logit_bias"] = self.logit_bias[0]

        if self.return_dense:
            dense_img = l2_normalize(self.image_mapping(image_dense))
            dense_txt = l2_normalize(self.text_mapping(words))
            out["dense_image"] = dense_img
            out["dense_text"] = dense_txt
            if self.select_topk:
                # reference semantics (filip.py:78-105): the QUERY side uses
                # ALL its own tokens; only the gathered/key side is top-k
                # selected. The loss pairs dense_image x gathered(sel_text)
                # and dense_text x gathered(sel_image).
                sel_img, sel_txt = topk_token_select(
                    dense_img, dense_txt, self.top_k
                )
            else:
                sel_img, sel_txt = dense_img, dense_txt
            out["dense_image_sel"] = sel_img
            out["dense_text_sel"] = sel_txt
            out["logit_scale_dense"] = jnp.exp(self.logit_scale_dense)
        return out


@MODELS.register
def filip_res50(**kwargs) -> FILIP:
    visual, text, ck = build_towers(kwargs, modified_resnet_R50)
    ck.setdefault("dense_mapping_image", 2048)
    return FILIP(visual=visual, text=text, **ck)


@MODELS.register
def filip_vitb32(**kwargs) -> FILIP:
    visual, text, ck = build_towers(kwargs, visual_transformer_B32)
    ck.setdefault("dense_mapping_image", 768)
    return FILIP(visual=visual, text=text, **ck)


@MODELS.register
def filip_vitl14(**kwargs) -> FILIP:
    visual, text, ck = build_towers(_l14_defaults(kwargs),
                                    visual_transformer_L14)
    return FILIP(visual=visual, text=text, **ck)
