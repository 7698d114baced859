"""DeFILIP model: the full DeCLIP recipe + FILIP dense late interaction.

Rebuilds prototype/model/defilip.py (which is a copy of declip.py plus the
``return_filip`` dense head, defilip.py:178-183). Behavior notes mirrored
exactly:
- Main text forward on MLM-masked tokens; the AUG text forward is unmasked
  but returns dense word features for the dense head (defilip.py:290-292).
- Both image views produce dense patch features (defilip.py:309-312); the
  primary dense logits pair view1 x text, with optional ``dense_aug`` 4-way
  combinations (defilip.py:329-339, 400-403) computed in the loss layer.
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
from declip_tpu.models.filip_model import topk_token_select
from declip_tpu.models.heads import PredictionMLP, ProjectionMLP
from declip_tpu.models.vit import visual_transformer_B32, visual_transformer_L14

Dtype = Any


class DEFILIP(nn.Module):
    visual: nn.Module
    text: nn.Module
    use_allgather: bool = True
    nn_size: int = 2 ** 16
    nn_topk: int = 1
    return_dense: bool = False
    return_simsiam_text: bool = False
    return_simsiam_nn_text: bool = False
    return_caption: bool = False
    return_nn_bank: bool = False
    text_mask_type: Any = None
    EDA: bool = True
    feature_dim: int = 1024
    forward_type: str = "split"
    return_filip: bool = True
    dense_embed_dim: int = 256
    dense_mapping_image: int = 768
    dense_mapping_language: int = 512
    dense_aug: bool = False
    select_topk: bool = True
    top_k: int = 16
    # see declip_model.DECLIP.mlm_max_positions
    mlm_max_positions: int = 24
    # single-[2B]-call view fusion (text passes + ViT image views); see
    # declip_model.DECLIP.fuse_views for semantics and the measured default
    fuse_views: bool = False
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
        self.projector = ProjectionMLP(dtype=self.dtype)
        self.predictor = PredictionMLP(dtype=self.dtype)
        if self.text_mask_type is not None:
            self.text_label_predictor = nn.Dense(
                self.text.vocab_size, dtype=self.dtype
            )
        if self.return_simsiam_nn_text:
            self.projector_nn_text = ProjectionMLP(dtype=self.dtype)
            self.predictor_nn_text = PredictionMLP(dtype=self.dtype)
        if self.return_filip:
            self.logit_scale_dense = self.param(
                "logit_scale_dense", nn.initializers.constant(LOGIT_SCALE_INIT), ()
            )
            self.image_mapping = nn.Dense(self.dense_embed_dim, dtype=self.dtype)
            self.text_mapping = nn.Dense(self.dense_embed_dim, dtype=self.dtype)

    def scale_value(self) -> jax.Array:
        return jnp.minimum(jnp.exp(self.logit_scale[0]), LOGIT_SCALE_MAX)

    def encode_image(self, image, *, train: bool = False, **kw):
        return call_tower(self.visual, image, train=train, **kw)

    def encode_text(self, tokens, **kw):
        return self.text(tokens, **kw)

    def encode_image_dense(self, image, *, train: bool = False):
        _, dense = call_tower(self.visual, image, train=train, return_dense=True)
        return self.image_mapping(dense)

    def encode_text_dense(self, tokens):
        _, words = self.text(tokens, return_dense=True)
        return self.text_mapping(words)

    def project_nn_text(self, feats):
        """See declip_model.project_nn_text."""
        return self.projector_nn_text(feats, train=False)

    def __call__(self, batch: Dict[str, jax.Array], *, train: bool = True):
        images = batch["images"]
        img1, img2 = jnp.split(images, 2, axis=-1)

        mlm = self.text_mask_type is not None
        out: Dict[str, Any] = {}
        # both text passes fuse into one [2B, L] tower call when the tower
        # is the LayerNorm-only dense TextTransformer — per-row numerics and
        # grads are unchanged vs the reference's two calls (gating rationale
        # in declip_model.py)
        fuse_text = (self.fuse_views
                     and type(self.text).__name__ == "TextTransformer"
                     and not getattr(self.text, "moe_experts", 0))
        b = batch["tokens_aug"].shape[0]
        if mlm:
            if fuse_text:
                both, words2 = self.text(
                    jnp.concatenate(
                        [batch["mlm_tokens"], batch["tokens_aug"]], 0),
                    return_dense=True)
                text_embed, text_embed_aug = both[:b], both[b:]
                # aug text: unmasked, dense (defilip.py:292)
                words, words_aug = words2[:b], words2[b:]
            else:
                text_embed, words = self.text(
                    batch["mlm_tokens"], return_dense=True)
                text_embed_aug, words_aug = self.text(
                    batch["tokens_aug"], return_dense=True)
            labels = batch["mlm_labels"]
            if self.mlm_max_positions and \
                    self.mlm_max_positions < words.shape[1]:
                words_mlm, labels = compact_mlm(
                    words, labels, self.mlm_max_positions)
            else:
                words_mlm = words
            out["mlm_logits"] = self.text_label_predictor(words_mlm)
            out["mlm_labels"] = labels
        elif fuse_text:
            both, words2 = self.text(
                jnp.concatenate([batch["tokens"], batch["tokens_aug"]], 0),
                return_dense=True)
            text_embed, text_embed_aug = both[:b], both[b:]
            words_aug = words2[b:]
            words = None
        else:
            text_embed = self.text(batch["tokens"])
            text_embed_aug, words_aug = self.text(
                batch["tokens_aug"], return_dense=True)
            words = None

        # DeFILIP is ViT-only (LayerNorm towers): both views fuse into one
        # [2B] pass — numerics/grads per row unchanged (see declip_model.py)
        fuse_img = (self.fuse_views
                    and type(self.visual).__name__ == "VisualTransformer"
                    and not getattr(self.visual, "moe_experts", 0))
        if self.return_filip:
            if fuse_img:
                emb2, dense2 = self.encode_image(
                    jnp.concatenate([img1, img2], 0), train=train,
                    return_dense=True)
                image_embed_1, image_embed_2 = emb2[:b], emb2[b:]
                image_dense_1, image_dense_2 = dense2[:b], dense2[b:]
            else:
                image_embed_1, image_dense_1 = self.encode_image(
                    img1, train=train, return_dense=True
                )
                image_embed_2, image_dense_2 = self.encode_image(
                    img2, train=train, return_dense=True
                )
        elif fuse_img:
            emb2 = self.encode_image(
                jnp.concatenate([img1, img2], 0), train=train)
            image_embed_1, image_embed_2 = emb2[:b], emb2[b:]
        else:
            image_embed_1 = self.encode_image(img1, train=train)
            image_embed_2 = self.encode_image(img2, train=train)

        z1 = self.projector(image_embed_1, train=train)
        z2 = self.projector(image_embed_2, train=train)
        out["simsiam"] = (
            self.predictor(z1, train=train),
            z1,
            self.predictor(z2, train=train),
            z2,
        )

        out["image_embed_1"] = l2_normalize(image_embed_1)
        out["image_embed_2"] = l2_normalize(image_embed_2)
        out["text_embed"] = l2_normalize(text_embed, eps=1e-10)
        out["text_embed_aug"] = l2_normalize(text_embed_aug, eps=1e-10)
        out["logit_scale"] = self.scale_value()
        if self.logit_bias_init is not None:
            out["logit_bias"] = self.logit_bias[0]

        if self.return_simsiam_text:
            z1t = self.projector(out["text_embed"], train=train)
            z2t = self.projector(out["text_embed_aug"], train=train)
            out["text_simsiam"] = (
                self.predictor(z1t, train=train),
                z1t,
                self.predictor(z2t, train=train),
                z2t,
            )
        if self.return_simsiam_nn_text:
            z_text = self.projector_nn_text(out["text_embed"], train=train)
            out["nn_simsiam_p_text"] = self.predictor_nn_text(
                z_text, train=train)

        if self.return_filip:
            # word features for the dense head: masked main text (the
            # reference maps word_features from the MLM forward,
            # defilip.py:330-333) and the unmasked aug text.
            d_img_1 = l2_normalize(self.image_mapping(image_dense_1))
            d_img_2 = l2_normalize(self.image_mapping(image_dense_2))
            d_txt = l2_normalize(self.text_mapping(words if words is not None else words_aug))
            d_txt_aug = l2_normalize(self.text_mapping(words_aug))
            out["dense_image_1"], out["dense_text"] = d_img_1, d_txt
            if self.select_topk:
                # query side keeps all tokens; only the gathered side is
                # top-k selected (filip.py:78-105, see filip_model.py)
                s_img_1, s_txt = topk_token_select(d_img_1, d_txt, self.top_k)
            else:
                s_img_1, s_txt = d_img_1, d_txt
            out["dense_image_1_sel"], out["dense_text_sel"] = s_img_1, s_txt
            if self.dense_aug:
                out["dense_image_2"], out["dense_text_aug"] = d_img_2, d_txt_aug
                # the reference selects tokens FRESH per pairing — each of
                # the 4 get_weighted_dense_logits calls (defilip.py:336-339)
                # ranks tokens by cross-attention mass against THAT
                # pairing's other side, so (i2, t)'s text selection differs
                # from (i1, t)'s. Emit the three aug pairings' selections.
                if self.select_topk:
                    sel = lambda a, b: topk_token_select(a, b, self.top_k)  # noqa: E731
                else:
                    sel = lambda a, b: (a, b)  # noqa: E731
                out["dense_sel_i2_t"] = sel(d_img_2, d_txt)
                out["dense_sel_i1_ta"] = sel(d_img_1, d_txt_aug)
                out["dense_sel_i2_ta"] = sel(d_img_2, d_txt_aug)
            out["logit_scale_dense"] = jnp.exp(self.logit_scale_dense)
        return out


@MODELS.register
def defilip_vitb32(**kwargs) -> DEFILIP:
    visual, text, ck = build_towers(kwargs, visual_transformer_B32)
    ck.setdefault("dense_mapping_image", 768)
    return DEFILIP(visual=visual, text=text, **ck)


@MODELS.register
def defilip_vitl14(**kwargs) -> DEFILIP:
    visual, text, ck = build_towers(_l14_defaults(kwargs),
                                    visual_transformer_L14)
    return DEFILIP(visual=visual, text=text, **ck)
