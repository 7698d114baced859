"""DeCLIP model: CLIP + SimSiam two-view image SS + MLM text SS + hooks for
NN-bank supervision.

Rebuilds prototype/model/declip.py. Structural deltas for the TPU build:
- EDA happens in the data pipeline; the batch carries ``tokens_aug``
  (vs declip.py:203-212's in-forward Python loop).
- MLM masking happens in the data pipeline; the batch carries ``mlm_tokens``
  (masked ids, used for the main text forward exactly as the reference does)
  and ``mlm_labels`` (-100 padded). The model returns MLM *logits*; the CE
  lives in the loss layer (vs declip.py:326-334).
- The NN memory bank is train-step state (declip_tpu.models.memory_bank);
  the model only provides the feature dict plus the optional nn-simsiam
  projector heads.
- All-gather + logits live in the loss layer.
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
from declip_tpu.models.heads import PredictionMLP, ProjectionMLP
from declip_tpu.models.resnet import modified_resnet_R50, modified_resnet_R101
from declip_tpu.models.vit import (
    visual_transformer_B32,
    visual_transformer_B16,
    visual_transformer_L14,
)

Dtype = Any


class DECLIP(nn.Module):
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
    # static cap on MLM positions per sequence: the vocab projection runs
    # only on the masked positions (clip_model.compact_mlm). 0/None = the
    # reference's full [B, L, vocab] logits.
    mlm_max_positions: int = 24
    # fuse the two text passes (and, under a ViT tower, the two image views)
    # into single [2B] tower calls. Numerically identical per row for
    # LayerNorm-only towers, but measured SLOWER on v5e — DeCLIP-R50 691 vs
    # 726 pairs/s (text fusion only), DeCLIP ViT-B/32 849 vs 968 (text +
    # image fusion), both paired A/B at B=128: XLA interleaves two
    # independent B-sized tower instances (MXU work hides the HBM-bound
    # phases of the other), while one 2B pass serializes its own phases.
    # Default off; kept as a knob for other hardware/XLA versions.
    # Auto-disabled for MoE towers (batch-coupled router capacity/aux loss)
    # and HF text backends.
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

    def scale_value(self) -> jax.Array:
        return jnp.minimum(jnp.exp(self.logit_scale[0]), LOGIT_SCALE_MAX)

    def encode_image(self, image, *, train: bool = False, **kw):
        return call_tower(self.visual, image, train=train, **kw)

    def encode_text(self, tokens, **kw):
        return self.text(tokens, **kw)

    def __call__(self, batch: Dict[str, jax.Array], *, train: bool = True):
        images = batch["images"]  # [B, H, W, 6] two stacked views (NHWC)
        img1, img2 = jnp.split(images, 2, axis=-1)

        mlm = self.text_mask_type is not None
        out: Dict[str, Any] = {}
        # fuse_views: the main and EDA-augmented captions run through the
        # SAME LayerNorm-only text tower, so both passes can fuse into one
        # [2B, L] call with unchanged per-row numerics/grads vs the
        # reference's two calls (declip.py:214-222). See the field docstring
        # for why the default is OFF (measured slower on v5e).
        fuse_text = (self.fuse_views
                     and type(self.text).__name__ == "TextTransformer"
                     and not getattr(self.text, "moe_experts", 0))
        b = batch["tokens_aug"].shape[0]
        if mlm:
            # main text forward runs on MASKED tokens (declip.py:214-216)
            if fuse_text:
                both, words2 = self.text(
                    jnp.concatenate(
                        [batch["mlm_tokens"], batch["tokens_aug"]], 0),
                    return_dense=True)
                text_embed, text_embed_aug = both[:b], both[b:]
                words = words2[:b]
            else:
                text_embed, words = self.text(
                    batch["mlm_tokens"], return_dense=True)
                text_embed_aug = self.text(batch["tokens_aug"])
            labels = batch["mlm_labels"]
            if self.mlm_max_positions and \
                    self.mlm_max_positions < words.shape[1]:
                words_mlm, labels = compact_mlm(
                    words, labels, self.mlm_max_positions)
            else:
                words_mlm = words
            # TP: the vocab head is the biggest matmul in the step but its
            # [W, 49409] kernel can't weight-shard (vocab not divisible;
            # row-parallel would all-reduce [B, P, vocab]) — instead split
            # its FLOPs by sharding the batch axis over the WHOLE mesh
            # (no-op outside TP; see parallel/tp.py _RULES note)
            from declip_tpu.parallel.tp import BATCH_ALL, constrain

            words_mlm = constrain(words_mlm, BATCH_ALL, None, None)
            out["mlm_logits"] = self.text_label_predictor(words_mlm)
            out["mlm_labels"] = labels
        elif fuse_text:
            both = self.text(
                jnp.concatenate([batch["tokens"], batch["tokens_aug"]], 0))
            text_embed, text_embed_aug = both[:b], both[b:]
        else:
            text_embed = self.text(batch["tokens"])
            text_embed_aug = self.text(batch["tokens_aug"])

        # ViT towers are LayerNorm-only, so the two views fuse into one [2B]
        # pass like the text captions above; ResNet towers must stay two
        # calls (per-view BatchNorm batch statistics, declip.py:225-232)
        fuse_img = (self.fuse_views
                    and type(self.visual).__name__ == "VisualTransformer"
                    and not getattr(self.visual, "moe_experts", 0))
        if fuse_img:
            both_img = self.encode_image(
                jnp.concatenate([img1, img2], 0), train=train)
            image_embed_1, image_embed_2 = both_img[:b], both_img[b:]
        else:
            image_embed_1 = self.encode_image(img1, train=train)
            image_embed_2 = self.encode_image(img2, train=train)

        z1 = self.projector(image_embed_1, train=train)
        z2 = self.projector(image_embed_2, train=train)
        p1 = self.predictor(z1, train=train)
        p2 = self.predictor(z2, train=train)
        out["simsiam"] = (p1, z1, p2, z2)

        text_embed = l2_normalize(text_embed, eps=1e-10)
        text_embed_aug = l2_normalize(text_embed_aug, eps=1e-10)
        out["image_embed_1"] = l2_normalize(image_embed_1)
        out["image_embed_2"] = l2_normalize(image_embed_2)
        out["text_embed"] = text_embed
        out["text_embed_aug"] = text_embed_aug
        out["logit_scale"] = self.scale_value()
        if self.logit_bias_init is not None:
            out["logit_bias"] = self.logit_bias[0]

        if self.return_simsiam_text:
            z1t = self.projector(text_embed, train=train)
            z2t = self.projector(text_embed_aug, train=train)
            out["text_simsiam"] = (
                self.predictor(z1t, train=train),
                z1t,
                self.predictor(z2t, train=train),
                z2t,
            )
        if self.return_simsiam_nn_text:
            # computed HERE so model.init creates the head params and their
            # BatchNorm stats update in the train forward (declip.py:311-314)
            z_text = self.projector_nn_text(text_embed, train=train)
            out["nn_simsiam_p_text"] = self.predictor_nn_text(
                z_text, train=train)
        return out

    def project_nn_text(self, feats):
        """Projector over NN-bank query results (declip.py:313), applied by
        the train step. Runs the projector's BatchNorm on running statistics
        (train=False) so no mutable state is needed for bank features —
        delta vs the reference, which lets bank features perturb BN stats."""
        return self.projector_nn_text(feats, train=False)


@MODELS.register
def declip_res50(**kwargs) -> DECLIP:
    visual, text, ck = build_towers(kwargs, modified_resnet_R50)
    return DECLIP(visual=visual, text=text, **ck)


@MODELS.register
def declip_res101(**kwargs) -> DECLIP:
    visual, text, ck = build_towers(kwargs, modified_resnet_R101)
    return DECLIP(visual=visual, text=text, **ck)


@MODELS.register
def declip_vitb32(**kwargs) -> DECLIP:
    visual, text, ck = build_towers(kwargs, visual_transformer_B32)
    return DECLIP(visual=visual, text=text, **ck)


@MODELS.register
def declip_vitl14(**kwargs) -> DECLIP:
    visual, text, ck = build_towers(_l14_defaults(kwargs),
                                    visual_transformer_L14)
    return DECLIP(visual=visual, text=text, **ck)
