"""CLIP text transformer tower.

Rebuilds the 'Transformer' branch of
prototype/model/text_encoder/text_transformer.py: token embedding (std 0.02),
learned positional embedding (std 0.01), 12x512x8 causal transformer, final
LayerNorm, linear projection to the joint space.

Deliberate deltas from the reference:
- Tokenization lives in the host data pipeline; this module consumes int32
  token ids ([B, 77]), never strings (fixes text_transformer.py:185-188's
  per-step CPU tokenization).
- EOT pooling selects the FIRST position equal to ``eot_id`` instead of
  ``argmax(token_ids)`` (text_transformer.py:203). Equivalent on the
  reference vocab (eot is the highest id there), but robust to any vocab
  ordering.

HuggingFace branches (Bert/Roberta/GPT2, text_transformer.py:46-107) are
provided separately in hf_text.py (optional, gated on local weights).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from declip_tpu.models.layers import LayerNorm, Transformer

Dtype = Any


class TextTransformer(nn.Module):
    vocab_size: int
    embed_dim: int = 1024
    context_length: int = 77
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    positional_embedding_flag: bool = True
    checkpoint: bool = False
    remat_policy: str = "policy"  # policy|dots|all (models/layers.py)
    scan_unroll: int = -1  # depth unroll: -1 auto / 0 full / n (layers.py)
    eot_id: Optional[int] = None  # default: vocab_size - 1 (<|endoftext|>)
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # MoE tower (beyond-reference; models/layers.py MoeMlpBlock). Config
    # form: text_encode: {moe: {num_experts: E, ...}}.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01

    @nn.compact
    def __call__(self, tokens: jax.Array, *, return_dense: bool = False):
        """tokens: int32 [B, L] -> pooled [B, embed_dim].

        return_dense additionally returns the ln_final token features
        [B, L, W] (feeds the MLM head and FILIP's text_mapping).
        """
        eot = self.eot_id if self.eot_id is not None else self.vocab_size - 1
        emb = nn.Embed(
            self.vocab_size,
            self.transformer_width,
            dtype=self.dtype,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="token_embedding",
        )
        x = emb(tokens)
        # pin batch-over-'data' right after the lookup: a ZeRO-sharded
        # embedding table (feature axis over 'data') otherwise propagates
        # feature-sharding through the tower and collides with the MLM
        # head's batch pin (involuntary-remat fallback, test_tp_compile)
        from declip_tpu.parallel.tp import DATA, constrain

        x = constrain(x, DATA, None, None)
        if self.positional_embedding_flag:
            pos = self.param(
                "positional_embedding",
                nn.initializers.normal(stddev=0.01),
                (self.context_length, self.transformer_width),
            )
            x = x + pos[: x.shape[1]].astype(self.dtype)
        x = Transformer(
            width=self.transformer_width,
            layers=self.transformer_layers,
            heads=self.transformer_heads,
            causal=True,
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
        x = constrain(LayerNorm(self.dtype, name="ln_final")(x),
                      DATA, None, None)

        words_feat = x
        # first-eot pooling (see module docstring)
        is_eot = (tokens == eot).astype(jnp.int32)
        eot_pos = jnp.argmax(is_eot, axis=-1)
        pooled = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0, :]
        pooled = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(
                stddev=self.transformer_width ** -0.5
            ),
            name="text_projection",
        )(pooled)

        if return_dense:
            return pooled, words_feat
        return pooled


def text_transformers(**kwargs):
    """Factory matching the reference defaults (text_transformer.py:273-288).

    Dispatches on ``text_encode_type``: 'Transformer' (default) builds the
    CLIP tower; Bert/Roberta/GPT2 variants build the gated HF backend
    (declip_tpu.models.hf_text, needs local weights)."""
    kwargs = dict(kwargs)
    encode_type = kwargs.pop("text_encode_type", None) or "Transformer"
    kwargs.pop("bpe_path", None)
    utils = kwargs.pop("text_model_utils", None) or {}
    if encode_type != "Transformer":
        from declip_tpu.models.hf_text import build_hf_text

        return build_hf_text(
            encode_type,
            embed_dim=kwargs.get("embed_dim", 1024),
            pretrained_path=utils.get("pretrained_path"),
            dtype=kwargs.get("dtype", jnp.float32),
        )
    defaults = dict(
        context_length=77,
        transformer_width=512,
        transformer_heads=8,
        transformer_layers=12,
        positional_embedding_flag=True,
        checkpoint=False,
    )
    defaults.update(kwargs)
    return TextTransformer(**defaults)
