"""HuggingFace text-encoder backends (Bert / Bert_large / Roberta / GPT2).

Rebuilds the non-'Transformer' branches of prototype/model/text_encoder/
text_transformer.py:46-107, which load pretrained HF models from local
cluster paths. Here the Flax-native HF models are used so the tower still
jits into the same train step. Weights must exist locally (zero-egress
environments cannot download); pass ``pretrained_path``.

Pooling matches the reference: CLS token for Bert/Roberta, mean over tokens
for GPT2 (text_transformer.py:255-262), followed by a linear projection to
the joint embedding dim.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_HF_WIDTHS = {
    "Bert": 768,
    "Bert_large": 1024,
    "Roberta": 768,
    "Roberta_large": 1024,
    "GPT2": 768,
}


class HFTextEncoder(nn.Module):
    """Wraps a Flax HF model + projection; consumes token ids produced by the
    matching HF tokenizer in the data pipeline.

    IMPORTANT: ``model.init`` creates RANDOM backbone weights (flax modules
    carry no state). Graft the pretrained weights into the initialized
    variable tree with :func:`load_pretrained_variables` — the solver does
    this automatically when the tower is an HFTextEncoder."""

    text_encode_type: str
    pretrained_path: str
    embed_dim: int = 1024
    dtype: Any = jnp.float32

    def setup(self):
        if not os.path.isdir(self.pretrained_path):
            raise FileNotFoundError(
                f"HF weights not found at {self.pretrained_path!r} — the "
                f"'{self.text_encode_type}' text tower needs local "
                "pretrained files (zero-egress environments cannot download)."
            )
        from transformers import AutoConfig, FlaxAutoModel

        hf_config = AutoConfig.from_pretrained(self.pretrained_path)
        self.backbone = FlaxAutoModel.from_config(
            hf_config, dtype=self.dtype
        ).module
        self.text_projection = nn.Dense(self.embed_dim, dtype=self.dtype)
        # real tokenizer vocab (MLM head sizing); pad id for masking
        self.vocab_size = int(getattr(hf_config, "vocab_size", 30522))
        self.pad_id = int(getattr(hf_config, "pad_token_id", 0) or 0)

    def __call__(self, tokens: jax.Array, *, return_dense: bool = False):
        # pad id comes from the model config (Roberta pads with 1, not 0)
        attn = (tokens != self.pad_id).astype(jnp.int32)
        kwargs = dict(input_ids=tokens, attention_mask=attn)
        # FlaxGPT2Module (unlike Bert/Roberta) has no default position_ids
        import inspect

        sig = inspect.signature(type(self.backbone).__call__).parameters
        if "position_ids" in sig and sig["position_ids"].default is \
                inspect.Parameter.empty:
            b, length = tokens.shape
            kwargs["position_ids"] = jnp.broadcast_to(
                jnp.arange(length), (b, length))
        out = self.backbone(**kwargs)
        words = out.last_hidden_state
        if self.text_encode_type.startswith(("Bert", "Roberta")):
            pooled = words[:, 0, :]
        else:  # GPT2: mean pooling (text_transformer.py:261-262)
            denom = jnp.maximum(attn.sum(-1, keepdims=True), 1)
            pooled = (words * attn[..., None]).sum(1) / denom
        pooled = self.text_projection(pooled)
        if return_dense:
            return pooled, words
        return pooled


def load_pretrained_variables(encoder: "HFTextEncoder", variables,
                              subtree: str = "text"):
    """Graft the pretrained HF weights into an initialized variable tree.

    ``variables['params'][subtree]['backbone']`` (random from init) is
    replaced with ``FlaxAutoModel.from_pretrained(...).params`` — the flax
    equivalent of the reference's from_pretrained load
    (text_transformer.py:46-107)."""
    from transformers import FlaxAutoModel

    hf = FlaxAutoModel.from_pretrained(encoder.pretrained_path)
    weights = hf.params if isinstance(hf.params, dict) else dict(hf.params)
    params = dict(variables["params"])
    if subtree in params:  # tower nested inside a full CLIP model
        sub = dict(params[subtree])
        sub["backbone"] = weights
        params[subtree] = sub
    elif "backbone" in params:  # standalone HFTextEncoder variables
        params["backbone"] = weights
    else:
        raise KeyError(
            f"no '{subtree}' subtree or top-level 'backbone' in params "
            f"(keys: {sorted(params)})")
    return {**variables, "params": params}


def build_hf_text(text_encode_type: str, embed_dim: int,
                  pretrained_path: Optional[str] = None,
                  dtype: Any = jnp.float32) -> HFTextEncoder:
    path = pretrained_path or os.environ.get("DECLIP_HF_TEXT_PATH", "")
    return HFTextEncoder(
        text_encode_type=text_encode_type,
        pretrained_path=path,
        embed_dim=embed_dim,
        dtype=dtype,
    )
