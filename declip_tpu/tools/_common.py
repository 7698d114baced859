"""Lightweight model loading for inference-time tools.

Builds the model and restores the newest checkpoint WITHOUT constructing the
training Solver (no data pipeline, no optimizer state — an inference machine
has neither the training metafile nor the memory for Adam moments).
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Dict, Tuple

from flax import serialization

from declip_tpu.checkpoint import find_last_checkpoint
from declip_tpu.config import Cfg, parse_config
from declip_tpu.models import model_entry


def load_eval_model(config_path: str) -> Tuple[Any, Dict]:
    """-> (model, variables) with variables = {'params'[, 'batch_stats']}
    from the experiment's newest checkpoint (random init if none exists)."""
    cfg = parse_config(config_path)
    model = model_entry({"type": cfg.model.type,
                         "kwargs": dict(cfg.model.kwargs)})
    base = osp.dirname(cfg.get("_config_path", osp.abspath(config_path)))
    ckpt = find_last_checkpoint(osp.join(base, "checkpoints"))
    variables: Dict[str, Any] = {}
    if ckpt is not None:
        with open(ckpt, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        variables["params"] = raw["params"]
        if raw.get("batch_stats"):
            variables["batch_stats"] = raw["batch_stats"]
    else:
        import jax
        import jax.numpy as jnp

        res = getattr(model.visual, "input_resolution", 224)
        # image-channel layout is per method family: CLIP/FILIP see one
        # view, DeCLIP/DeFILIP stack two on channels, SLIP stacks three
        views = {"declip": 2, "defilip": 2, "slip": 3}.get(
            str(cfg.model.type).split("_")[0], 1)
        batch = {"images": jnp.zeros((1, res, res, 3 * views), jnp.float32),
                 "tokens": jnp.ones((1, 77), jnp.int32),
                 "tokens_aug": jnp.ones((1, 77), jnp.int32),
                 "mlm_tokens": jnp.ones((1, 77), jnp.int32),
                 "mlm_labels": jnp.full((1, 77), -100, jnp.int32)}
        variables = dict(jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), batch, train=True))())
    return model, variables
