"""Reference (.pth.tar torch state_dict) <-> declip_tpu variables converter.

BASELINE.json requires reference-compatible checkpoint formats. The mapping
covers every module family of the reference model zoo (SURVEY.md §2.2):
ViT / ModifiedResNet / text transformer towers, SimSiam heads, FILIP
mappings, MLM head, logit scales.

Key structural translations:
- torch Linear ``weight [out, in]``    -> flax Dense ``kernel [in, out]``
- torch Conv2d ``weight [O, I, H, W]`` -> flax Conv ``kernel [H, W, I, O]``
- ViT ``conv1`` patchify conv          -> ``patch_embed`` Dense
  ``[p*p*3, width]`` (row order (kh, kw, channel), matching the
  space-to-depth reshape in declip_tpu/models/vit.py)
- per-layer ``transformer.resblocks.{i}.*`` -> nn.scan-stacked
  ``transformer/layers/*`` with a leading [L] axis
- BatchNorm weight/bias -> params scale/bias; running stats -> the
  ``batch_stats`` collection; LayerNorm nests one level ('LayerNorm_0').

Works on CPU numpy only — torch is required only when reading a real
.pth.tar file.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

_LN_NAMES = ("ln_pre", "ln_post", "ln_1", "ln_2", "ln_final")
_BN_RE = re.compile(r"bn\d$|^downsample_bn$")


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _normalize_key(key: str) -> str:
    if key.startswith("module."):
        key = key[len("module."):]
    if key.startswith("encode_text."):
        key = "text." + key[len("encode_text."):]
    # slip.py's CLIP variant names the text tower `text_encoder`
    # (slip.py:118) where clip/declip/filip use `encode_text`
    if key.startswith("text_encoder."):
        key = "text." + key[len("text_encoder."):]
    key = re.sub(r"\blayer(\d)\.(\d+)\.", r"layer\1_\2.", key)
    key = re.sub(r"\bdownsample\.0\.", "downsample_conv.", key)
    key = re.sub(r"\bdownsample\.1\.", "downsample_bn.", key)
    key = re.sub(r"\bresblocks\.(\d+)\.", r"layers.<\1>.", key)
    return key


def _translate(key: str, val: np.ndarray
               ) -> Optional[Tuple[str, Tuple[str, ...], np.ndarray,
                                   Optional[int]]]:
    """-> (collection, path, value, scan_layer_index) or None to drop."""
    if key.endswith("num_batches_tracked"):
        return None
    key = _normalize_key(key)
    parts = key.split(".")

    layer_idx: Optional[int] = None
    clean = []
    for p in parts:
        m = re.fullmatch(r"<(\d+)>", p)
        if m:
            layer_idx = int(m.group(1))
        else:
            clean.append(p)
    parts = clean
    head, leaf = parts[:-1], parts[-1]

    # ViT patchify conv -> dense: conv1 with a large (16/32) spatial kernel;
    # ResNet stem convs are 3x3 so they never match
    if head and head[-1] == "conv1" and leaf == "weight" and \
            val.ndim == 4 and val.shape[2] >= 8:
        w = val.transpose(2, 3, 1, 0).reshape(-1, val.shape[0])
        return ("params", tuple(head[:-1] + ["patch_embed", "kernel"]), w,
                None)

    # torch MultiheadAttention fused projections
    if head and head[-1] == "attn" and leaf in ("in_proj_weight",
                                                "in_proj_bias"):
        name = "kernel" if leaf.endswith("weight") else "bias"
        v = val.T if val.ndim == 2 else val
        return ("params", tuple(head + ["qkv", name]), v, layer_idx)
    if "out_proj" in head:
        h = [p for p in head if p != "out_proj"]
        name = "kernel" if leaf == "weight" else "bias"
        v = val.T if val.ndim == 2 else val
        return ("params", tuple(h + ["out", name]), v, layer_idx)

    # layer norms nest one level in our LayerNorm wrapper
    if head and head[-1] in _LN_NAMES:
        name = "scale" if leaf == "weight" else "bias"
        return ("params", tuple(head + ["LayerNorm_0", name]), val, layer_idx)

    # batch norms: params + running stats
    if head and _BN_RE.search(head[-1]):
        if leaf == "weight":
            return ("params", tuple(head + ["BatchNorm_0", "scale"]), val,
                    layer_idx)
        if leaf == "bias":
            return ("params", tuple(head + ["BatchNorm_0", "bias"]), val,
                    layer_idx)
        if leaf == "running_mean":
            return ("batch_stats", tuple(head + ["BatchNorm_0", "mean"]), val,
                    layer_idx)
        if leaf == "running_var":
            return ("batch_stats", tuple(head + ["BatchNorm_0", "var"]), val,
                    layer_idx)

    if head and head[-1] == "token_embedding" and leaf == "weight":
        return ("params", tuple(head + ["embedding"]), val, layer_idx)

    if leaf == "weight" and val.ndim == 4:  # conv
        return ("params", tuple(head + ["kernel"]),
                val.transpose(2, 3, 1, 0), layer_idx)
    if leaf == "weight" and val.ndim == 2:  # linear
        return ("params", tuple(head + ["kernel"]), val.T, layer_idx)
    if leaf == "bias":
        return ("params", tuple(head + ["bias"]), val, layer_idx)

    # plain parameters: class_embedding, positional_embedding, proj,
    # logit_scale(_dense)
    return ("params", tuple(parts), val, layer_idx)


def torch_state_to_variables(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Convert a reference model state_dict (tensors or ndarrays) into
    {'params': ..., 'batch_stats': ...} matching declip_tpu model trees."""
    staged: Dict[Tuple, Dict[int, np.ndarray]] = {}
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    for key, tensor in state_dict.items():
        val = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
            else tensor, np.float32)
        res = _translate(key, val)
        if res is None:
            continue
        coll, path, v, layer_idx = res
        if layer_idx is not None:
            staged.setdefault((coll,) + path, {})[layer_idx] = v
        else:
            _set(out[coll], path, v)
    for (coll, *path), by_layer in staged.items():
        stacked = np.stack([by_layer[i] for i in sorted(by_layer)])
        _set(out[coll], tuple(path), stacked)
    if not out["batch_stats"]:
        out.pop("batch_stats")
    return out


def load_pth(path: str) -> Dict[str, Dict]:
    """Load a reference ckpt*.pth.tar and convert its 'model' entry."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("model", blob)
    return torch_state_to_variables(state)
