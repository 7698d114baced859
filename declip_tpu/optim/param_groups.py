"""Parameter classification for per-group optimizer overrides.

Rebuilds prototype/utils/misc.py:267-412 (``param_group_all``): every param
is classified into a group key (bn_w/bn_b/ln_w/ln_b/conv_b/linear_b/
logit_scale/default) and the config's ``pconfig`` applies per-group overrides
(in practice: weight_decay 0 for norms/biases/logit_scale).

Classification is by flax param-tree path instead of torch module walking.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax


def classify_param(path: Tuple[str, ...], leaf) -> str:
    names = [str(p) for p in path]
    leafname = names[-1]
    if "logit_scale" in leafname or "logit_bias" in leafname:
        # logit_bias (the SigLIP pairwise-loss bias, beyond-reference) rides
        # the logit_scale group so existing zero-wd pconfigs cover it
        return "logit_scale"
    if any("BatchNorm" in n for n in names):
        return "bn_w" if leafname == "scale" else "bn_b"
    if any("LayerNorm" in n for n in names):
        return "ln_w" if leafname == "scale" else "ln_b"
    if leafname == "bias":
        parent = names[-2] if len(names) > 1 else ""
        return "conv_b" if "conv" in parent.lower() else "linear_b"
    return "default"


def _path_names(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        key = getattr(p, "key", None)
        out.append(str(key if key is not None else p))
    return tuple(out)


def group_labels(params) -> Any:
    """Pytree of group-name labels matching the param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: classify_param(_path_names(path), leaf), params
    )


def group_mask(params, predicate: Callable[[str], bool]) -> Any:
    """Boolean mask pytree: predicate over group name."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: predicate(classify_param(_path_names(path), leaf)),
        params,
    )


def weight_decay_masks(params, pconfig: Dict) -> Dict[float, Any]:
    """Map weight_decay value -> mask of params overridden to that value.

    Groups absent from pconfig keep the optimizer's default decay (mask
    returned under key None).
    """
    overrides: Dict[str, float] = {}
    for group, sub in (pconfig or {}).items():
        if isinstance(sub, dict) and "weight_decay" in sub:
            overrides[group] = float(sub["weight_decay"])

    labels = group_labels(params)
    by_value: Dict[float, Any] = {}
    values = sorted(set(overrides.values()))
    for v in values:
        groups = {g for g, val in overrides.items() if val == v}
        by_value[v] = jax.tree.map(lambda g: g in groups, labels)
    by_value[None] = jax.tree.map(lambda g: g not in overrides, labels)
    return by_value


def path_prefix_mask(params, prefixes: Tuple[str, ...]) -> Any:
    """True where the param path starts with any of the given top-level
    names — used for text/visual optimizer splits and conv1 freezing."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _path_names(path)[0] in prefixes
        or any(p in _path_names(path) for p in prefixes),
        params,
    )
