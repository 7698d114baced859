"""Megatron-style tensor parallelism over a 2-D (data, model) mesh.

Beyond-reference capability (the reference, linklink DDP, is data-parallel
only): split each transformer layer's weight matrices over a ``model`` mesh
axis so one layer's FLOPs and params span several chips. Done the TPU-native
way — we only annotate PARAMETER shardings; XLA's SPMD partitioner
propagates them through the jitted train step and inserts the
collectives (the all-reduce after each row-parallel matmul, resharding
around the fused-qkv split), so the model/step code is untouched.

Sharding recipe (Shoeybi et al., arXiv:1909.08053, via the standard JAX
formulation — How to Scale Your Model, §tensor-parallelism), applied to
this repo's scan-stacked transformer params (leading [L] layer axis):

| path suffix          | shape        | spec                  | role |
|----------------------|--------------|-----------------------|------|
| attn/qkv/kernel      | [L, W, 3W]   | (None, None, 'model') | column-parallel |
| attn/qkv/bias        | [L, 3W]      | (None, 'model')       | column-parallel |
| attn/out/kernel      | [L, W, W]    | (None, 'model', None) | row-parallel |
| mlp/c_fc/kernel      | [L, W, 4W]   | (None, None, 'model') | column-parallel |
| mlp/c_fc/bias        | [L, 4W]      | (None, 'model')       | column-parallel |
| mlp/c_proj/kernel    | [L, 4W, W]   | (None, 'model', None) | row-parallel |
| token_embedding      | [V, W]       | ('model', None)       | vocab-parallel |

Row-parallel biases, LayerNorms, embeddings' W axis, projections, and every
non-transformer leaf stay replicated on 'model'. The residual stream is
replicated over 'model' and sharded over 'data' (the batch axis), so the
contrastive gather/loss is untouched.

Adam moments and EMA shadows mirror the param tree's shapes, so their specs
are resolved through a shape table built from the param specs (shapes of
sharded leaves are unique in this model family; anything ambiguous or
unknown falls back to replicated — always correct, XLA reshards).

Enable with ``parallelism: {tp: N}`` in a config: the Solver builds the
mesh as [n_devices/N, N] ('data', 'model') and places the state through
``tp_state_shardings``. Composes with the batch sharded over 'data' only.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# path-suffix -> partition spec SUFFIX (applied to the trailing dims;
# leading dims — the scan [L] axis — get None)
_RULES: Tuple[Tuple[Tuple[str, ...], Tuple[Any, ...]], ...] = (
    (("attn", "qkv", "kernel"), (None, MODEL_AXIS)),
    (("attn", "qkv", "bias"), (MODEL_AXIS,)),
    (("attn", "out", "kernel"), (MODEL_AXIS, None)),
    (("mlp", "c_fc", "kernel"), (None, MODEL_AXIS)),
    (("mlp", "c_fc", "bias"), (MODEL_AXIS,)),
    (("mlp", "c_proj", "kernel"), (MODEL_AXIS, None)),
    (("token_embedding", "embedding"), (MODEL_AXIS, None)),
)


def _path_names(kp) -> Tuple[str, ...]:
    names = []
    for k in kp:
        if isinstance(k, jtu.DictKey):
            names.append(str(k.key))
        elif isinstance(k, jtu.GetAttrKey):
            names.append(k.name)
    return tuple(names)


def _spec_for(path: Tuple[str, ...], shape) -> P:
    for suffix, tail in _RULES:
        if path[-len(suffix):] == suffix:
            if len(tail) > len(shape):
                break  # rank mismatch — replicate
            spec = [None] * (len(shape) - len(tail)) + list(tail)
            # refuse to shard a non-divisible axis (e.g. vocab 49409 on
            # the embedding): replicate instead, XLA stays correct
            for ax, name in enumerate(spec):
                if name is not None and shape[ax] % _spec_for.n:
                    return P()
            return P(*spec)
    return P()


def param_specs(mesh: Mesh, params: Any) -> Any:
    """Pytree of PartitionSpecs for the param tree (path-rule based)."""
    _spec_for.n = mesh.shape[MODEL_AXIS]
    return jtu.tree_map_with_path(
        lambda kp, x: _spec_for(_path_names(kp), x.shape), params)


def tp_state_shardings(mesh: Mesh, state: Any) -> Any:
    """NamedShardings for a whole TrainState: ``state.params`` by path
    rules; every other leaf (Adam moments, EMA shadows, banks) by a shape
    table derived from the param specs — moments/EMA mirror param shapes,
    and the sharded shapes are unique in this model family. Anything
    unknown or shape-ambiguous is replicated (always correct)."""
    is_p = lambda s: isinstance(s, P)  # noqa: E731 — P() is an EMPTY
    # tuple subtype; without is_leaf tree_map would flatten it away
    specs = param_specs(mesh, state.params)
    table: Dict[Tuple[int, ...], P] = {}
    ambiguous = set()
    for leaf, spec in zip(jtu.tree_leaves(state.params),
                          jtu.tree_leaves(specs, is_leaf=is_p)):
        shape = tuple(leaf.shape)
        if shape in table and table[shape] != spec:
            ambiguous.add(shape)
        table[shape] = spec
    for shape in ambiguous:
        table[shape] = P()

    by_shape = jax.tree.map(
        lambda x: NamedSharding(
            mesh, table.get(tuple(getattr(x, "shape", ())), P())),
        state)
    by_path = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=is_p)
    return by_shape.replace(params=by_path)


def shard_train_state_tp(mesh: Mesh, state: Any) -> Any:
    """Device-put ``state`` with tensor-parallel shardings."""
    return jax.device_put(state, tp_state_shardings(mesh, state))
