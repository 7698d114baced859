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

from typing import Any, Dict, Optional, Tuple

import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"
EXPERT_AXIS = "expert"  # MoE expert-parallel mesh axis (parallelism: {ep: N})

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
    # ResNet attnpool (modified_resnet.py:75-94 analogue): q/k/v column-
    # parallel over heads, c_proj row-parallel
    (("attnpool", "q_proj", "kernel"), (None, MODEL_AXIS)),
    (("attnpool", "q_proj", "bias"), (MODEL_AXIS,)),
    (("attnpool", "k_proj", "kernel"), (None, MODEL_AXIS)),
    (("attnpool", "k_proj", "bias"), (MODEL_AXIS,)),
    (("attnpool", "v_proj", "kernel"), (None, MODEL_AXIS)),
    (("attnpool", "v_proj", "bias"), (MODEL_AXIS,)),
    (("attnpool", "c_proj", "kernel"), (MODEL_AXIS, None)),
    # SimSiam projector/predictor MLPs (declip heads.py): Megatron pair —
    # linear1 column-parallel (hidden sharded through the BN+ReLU, both
    # elementwise per-feature), linear2 row-parallel; projector linear3
    # stays replicated (its output feeds the loss)
    (("linear1", "kernel"), (None, MODEL_AXIS)),
    (("linear1", "bias"), (MODEL_AXIS,)),
    (("linear2", "kernel"), (MODEL_AXIS, None)),
    # NOTE the MLM vocab head (text_label_predictor, [W, 49409]) is NOT
    # weight-sharded: 49409 splits unevenly (JAX shardings must divide) and
    # row-parallel would all-reduce a [B, P, vocab] tensor. Instead its
    # compute is split by sharding the head INPUT's batch axis over the
    # whole mesh (constrain(..., BATCH_ALL) in declip_model) — n-way FLOP
    # split, CE stays row-local.
    # MoE expert FFNs (models/layers.py MoeMlpBlock, [L, E, D, H] etc.):
    # one shard per expert group over the 'expert' axis (parallelism:
    # {ep: N}); router stays replicated. On a mesh without an 'expert'
    # axis these degrade to replicated per-axis, and vice versa for the
    # 'model' rules above on the expert mesh.
    (("moe", "wi"), (EXPERT_AXIS, None, None)),
    (("moe", "bi"), (EXPERT_AXIS, None)),
    (("moe", "wo"), (EXPERT_AXIS, None, None)),
    (("moe", "bo"), (EXPERT_AXIS, None)),
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
            # drop (replicate) any axis whose mesh axis is absent from the
            # mesh ('model' rules on an expert mesh and vice versa) or
            # does not divide the dim (e.g. vocab 49409 on the embedding)
            for ax, name in enumerate(spec):
                n = _spec_for.sizes.get(name) if name is not None else None
                if name is not None and (n is None or shape[ax] % n):
                    spec[ax] = None
            return P(*spec) if any(s is not None for s in spec) else P()
    return P()


def param_specs(mesh: Mesh, params: Any) -> Any:
    """Pytree of PartitionSpecs for the param tree (path-rule based)."""
    _spec_for.sizes = dict(mesh.shape)
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


def tp_fsdp_state_shardings(mesh: Mesh, state: Any, *,
                            min_size: int | None = None) -> Any:
    """TP composed with ZeRO-3: every leaf additionally shards its largest
    free axis over 'data' (``parallelism: {tp: N, fsdp: true}``).

    TP-sharded leaves keep their 'model' dims and gain a 'data' dim where
    one divides; TP-replicated leaves get the plain FSDP rule. Adam
    moments / EMA mirror through the same shape table as
    ``tp_state_shardings``, so the optax update stays collective-free."""
    from declip_tpu.parallel.fsdp import MIN_SHARD_SIZE, best_shard_axis

    if min_size is None:
        min_size = MIN_SHARD_SIZE
    n_data = mesh.shape["data"]
    shardings = tp_state_shardings(mesh, state)

    # the MLM vocab head's FLOPs are split by the BATCH_ALL input pin
    # (declip_model) — data-sharding its kernel's contraction axis here
    # conflicts with that pin and re-creates an involuntary-remat fallback
    # (tests/test_tp_compile.py tp_fsdp mode); keep it TP-placed only.
    # Adam moments/EMA mirror via the same shapes.
    skip_shapes = set()
    for kp, leaf in jtu.tree_flatten_with_path(state.params)[0]:
        if "text_label_predictor" in _path_names(kp):
            skip_shapes.add(tuple(leaf.shape))

    def compose(x, s: NamedSharding) -> NamedSharding:
        shape = tuple(getattr(x, "shape", ()))
        if not shape or shape in skip_shapes:
            return s
        spec = list(s.spec) + [None] * (len(shape) - len(s.spec))
        import numpy as _np

        if int(_np.prod(shape)) < min_size or n_data == 1:
            return s
        taken = {i for i, a in enumerate(spec) if a is not None}
        axis = best_shard_axis(shape, n_data, skip=taken)
        if axis is None:
            return s
        spec[axis] = "data"
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(compose, state, shardings)


def shard_train_state_tp_fsdp(mesh: Mesh, state: Any,
                              min_size: int | None = None) -> Any:
    """Device-put ``state`` with composed TP x FSDP shardings."""
    return jax.device_put(
        state, tp_fsdp_state_shardings(mesh, state, min_size=min_size))


# ------------------------------------------------------------------ acts
# Parameter-only annotations do NOT survive the nn.scan + remat transformer
# body: XLA's SPMD partitioner hits "Involuntary full rematerialization"
# (replicate-then-repartition) on every attention reduce inside the scanned
# block (observed: MULTICHIP_r02 tail). The fix is explicit activation
# constraints inside the block. The model code can't take a mesh argument
# (flax modules are config-constructed), so the solver installs a process-
# global context before tracing and declip_tpu.models.layers calls
# ``constrain`` — a no-op when no context is installed (single chip, DP,
# FSDP), so the annotations cost nothing outside TP.

DATA = "data"  # batch axis of an activation
MODEL = "model"  # tensor-parallel axis (heads / hidden features)
BATCH_ALL = "batch_all"  # batch sharded over the WHOLE mesh (data x model)
SEQ = "seq"  # sequence axis under Megatron sequence parallelism (sp)
EXPERT = "expert"  # expert axis of MoE dispatch/FFN activations (ep)

_ACT: Dict[str, Any] = {"mesh": None, "data": None, "model": None,
                        "seq": None, "expert": None}


def set_activation_sharding(mesh: Mesh, data_axis: str = "data",
                            model_axis: Optional[str] = MODEL_AXIS,
                            seq: bool = False) -> None:
    """Install the activation-sharding context. Affects jit TRACING only —
    traces compiled while a different context was installed keep their
    shardings.

    The solver installs this for ``parallelism: {tp: N}`` AND for
    ``{fsdp: true}`` (with ``model_axis=None``): under FSDP the ZeRO-3
    weight shards otherwise leak their (often contraction-axis) shardings
    into the attention remat body and GSPMD falls back to involuntary full
    rematerialization — pinning activations to "batch over data, rest
    replicated" makes it all-gather the weights instead, which IS the
    ZeRO-3 contract. model_axis=None turns every MODEL annotation into
    replicated.

    ``seq=True`` (``parallelism: {tp: N, sp: true}``) additionally enables
    Megatron sequence parallelism (Korthikanti et al., arXiv:2205.05198):
    SEQ annotations — the residual stream between the row-parallel output
    of one sublayer and the column-parallel input of the next, i.e. the
    LayerNorm regions — shard the TOKEN axis over the same 'model' groups.
    GSPMD then replaces each row-parallel all-reduce with a reduce-scatter
    and re-gathers just before the next column-parallel matmul, cutting the
    residual/LN activation memory per chip by tp× at identical math. When
    ``seq=False`` (or no model axis) every SEQ annotation degrades to
    replicated — exactly the pre-sp behavior — and ``constrain`` already
    no-ops on token axes that don't divide tp (e.g. the 77-token text
    stream at tp=2 stays replicated while the 50-token ViT-B/32 visual
    stream shards)."""
    if model_axis is not None and model_axis not in mesh.axis_names:
        model_axis = None
    has_ep = EXPERT_AXIS in mesh.axis_names
    # Expert mesh: the batch shards over BOTH axes (data x expert) so the
    # non-MoE compute (attention, embeddings, losses) stays fully
    # data-parallel; only the [E, ...] dispatch/FFN tensors pin to
    # 'expert', and GSPMD inserts the token all-to-alls around them
    # (GShard, arXiv:2006.16668 §3.2).
    _ACT.update(mesh=mesh,
                data=(data_axis, EXPERT_AXIS) if has_ep else data_axis,
                model=model_axis,
                seq=model_axis if seq else None,
                expert=EXPERT_AXIS if has_ep else None)


def clear_activation_sharding() -> None:
    _ACT.update(mesh=None, data=None, model=None, seq=None, expert=None)


def in_manual_region(x=None) -> bool:
    """True while tracing inside a ``shard_map`` body (manual mesh axes).

    In a manual region arrays are already per-device local shards:
    ``with_sharding_constraint`` raises ("vma axes should be Manual") and a
    nested ``shard_map`` over the same mesh errors at trace time. The
    pipeline schedule (parallel/pp.py) is such a region — ``constrain`` and
    the Pallas attention dispatch must degrade to local-shard behavior
    there. Primary probe: the active abstract mesh's manual axes (works
    under ``check_vma=False`` bodies too); fallback: the aval's vma set."""
    try:
        from jax._src import mesh as _mesh_lib  # no public accessor yet

        if getattr(_mesh_lib.get_abstract_mesh(), "manual_axes", ()):
            return True
    except Exception:
        pass
    if x is not None:
        try:
            return bool(jax.typeof(x).vma)
        except Exception:
            return False
    return False


def constrain(x, *axes):
    """``with_sharding_constraint`` by logical axis names.

    axes: one of DATA / MODEL / SEQ / BATCH_ALL / None per dimension of x.
    Returns x unchanged when no context is installed; a named dimension
    that does not divide over its mesh axis (tiny test models, the
    77-token text stream under sp) degrades to replicated PER AXIS — the
    other dimensions keep their pins. Inside a shard_map body (the GPipe
    pipeline schedule) constraints no-op: the shards are already local."""
    mesh = _ACT["mesh"]
    if mesh is None:
        return x
    if in_manual_region(x):
        return x
    da, ma = _ACT["data"], _ACT["model"]
    name_of = {
        DATA: da,
        MODEL: ma,  # None (no model axis) -> replicated dim
        BATCH_ALL: (da, ma) if ma is not None else da,
        SEQ: _ACT["seq"],  # None unless sequence parallelism is on
        EXPERT: _ACT["expert"],  # None unless the mesh has an expert axis
    }
    def flat(name):
        """Flatten possibly-nested axis-name tuples, dropping Nones."""
        if name is None:
            return ()
        if isinstance(name, tuple):
            return tuple(a for n in name for a in flat(n))
        return (name,)

    spec = []
    for a, dim in zip(axes, x.shape):
        names = flat(name_of[a] if a is not None else None)
        n = 1
        for nm in names:
            n *= mesh.shape[nm]
        if not names or dim % n:
            spec.append(None)
        else:
            spec.append(names if len(names) > 1 else names[0])
    if all(s is None for s in spec):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
