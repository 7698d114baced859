"""GPipe-style pipeline parallelism over the scan-stacked transformer.

Beyond-reference capability (the reference, linklink DDP, is data-parallel
only — SURVEY.md §2.1): split the transformer stack DEPTH-wise over a
``pipe`` mesh axis, so each group of devices holds L/S layers and
microbatches stream through the stages. This is the third parallelism axis
next to FSDP (parallel/fsdp.py) and tensor parallelism (parallel/tp.py);
together they cover the dp/fsdp/tp/pp quadrant of the standard large-model
sharding recipe (How to Scale Your Model, §pipeline-parallelism).

TPU-native design:

- The transformer stack already carries its depth as data: ``nn.scan``
  stores every layer's weights with a leading ``[L]`` axis
  (models/layers.py). Pipeline placement is therefore *just a sharding* —
  ``P('pipe')`` on that axis — no parameter surgery, no per-stage modules,
  checkpoints are identical to the single-chip layout.
- The schedule is a ``shard_map`` over the mesh whose body runs the classic
  GPipe loop: ``lax.scan`` over ``M + S - 1`` ticks, each tick running this
  stage's ``L/S`` layers on its current microbatch and handing the result to
  the next stage with a ring ``lax.ppermute``. XLA overlaps the permute with
  the next tick's compute (async collective), and reverse-mode AD
  differentiates the whole schedule — the backward pass IS the reverse
  pipeline, with ppermute transposed to the opposite direction
  automatically. No hand-written backward schedule, no NCCL P2P state
  machine (the reference-era equivalent).
- Bubble fraction is the textbook ``(S-1)/(M+S-1)``; pick
  ``microbatches >= 4*stages`` to amortize it.

Enable with ``parallelism: {pp: S, microbatches: M}``: the Solver builds a
``[data, pipe]`` mesh, installs the process-global pipeline context (model
code is config-constructed and cannot take a mesh argument — same pattern
as parallel/tp.py's activation context), and places the train state through
``shard_train_state_pp``. Transformer towers whose depth divides S run the
pipelined schedule; everything else (conv stem, embeddings, heads, losses)
stays on the ordinary jit/GSPMD path, replicated over 'pipe'.
PP currently composes with data parallelism (batch over 'data'), not with
tp/fsdp.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 re-exports it at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

PIPE_AXIS = "pipe"

# process-global pipeline context (installed by the Solver before tracing;
# affects jit TRACING only, like parallel/tp.py's activation context)
_PP: Dict[str, Any] = {"mesh": None, "n_micro": 0}


def set_pipeline_context(mesh: Mesh, n_micro: int) -> None:
    if PIPE_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no '{PIPE_AXIS}' axis")
    _PP.update(mesh=mesh, n_micro=int(n_micro))


def clear_pipeline_context() -> None:
    _PP.update(mesh=None, n_micro=0)


def pipeline_stages(n_layers: int) -> int:
    """Number of pipeline stages to run ``n_layers`` over, or 0 when the
    pipelined path should not engage (no context installed, or the depth
    does not divide the stage count)."""
    mesh = _PP["mesh"]
    if mesh is None:
        return 0
    s = mesh.shape[PIPE_AXIS]
    return s if s > 1 and n_layers % s == 0 else 0


def pipeline_transformer(
    stacked_params: Any,
    x: jax.Array,
    block: Any,
    *,
    remat_policy: Optional[str] = "policy",
    unroll: int = 1,
) -> jax.Array:
    """Run ``x`` through all ``L`` stacked layers with the GPipe schedule.

    stacked_params: the ``nn.scan`` parameter subtree (leading ``[L]`` axis
    on every leaf), globally sharded ``P('pipe')`` on that axis.
    x: ``[B, L_seq, D]`` activations, batch sharded over 'data'.
    block: an UNBOUND ResidualAttentionBlock (scan-compatible signature).
    """
    mesh: Mesh = _PP["mesh"]
    n_stages = mesh.shape[PIPE_AXIS]
    n_micro = max(int(_PP["n_micro"]), 1)
    data_axes = tuple(a for a in mesh.axis_names if a != PIPE_AXIS)

    # prevent_cse: with the layer scan inside the stage unrolled (>1), the
    # inlined bodies sit next to their forward values and XLA CSE would
    # silently defeat the remat — same hazard as models/layers.py's full-
    # remat branch. Unlike layers.py's default policy branch (where barriers
    # measured a 3.5-8% throughput tax and the memory is not load-bearing,
    # so CSE is allowed to win), pp exists to FIT models that don't
    # otherwise fit: stage remat memory is the point, so barriers stay on
    # for both branches whenever bodies are unrolled.
    prevent_cse = unroll > 1
    if remat_policy == "full":
        stage_remat = lambda f: jax.checkpoint(  # noqa: E731
            f, prevent_cse=prevent_cse)
    else:
        policy = {
            "policy": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            "dots": jax.checkpoint_policies.dots_saveable,
            "all": jax.checkpoint_policies.everything_saveable,
        }[remat_policy or "policy"]
        stage_remat = lambda f: jax.checkpoint(  # noqa: E731
            f, prevent_cse=prevent_cse, policy=policy)

    def body(p_local, x_local):
        stage = lax.axis_index(PIPE_AXIS)
        b_local = x_local.shape[0]
        m = n_micro if b_local % n_micro == 0 else 1
        mb = b_local // m
        micro = x_local.reshape((m, mb) + x_local.shape[1:])

        layers_local = jax.tree.leaves(p_local)[0].shape[0]

        def run_stage(x_in, params):
            def one_layer(h, p):
                y, _ = block.apply({"params": p}, h, None)
                return y, None

            y, _ = lax.scan(one_layer, x_in, params,
                            unroll=max(1, min(unroll, layers_local)))
            return y

        run_stage = stage_remat(run_stage)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        n_ticks = m + n_stages - 1
        # buffers are per-stage state: mark them pipe-varying up front so
        # the scan carry's manual-axes type is stable (jax vma typing)
        if hasattr(lax, "pcast"):
            _vary = lambda v: lax.pcast(v, (PIPE_AXIS,), to="varying")  # noqa: E731
        else:  # pragma: no cover — older jax
            _vary = lambda v: lax.pvary(v, (PIPE_AXIS,))  # noqa: E731
        out_buf = _vary(jnp.zeros_like(micro))
        carry0 = _vary(jnp.zeros_like(micro[0]))

        def tick(carry, t):
            cur, out = carry
            # stage 0 injects microbatch t (clipped during the drain ticks —
            # its results there never reach the output buffer)
            x_in = jnp.where(stage == 0, micro[jnp.clip(t, 0, m - 1)], cur)
            y = run_stage(x_in, p_local)
            o_idx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            write = (stage == n_stages - 1) & (t >= n_stages - 1)
            prev = lax.dynamic_index_in_dim(out, o_idx, 0, keepdims=False)
            out = lax.dynamic_update_index_in_dim(
                out, jnp.where(write, y, prev), o_idx, 0)
            nxt = lax.ppermute(y, PIPE_AXIS, perm)
            return (nxt, out), None

        (_, out_buf), _ = lax.scan(
            tick, (carry0, out_buf), jnp.arange(n_ticks))
        # only the last stage holds real outputs — masked psum broadcasts
        # them to every pipe member (out_specs say 'replicated over pipe')
        out = lax.psum(
            jnp.where(stage == n_stages - 1, out_buf,
                      jnp.zeros_like(out_buf)),
            PIPE_AXIS,
        )
        return out.reshape((b_local,) + x_local.shape[1:])

    param_specs = jax.tree.map(lambda _: P(PIPE_AXIS), stacked_params)
    # batch over the data axes, replicated over 'pipe'
    x_spec = P(data_axes if data_axes else None)
    # check_vma=False: matches the repo's other shard_maps (ops/attention,
    # ops/contrastive). Beyond consistency it is load-bearing — vma
    # tracking trips a JAX-internal lowering-cache KeyError when an
    # interpret-mode pallas_call (the CPU-test flash-attention path) runs
    # inside the body.
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )(stacked_params, x)


# ----------------------------------------------------------------- placement


def _path_names(kp) -> Tuple[str, ...]:
    names = []
    for k in kp:
        if isinstance(k, jtu.DictKey):
            names.append(str(k.key))
        elif isinstance(k, jtu.GetAttrKey):
            names.append(k.name)
    return tuple(names)


def pp_state_shardings(mesh: Mesh, state: Any) -> Any:
    """NamedShardings for a TrainState under pipeline parallelism: every
    param leaf under a scanned ``layers`` subtree whose leading (depth) axis
    divides the pipe count is sharded ``P('pipe')``; everything else is
    replicated. Adam moments / EMA shadows mirror through a shape table
    (stacked-layer shapes are unique in this model family; ambiguity falls
    back to replicated — always correct, XLA reshards)."""
    n_pipe = mesh.shape[PIPE_AXIS]

    def spec_for(path: Tuple[str, ...], shape) -> P:
        if "layers" in path and shape and shape[0] % n_pipe == 0:
            return P(PIPE_AXIS)
        return P()

    is_p = lambda s: isinstance(s, P)  # noqa: E731
    specs = jtu.tree_map_with_path(
        lambda kp, x: spec_for(_path_names(kp), tuple(x.shape)),
        state.params)
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


def shard_train_state_pp(mesh: Mesh, state: Any) -> Any:
    """Device-put ``state`` with pipeline shardings."""
    return jax.device_put(state, pp_state_shardings(mesh, state))
