"""Pipeline parallelism: GPipe schedule parity with replicated DP on a 2-D
[data, pipe] mesh (parallel/pp.py).

Beyond-reference capability (the reference, linklink DDP, is data-parallel
only): the scan-stacked transformer layers are sharded DEPTH-wise over a
'pipe' mesh axis and microbatches stream through the stages via a
shard_map + ppermute schedule; reverse-mode AD provides the backward
pipeline automatically."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from declip_tpu.config import parse_config
from declip_tpu.models.layers import Transformer
from declip_tpu.parallel import make_mesh
from declip_tpu.parallel.mesh import batch_sharding
from declip_tpu.parallel.pp import (
    clear_pipeline_context,
    pp_state_shardings,
    set_pipeline_context,
    shard_train_state_pp,
)
from declip_tpu.train import make_train_step

from test_train_step import build_state, make_batch, tiny_model


def _ctx(mesh, n_micro=2):
    class _Ctx:
        def __enter__(self):
            set_pipeline_context(mesh, n_micro=n_micro)

        def __exit__(self, *a):
            clear_pipeline_context()

    return _Ctx()


def test_pipeline_transformer_parity():
    """Forward + grads of the pipelined schedule are bit-comparable to the
    plain scan at fp32 (same math, different execution order)."""
    model = Transformer(width=32, layers=4, heads=2, causal=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 10, 32)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, x):
        return (model.apply({"params": p}, x) ** 2).mean()

    ref, ref_grad = jax.jit(jax.value_and_grad(loss))(params, x)

    mesh = make_mesh(pp=2)
    assert dict(mesh.shape) == {"data": 4, "pipe": 2}
    with _ctx(mesh):
        spec = jax.tree_util.tree_map_with_path(
            lambda kp, leaf: NamedSharding(
                mesh,
                P("pipe") if any(
                    getattr(k, "key", None) == "layers" for k in kp)
                else P()),
            params)
        params_s = jax.device_put(params, spec)
        x_s = jax.device_put(x, NamedSharding(mesh, P("data")))
        pp_val, pp_grad = jax.jit(jax.value_and_grad(loss))(params_s, x_s)
    np.testing.assert_allclose(float(ref), float(pp_val), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_grad), jax.tree.leaves(pp_grad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_pp_step_matches_replicated():
    """Full jitted CLIP train step: replicated 8-way DP vs [data=4, pipe=2]
    pipeline must produce the same loss trajectory; the stacked layer
    params (and their Adam moments) must actually shard over 'pipe'."""
    model = tiny_model()
    cfg = parse_config("x: 0")
    batch = make_batch(16)
    state, tx, sched = build_state(model, batch, cfg)

    mesh1 = make_mesh()
    step = jax.jit(make_train_step(model, tx, cfg, sched))
    sb1 = jax.device_put(batch, batch_sharding(mesh1))
    s_rep = jax.device_put(state, NamedSharding(mesh1, P()))
    losses_rep = []
    for _ in range(2):
        s_rep, m = step(s_rep, sb1)
        losses_rep.append(float(m["loss"]))  # readback between dispatches

    mesh2 = make_mesh(pp=2)
    with _ctx(mesh2):
        sb2 = jax.device_put(batch, batch_sharding(mesh2))
        s_pp = shard_train_state_pp(mesh2, state)
        qkv = s_pp.params["text"]["transformer"]["layers"]["attn"]["qkv"][
            "kernel"]
        assert qkv.sharding.spec == P("pipe")
        assert (qkv.addressable_shards[0].data.shape[0]
                == qkv.shape[0] // 2)
        mu_leaves = [
            leaf for leaf in jax.tree.leaves(s_pp.opt_state)
            if getattr(leaf, "shape", ()) == qkv.shape
        ]
        assert mu_leaves and all(
            not leaf.sharding.is_fully_replicated for leaf in mu_leaves)

        # fresh jit: the trace (jaxpr) is cached by avals, and the
        # pipelined path must be traced WITH the context installed
        step_pp = jax.jit(make_train_step(model, tx, cfg, sched))
        for i in range(2):
            s_pp, m = step_pp(s_pp, sb2)
            np.testing.assert_allclose(
                losses_rep[i], float(m["loss"]), rtol=2e-5,
                err_msg=f"step {i}")

    for a, b in zip(jax.tree.leaves(s_rep.params),
                    jax.tree.leaves(s_pp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)


def test_pp_microbatch_fallback_and_specs():
    """Non-divisible microbatch count falls back to m=1 (still correct);
    pp_state_shardings leaves non-stacked leaves replicated."""
    model = Transformer(width=32, layers=4, heads=2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 6, 32)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)

    mesh = make_mesh(pp=2)
    with _ctx(mesh, n_micro=3):  # local batch 1 per data way -> m=1
        spec = jax.tree_util.tree_map_with_path(
            lambda kp, leaf: NamedSharding(
                mesh,
                P("pipe") if any(
                    getattr(k, "key", None) == "layers" for k in kp)
                else P()),
            params)
        params_s = jax.device_put(params, spec)
        x_s = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(model.apply)({"params": params_s}, x_s)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-5,
                               atol=1e-6)


def test_solver_place_state_pp():
    """`parallelism: {pp: N}` routes Solver placement through
    shard_train_state_pp: stacked layer leaves pipe-sharded, heads
    replicated."""
    from declip_tpu.solver import Solver
    from declip_tpu.train import new_train_state

    mesh = make_mesh(pp=2)
    fake = object.__new__(Solver)
    fake.mesh = mesh
    params = {
        "text": {"transformer": {"layers": {"attn": {"qkv": {
            "kernel": jnp.zeros((2, 32, 96))}}}},
                 "text_projection": {"kernel": jnp.zeros((32, 16))}},
    }
    state = new_train_state(params=params, batch_stats={}, opt_state=())
    fake.config = parse_config("parallelism: {pp: 2, microbatches: 4}")
    placed = Solver._place_state(fake, state)
    qkv = placed.params["text"]["transformer"]["layers"]["attn"]["qkv"][
        "kernel"]
    assert qkv.sharding.spec == P("pipe")
    proj = placed.params["text"]["text_projection"]["kernel"]
    assert proj.sharding.is_fully_replicated

    specs = pp_state_shardings(mesh, state)
    assert specs.params["text"]["text_projection"]["kernel"].spec == P()
