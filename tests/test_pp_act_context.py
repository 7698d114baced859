"""Pipeline parallelism composed with the activation-sharding context.

Round-4 made the Solver install the tp.py activation context for EVERY
multi-device mesh (so the Pallas attention dispatch can see the mesh), which
means a pure-pp run traces ``constrain`` calls INSIDE pp.py's shard_map body
— where ``with_sharding_constraint`` raises ("vma axes should be Manual")
and a nested shard_map over the same mesh errors. Regression tests for the
manual-region guards (tp.in_manual_region): constraints must no-op and the
Pallas dispatch must run the bare kernel on the local shard.

Reference: beyond-reference capability (linklink DDP is data-parallel only).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from declip_tpu.models.layers import Transformer
from declip_tpu.parallel import make_mesh
from declip_tpu.parallel.pp import clear_pipeline_context, set_pipeline_context
from declip_tpu.parallel.tp import (
    clear_activation_sharding,
    in_manual_region,
    set_activation_sharding,
)


def _contexts(mesh, n_micro=2):
    class _Ctx:
        def __enter__(self):
            set_pipeline_context(mesh, n_micro=n_micro)
            set_activation_sharding(mesh, data_axis="data", model_axis=None)

        def __exit__(self, *a):
            clear_pipeline_context()
            clear_activation_sharding()

    return _Ctx()


def _pp_params_sharding(mesh, params):
    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: NamedSharding(
            mesh,
            P("pipe") if any(
                getattr(k, "key", None) == "layers" for k in kp) else P()),
        params)


def test_in_manual_region_probe():
    mesh = make_mesh(pp=2)
    assert not in_manual_region()

    seen = {}

    def body(x):
        seen["inside"] = in_manual_region(x)
        return x * 2

    f = jax.shard_map(body, mesh=mesh, in_specs=P("data"),
                      out_specs=P("data"), check_vma=False)
    jax.jit(f)(jnp.ones((8, 4)))
    assert seen["inside"] is True
    assert not in_manual_region()


def test_pp_with_activation_context():
    """B=16 on [data=4, pipe=2]: per-stage local batch (4) divides the
    data-axis size, the case that made constrain raise inside the GPipe
    body before the manual-region guard."""
    model = Transformer(width=32, layers=4, heads=2, causal=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 10, 32)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, x):
        return (model.apply({"params": p}, x) ** 2).mean()

    ref, ref_grad = jax.jit(jax.value_and_grad(loss))(params, x)

    mesh = make_mesh(pp=2)
    with _contexts(mesh):
        params_s = jax.device_put(params, _pp_params_sharding(mesh, params))
        x_s = jax.device_put(x, NamedSharding(mesh, P("data")))
        pp_val, pp_grad = jax.jit(jax.value_and_grad(loss))(params_s, x_s)
    np.testing.assert_allclose(float(ref), float(pp_val), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_grad), jax.tree.leaves(pp_grad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_pp_with_pallas_attention():
    """attn_impl='pallas' under pp + activation context: the dispatch sees
    a multi-device mesh but is already inside the pipeline's shard_map —
    it must run the bare (interpret-mode on CPU) kernel on the local shard
    instead of nesting a shard_map. Parity vs the XLA path."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 8, 32)), jnp.float32)

    ref_model = Transformer(width=32, layers=2, heads=2, attn_impl="xla")
    params = ref_model.init(jax.random.PRNGKey(0), x)["params"]
    ref = jax.jit(
        lambda p, x: ref_model.apply({"params": p}, x))(params, x)

    model = Transformer(width=32, layers=2, heads=2, attn_impl="pallas")
    mesh = make_mesh(pp=2)
    with _contexts(mesh):
        params_s = jax.device_put(params, _pp_params_sharding(mesh, params))
        x_s = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(
            lambda p, x: model.apply({"params": p}, x))(params_s, x_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
