"""Mixture-of-Experts towers + expert parallelism (models/layers.py
MoeMlpBlock, parallel/tp.py moe rules, parallelism: {ep: N}).

Beyond-reference capability: the reference (Sense-GVT/DeCLIP) is dense-only;
this is the sparse-scaling analogue of its transformer towers, built
GShard/Switch-style (one-hot dispatch einsums, static capacity) so every
FLOP lands on the MXU. Tests: degenerate-MoE == dense MLP numerics,
capacity-drop semantics, aux loss wiring through the train step, EP-mesh
([data, expert]) numeric parity with single-device, and param placement."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from declip_tpu.config import parse_config
from declip_tpu.models import model_entry
from declip_tpu.models.layers import MlpBlock, MoeMlpBlock
from declip_tpu.parallel import make_mesh
from declip_tpu.parallel.mesh import batch_sharding
from declip_tpu.parallel.tp import (
    clear_activation_sharding,
    param_specs,
    set_activation_sharding,
    shard_train_state_tp,
)
from declip_tpu.train import make_train_step

from test_train_step import build_state, make_batch


def moe_model(num_experts=4, top_k=2, **moe_extra):
    node = {
        "type": "clip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 32, "input_resolution": 64,
                             "patch_size": 32, "width": 32, "layers": 2,
                             "heads": 2,
                             "moe": {"num_experts": num_experts,
                                     "top_k": top_k, **moe_extra}},
            "text_encode": {"embed_dim": 32, "transformer_width": 32,
                            "transformer_heads": 2, "transformer_layers": 2,
                            "vocab_size": 128,
                            "moe": {"num_experts": num_experts,
                                    "top_k": top_k, **moe_extra}},
            "clip": {"use_allgather": True},
        },
    }
    return model_entry(node)


def moe_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": jnp.asarray(rng.normal(size=(n, 64, 64, 3)), jnp.float32),
        "tokens": jnp.asarray(rng.integers(1, 120, (n, 77)), jnp.int32),
    }


def test_single_expert_equals_dense_mlp():
    """E=1, k=1, capacity >= n routes every token through the one expert
    with gate 1.0 — numerically identical to the dense MlpBlock with the
    same weights."""
    d, b, t = 16, 2, 5
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)

    dense = MlpBlock()
    dv = dense.init(jax.random.PRNGKey(0), x)
    y_dense = dense.apply(dv, x)

    moe = MoeMlpBlock(num_experts=1, top_k=1, capacity_factor=1.0)
    mv = moe.init(jax.random.PRNGKey(0), x)
    # copy the dense weights into the single expert's [1, ...] slots
    p = jax.tree.map(lambda a: a, mv["params"])
    p["wi"] = dv["params"]["c_fc"]["kernel"][None]
    p["bi"] = dv["params"]["c_fc"]["bias"][None]
    p["wo"] = dv["params"]["c_proj"]["kernel"][None]
    p["bo"] = dv["params"]["c_proj"]["bias"][None]
    y_moe, aux = moe.apply({"params": p}, x)

    np.testing.assert_allclose(np.asarray(y_moe), np.asarray(y_dense),
                               atol=1e-5)
    # aux loss at E=1 is exactly 1.0 (1 * frac(1.0) * prob(1.0))
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


def test_capacity_overflow_drops_tokens():
    """With capacity_factor << 1 most tokens overflow their expert's
    buffer: their expert-path output is exactly zero (they ride the
    residual in the block)."""
    d, b, t = 16, 4, 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    moe = MoeMlpBlock(num_experts=2, top_k=1, capacity_factor=0.1)
    mv = moe.init(jax.random.PRNGKey(0), x)
    y, _ = moe.apply(mv, x)
    rows = np.asarray(y).reshape(b * t, d)
    n_zero = int((np.abs(rows).max(axis=1) == 0).sum())
    # cap = ceil(1 * 32 * 0.1 / 2) = 2 slots/expert -> at most 4 of the 32
    # tokens served
    assert n_zero >= b * t - 4, n_zero
    assert n_zero < b * t  # but some tokens WERE served


def test_moe_step_trains_and_reports_aux():
    """Full train step on an MoE CLIP: loss finite, moe_aux_loss metric
    present, router + expert weights receive updates."""
    model = moe_model()
    cfg = parse_config("x: 0")
    batch = moe_batch(16)
    state, tx, sched = build_state(model, batch, cfg)
    step = jax.jit(make_train_step(model, tx, cfg, sched))
    state1, metrics = step(state, batch)
    state1, metrics = step(state1, batch)  # warmup lr(0) == 0: step twice
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["moe_aux_loss"]) > 0
    moe0 = state.params["visual"]["transformer"]["layers"]["moe"]
    moe1 = state1.params["visual"]["transformer"]["layers"]["moe"]
    for k in ("router", "wi", "wo"):
        assert not np.allclose(np.asarray(moe0[k]), np.asarray(moe1[k])), k


def test_param_specs_expert_rules():
    """On an expert mesh the MoE FFN tensors shard over 'expert'; the
    router and all dense leaves stay replicated; the 'model' TP rules
    degrade to replicated (no model axis present)."""
    mesh = make_mesh(ep=2)
    assert dict(mesh.shape) == {"data": 4, "expert": 2}
    model = moe_model()
    batch = moe_batch(8)
    cfg = parse_config("x: 0")
    state, _, _ = build_state(model, batch, cfg)
    specs = param_specs(mesh, state.params)
    m = specs["visual"]["transformer"]["layers"]["moe"]
    assert m["wi"] == P(None, "expert", None, None)  # [L, E, D, H]
    assert m["wo"] == P(None, "expert", None, None)
    assert m["bi"] == P(None, "expert", None)
    assert m["router"] == P()
    t = specs["text"]["transformer"]["layers"]
    assert t["attn"]["qkv"]["kernel"] == P()  # no 'model' axis -> replicated


def test_ep_step_matches_single_device():
    """Same jitted step: single-device vs [data=4, expert=2] mesh with the
    batch sharded over BOTH axes and expert FFNs sharded over 'expert'
    must produce the same loss; expert weights actually distributed."""
    model = moe_model()
    cfg = parse_config("x: 0")
    batch = moe_batch(16)
    state, tx, sched = build_state(model, batch, cfg)

    step = jax.jit(make_train_step(model, tx, cfg, sched))
    s0, m0 = step(state, batch)
    loss0 = float(m0["loss"])

    mesh = make_mesh(ep=2)
    set_activation_sharding(mesh, model_axis=None)
    try:
        sb = jax.device_put(batch, batch_sharding(mesh))
        assert not sb["images"].sharding.is_fully_replicated
        s_ep = shard_train_state_tp(mesh, state)
        wi = s_ep.params["visual"]["transformer"]["layers"]["moe"]["wi"]
        assert not wi.sharding.is_fully_replicated
        assert wi.addressable_shards[0].data.shape[1] == wi.shape[1] // 2
        step_ep = jax.jit(make_train_step(model, tx, cfg, sched))
        s1, m1 = step_ep(s_ep, sb)
        np.testing.assert_allclose(loss0, float(m1["loss"]), rtol=2e-5)
        np.testing.assert_allclose(
            float(m0["moe_aux_loss"]), float(m1["moe_aux_loss"]), rtol=2e-5)
        for a, b in zip(jax.tree.leaves(s0.params),
                        jax.tree.leaves(s1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-3)
    finally:
        clear_activation_sharding()


def test_solver_place_state_ep():
    """`parallelism: {ep: N}` routes Solver placement through the tp-rule
    path (expert FFNs over 'expert')."""
    from declip_tpu.solver import Solver
    from declip_tpu.train import new_train_state

    mesh = make_mesh(ep=2)
    fake = object.__new__(Solver)
    fake.mesh = mesh
    params = {"visual": {"transformer": {"layers": {"moe": {
        "wi": jnp.zeros((2, 4, 32, 128))}}}}}
    state = new_train_state(params=params, batch_stats={}, opt_state=())
    fake.config = parse_config("parallelism: {ep: 2}")
    placed = Solver._place_state(fake, state)
    wi = placed.params["visual"]["transformer"]["layers"]["moe"]["wi"]
    assert wi.sharding.spec == P(None, "expert", None, None)
