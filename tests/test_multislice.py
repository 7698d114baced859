"""Multi-slice data parallelism (``parallelism: {slices: N}``).

Beyond-reference capability (the reference's linklink/NCCL DP is flat,
SURVEY.md §2.1): a hybrid [dcn, data] mesh models the real multi-slice TPU
topology — fast ICI inside a slice, slower DCN between slices. The batch
shards over BOTH axes; losses must produce the SAME math as flat DP, and
the ring InfoNCE must run its hierarchical schedule (inner ppermute cycles
on 'data', one 'dcn' shift per cycle — ops/contrastive.py _nested_ring)
without materializing the global logits.

Runs on the virtual 8-device CPU mesh (2 slices x 4 chips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from declip_tpu.config import parse_config
from declip_tpu.models import model_entry
from declip_tpu.ops.contrastive import (
    clip_pair_loss,
    make_pair_loss,
    sigmoid_pair_loss,
)
from declip_tpu.optim import optim_entry, scheduler_entry
from declip_tpu.parallel.mesh import batch_axes, batch_sharding, make_mesh
from declip_tpu.train import make_train_step, new_train_state

RES = 32


def _normed(shape, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def test_mesh_construction_and_batch_axes():
    mesh = make_mesh(slices=2)
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.shape["dcn"] == 2 and mesh.shape["data"] == 4
    assert batch_axes(mesh) == ("dcn", "data")
    spec = batch_sharding(mesh).spec
    assert spec == P(("dcn", "data"))
    # slice-major ordering is a no-op for CPU devices (no slice_index)
    flat = make_mesh()
    assert batch_axes(flat) == ("data",)
    assert batch_sharding(flat).spec == P("data")


def test_slices_compose_with_tp_mesh():
    mesh = make_mesh(slices=2, tp=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}


def test_slices_refuse_pp():
    with pytest.raises(ValueError, match="slices"):
        make_mesh(slices=2, pp=2)


def test_hierarchical_ring_matches_full_loss_and_grads():
    mesh = make_mesh(slices=2)
    img, txt = _normed((32, 16), 0), _normed((32, 16), 1)
    scale = jnp.float32(30.0)
    ref, (gi, gt) = jax.value_and_grad(
        lambda i, t: clip_pair_loss(i, t, scale, None)[0],
        argnums=(0, 1))(img, txt)

    pair = make_pair_loss({"loss_impl": {"type": "ring"}}, mesh=mesh)
    with mesh:
        val, (ri, rt) = jax.jit(jax.value_and_grad(
            lambda i, t: pair(i, t, scale)[0], argnums=(0, 1)))(
            jax.device_put(img, batch_sharding(mesh)),
            jax.device_put(txt, batch_sharding(mesh)))
    assert float(val) == pytest.approx(float(ref), rel=1e-5)
    np.testing.assert_allclose(np.asarray(ri), np.asarray(gi), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(gt), atol=1e-5)


def test_hierarchical_sigmoid_ring_matches_full():
    mesh = make_mesh(slices=2)
    img, txt = _normed((32, 16), 2), _normed((32, 16), 3)
    scale = (jnp.float32(10.0), jnp.float32(-10.0))
    ref = sigmoid_pair_loss(img, txt, scale, None)
    ref = ref[0] if isinstance(ref, tuple) else ref
    pair = make_pair_loss({"loss_impl": {"type": "sigmoid_ring"}}, mesh=mesh)
    with mesh:
        val = jax.jit(lambda i, t: pair(i, t, scale)[0])(
            jax.device_put(img, batch_sharding(mesh)),
            jax.device_put(txt, batch_sharding(mesh)))
    assert float(val) == pytest.approx(float(ref), rel=1e-5)


# ---------------------------------------------------------- full train step

def _model():
    return model_entry({
        "type": "clip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 32, "input_resolution": RES,
                             "patch_size": 32, "width": 32, "layers": 2,
                             "heads": 2},
            "text_encode": {"embed_dim": 32, "transformer_width": 32,
                            "transformer_heads": 2, "transformer_layers": 2},
            "clip": {"use_allgather": True},
        },
    })


def _batch(n=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": jnp.asarray(rng.normal(size=(n, RES, RES, 3)), jnp.float32),
        "tokens": jnp.asarray(rng.integers(1, 100, (n, 77)), jnp.int32),
    }


def _run_one_step(mesh, model, batch, variables, loss_impl=None):
    cfg = parse_config("{}")
    if loss_impl is not None:
        cfg["loss_impl"] = loss_impl
    params = variables["params"]
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                      "warmup_steps": 2}}, max_iter=10)
    tx = optim_entry({"type": "AdamW", "kwargs": {"lr": 1e-3}}, params, sched)
    state = new_train_state(params=params, batch_stats={},
                            opt_state=tx.init(params))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    batch = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in batch.items()}
    step = jax.jit(make_train_step(model, tx, cfg, sched, mesh=mesh))
    with mesh:
        new_state, metrics = step(state, batch)
    return jax.device_get(new_state), {k: float(v) for k, v in metrics.items()}


@pytest.fixture(scope="module")
def setup():
    model = _model()
    batch = _batch()
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True))()
    return model, batch, variables


def test_multislice_step_matches_flat_dp(setup):
    """One train step on the hybrid 2x4 mesh must equal flat 8-way DP —
    same loss, same updated parameters (the mesh is a layout, not math)."""
    model, batch, variables = setup
    flat_state, flat_m = _run_one_step(make_mesh(), model, batch, variables)
    ms_state, ms_m = _run_one_step(make_mesh(slices=2), model, batch,
                                   variables)
    assert ms_m["loss"] == pytest.approx(flat_m["loss"], rel=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        flat_state.params, ms_state.params)


def test_multislice_ring_step_matches_flat_dp(setup):
    """The hierarchical ring loss through the full train step on the hybrid
    mesh equals the flat-DP full loss (grad parity via updated params)."""
    model, batch, variables = setup
    flat_state, flat_m = _run_one_step(make_mesh(), model, batch, variables)
    ms_state, ms_m = _run_one_step(make_mesh(slices=2), model, batch,
                                   variables, loss_impl={"type": "ring"})
    assert ms_m["loss"] == pytest.approx(flat_m["loss"], rel=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        flat_state.params, ms_state.params)


def test_multislice_fsdp_composition(setup):
    """slices + fsdp: ZeRO-3 shards stay on the intra-slice 'data' axis
    (replicated over 'dcn' — weight gathers ride ICI, never DCN) and the
    step reproduces flat-DP losses."""
    from declip_tpu.parallel.fsdp import shard_train_state
    from declip_tpu.parallel.tp import (
        clear_activation_sharding,
        set_activation_sharding,
    )

    model, batch, variables = setup
    flat_state, flat_m = _run_one_step(make_mesh(), model, batch, variables)

    mesh = make_mesh(slices=2)
    try:
        set_activation_sharding(mesh, data_axis=("dcn", "data"),
                                model_axis=None)
        cfg = parse_config("{}")
        params = variables["params"]
        sched = scheduler_entry(
            {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                          "warmup_steps": 2}}, max_iter=10)
        tx = optim_entry({"type": "AdamW", "kwargs": {"lr": 1e-3}}, params,
                         sched)
        state = new_train_state(params=params, batch_stats={},
                                opt_state=tx.init(params))
        state = shard_train_state(mesh, state, min_size=256)
        sharded = [leaf for leaf in jax.tree.leaves(state.params)
                   if not leaf.sharding.is_fully_replicated]
        assert sharded, "FSDP sharded no leaf on the hybrid mesh"
        for leaf in sharded:
            # 4-way 'data' shards only: 1/4 per device, never 1/8
            assert leaf.addressable_shards[0].data.size == leaf.size // 4
        b = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in batch.items()}
        step = jax.jit(make_train_step(model, tx, cfg, sched, mesh=mesh))
        with mesh:
            state, metrics = step(state, b)
        assert float(metrics["loss"]) == pytest.approx(
            flat_m["loss"], rel=2e-5)
    finally:
        clear_activation_sharding()


def test_multislice_tp_composition(setup):
    """slices + tp: a [dcn=2, data=2, model=2] mesh — Megatron shards over
    'model', batch over (dcn, data); step reproduces flat-DP losses."""
    from declip_tpu.parallel.tp import (
        clear_activation_sharding,
        set_activation_sharding,
        shard_train_state_tp,
    )

    model, batch, variables = setup
    flat_state, flat_m = _run_one_step(make_mesh(), model, batch, variables)

    mesh = make_mesh(slices=2, tp=2)
    try:
        set_activation_sharding(mesh, data_axis=("dcn", "data"))
        cfg = parse_config("{}")
        params = variables["params"]
        sched = scheduler_entry(
            {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                          "warmup_steps": 2}}, max_iter=10)
        tx = optim_entry({"type": "AdamW", "kwargs": {"lr": 1e-3}}, params,
                         sched)
        state = new_train_state(params=params, batch_stats={},
                                opt_state=tx.init(params))
        state = shard_train_state_tp(mesh, state)
        assert any(not leaf.sharding.is_fully_replicated
                   for leaf in jax.tree.leaves(state.params))
        b = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in batch.items()}
        step = jax.jit(make_train_step(model, tx, cfg, sched, mesh=mesh))
        with mesh:
            state, metrics = step(state, b)
        assert float(metrics["loss"]) == pytest.approx(
            flat_m["loss"], rel=2e-5)
    finally:
        clear_activation_sharding()


def test_slice_major_rejects_topology_mismatch():
    """Devices carrying slice_index that cannot partition into `slices`
    equal groups must raise — a 'dcn' axis cutting across real slice
    boundaries would silently put 'data' collectives on DCN."""
    import numpy as np
    import pytest

    from declip_tpu.parallel.mesh import _slice_major

    class _Dev:
        def __init__(self, i, s):
            self.id, self.slice_index = i, s

        def __repr__(self):
            return f"d{self.id}s{self.slice_index}"

    # 4 physical slices of 2, asked for slices=2 -> refuse
    devs = np.array([_Dev(i, i // 2) for i in range(8)])
    with pytest.raises(ValueError, match="slice_index"):
        _slice_major(devs, 2)
    # uneven groups (3+5) at slices=2 -> refuse
    devs = np.array([_Dev(i, 0 if i < 3 else 1) for i in range(8)])
    with pytest.raises(ValueError, match="slice_index"):
        _slice_major(devs, 2)
    # matching topology: sorted slice-major
    devs = np.array([_Dev(i, i % 2) for i in range(8)])
    out = _slice_major(devs, 2)
    assert [d.slice_index for d in out] == [0] * 4 + [1] * 4
    # no slice_index (CPU test meshes): keep given order
    class _Plain:
        def __init__(self, i):
            self.id = i

    devs = np.array([_Plain(i) for i in range(8)])
    out = _slice_major(devs, 2)
    assert [d.id for d in out] == list(range(8))
