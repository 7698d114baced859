"""loss_impl config wiring: full / chunked / ring must produce the same
losses AND the same parameter gradients through the FULL train step on the
8-device mesh (VERDICT r1 item 5; SURVEY.md §5.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from declip_tpu.config import parse_config
from declip_tpu.models import model_entry
from declip_tpu.optim import optim_entry, scheduler_entry
from declip_tpu.train import make_train_step, new_train_state

RES = 32


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


def _run_one_step(loss_impl, mesh, model, batch, variables):
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
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state = jax.device_put(state, rep)
    batch = {k: jax.device_put(v, data) for k, v in batch.items()}
    step = jax.jit(make_train_step(model, tx, cfg, sched, mesh=mesh))
    with mesh:
        new_state, metrics = step(state, batch)
    return jax.device_get(new_state), {k: float(v) for k, v in metrics.items()}


@pytest.fixture(scope="module")
def setup():
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    model = _model()
    batch = _batch()
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True))()
    return mesh, model, batch, variables


def test_loss_impls_match_through_full_train_step(setup):
    mesh, model, batch, variables = setup
    ref_state, ref_metrics = _run_one_step(None, mesh, model, batch, variables)
    for impl in ({"type": "chunked", "chunk_size": 8}, {"type": "ring"},
                 "chunked", "ring"):
        state, metrics = _run_one_step(impl, mesh, model, batch, variables)
        assert metrics["loss"] == pytest.approx(
            ref_metrics["loss"], rel=1e-5), impl
        # identical updated params = identical gradients through tx
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"params diverged under loss_impl={impl}")


def test_declip_loss_impls_match(setup):
    mesh = setup[0]
    model = model_entry({
        "type": "declip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 32, "input_resolution": RES,
                             "patch_size": 32, "width": 32, "layers": 2,
                             "heads": 2},
            "text_encode": {"embed_dim": 32, "transformer_width": 32,
                            "transformer_heads": 2, "transformer_layers": 2},
            "clip": {"use_allgather": True, "return_nn_bank": True,
                     "feature_dim": 32},
        },
    })
    rng = np.random.default_rng(1)
    n = 16
    batch = {
        "images": jnp.asarray(
            rng.normal(size=(n, RES, RES, 6)), jnp.float32),
        "tokens": jnp.asarray(rng.integers(1, 100, (n, 77)), jnp.int32),
        "tokens_aug": jnp.asarray(rng.integers(1, 100, (n, 77)), jnp.int32),
    }
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True))()

    from declip_tpu.models.memory_bank import init_bank

    def run(impl):
        cfg = parse_config(
            "clip_simsiam_loss_weight: {clip_loss: 0.5, simsiam_loss: 0.3, "
            "nn_text: 0.2}\n"
            "data: {train: {image_text_two_view: True}}")
        if impl is not None:
            cfg["loss_impl"] = impl
        params = variables["params"]
        sched = scheduler_entry(
            {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                          "warmup_steps": 2}}, max_iter=10)
        tx = optim_entry({"type": "AdamW", "kwargs": {"lr": 1e-3}},
                         params, sched)
        state = new_train_state(
            params=params, batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            bank_text=init_bank(jax.random.PRNGKey(1), 64, 32))
        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        state = jax.device_put(state, rep)
        b = {k: jax.device_put(v, data) for k, v in batch.items()}
        step = jax.jit(make_train_step(model, tx, cfg, sched, mesh=mesh,
                                       total_steps=10))
        with mesh:
            new_state, metrics = step(state, b)
        return jax.device_get(new_state), float(metrics["loss"])

    ref_state, ref_loss = run(None)
    for impl in ({"type": "chunked", "chunk_size": 8}, {"type": "ring"}):
        state, loss = run(impl)
        assert loss == pytest.approx(ref_loss, rel=1e-5), impl
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"declip params diverged under loss_impl={impl}")
