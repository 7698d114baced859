"""SigLIP pairwise sigmoid loss (beyond-reference; Zhai et al. 2023).

Covers: loss value vs a naive dense formula; grad parity of
sigmoid / sigmoid_chunked / sigmoid_ring through the FULL train step on the
8-device mesh (same harness as test_loss_impl.py); the optional learnable
``logit_bias`` param (present only when ``clip: {logit_bias_init: ...}`` is
set — reference checkpoint-key parity otherwise) and its param-group
classification (rides the zero-wd logit_scale group)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from declip_tpu.config import parse_config
from declip_tpu.models import model_entry
from declip_tpu.ops.contrastive import (
    chunked_sigmoid_pair_loss,
    sigmoid_pair_loss,
)
from declip_tpu.optim import optim_entry, scheduler_entry
from declip_tpu.optim.param_groups import classify_param
from declip_tpu.train import make_train_step, new_train_state

RES = 32


def _naive_sigmoid_loss(img, txt, s, b):
    """-1/B * sum_ij log sigmoid(z_ij * (s x_i.y_j + b)), z=+1 on diagonal."""
    logits = s * (np.asarray(img) @ np.asarray(txt).T) + b
    z = 2.0 * np.eye(img.shape[0]) - 1.0
    # log sigmoid(x) = -log1p(exp(-x)), stable form
    x = z * logits
    logsig = np.where(x >= 0, -np.log1p(np.exp(-x)), x - np.log1p(np.exp(x)))
    return float(-logsig.sum(axis=-1).mean())


def test_sigmoid_value_matches_naive():
    rng = np.random.default_rng(0)
    b, d = 12, 16
    img = rng.normal(size=(b, d)).astype(np.float32)
    txt = rng.normal(size=(b, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    s, bias = 10.0, -10.0
    want = _naive_sigmoid_loss(img, txt, s, bias)
    scale = (jnp.asarray([s]), jnp.asarray(bias))
    loss, logits, labels = jax.jit(sigmoid_pair_loss)(
        jnp.asarray(img), jnp.asarray(txt), scale)
    assert float(loss) == pytest.approx(want, rel=1e-5)
    assert logits.shape == (b, b)
    np.testing.assert_array_equal(np.asarray(labels), np.arange(b))
    # chunked is the exact same objective term-for-term, incl. the pad-mask
    # path (chunk 5 does not divide 12)
    for chunk in (4, 5, 64):
        got = jax.jit(
            lambda i, t, sc: chunked_sigmoid_pair_loss(i, t, sc,
                                                       chunk_size=chunk)
        )(jnp.asarray(img), jnp.asarray(txt), scale)
        assert float(got) == pytest.approx(want, rel=1e-5), chunk


def test_sigmoid_bare_scale_defaults_bias_zero():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(8, 16)).astype(np.float32)
    txt = rng.normal(size=(8, 16)).astype(np.float32)
    want = _naive_sigmoid_loss(img, txt, 7.0, 0.0)
    loss, _, _ = jax.jit(sigmoid_pair_loss)(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray([7.0]))
    assert float(loss) == pytest.approx(want, rel=1e-5)


def _model(logit_bias_init=-10.0):
    clip_kw = {"use_allgather": True}
    if logit_bias_init is not None:
        clip_kw["logit_bias_init"] = logit_bias_init
    return model_entry({
        "type": "clip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 32, "input_resolution": RES,
                             "patch_size": 32, "width": 32, "layers": 2,
                             "heads": 2},
            "text_encode": {"embed_dim": 32, "transformer_width": 32,
                            "transformer_heads": 2, "transformer_layers": 2},
            "clip": clip_kw,
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


def test_logit_bias_param_wiring(setup):
    _, model, batch, variables = setup
    # param exists, initialized to logit_bias_init, and is emitted in out
    assert "logit_bias" in variables["params"], variables["params"].keys()
    out = model.apply(variables, batch, train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert float(out["logit_bias"]) == pytest.approx(-10.0)
    # without logit_bias_init the param tree has NO logit_bias key
    # (reference pth checkpoint-key parity)
    plain = _model(logit_bias_init=None)
    v2 = jax.jit(
        lambda: plain.init(jax.random.PRNGKey(0), batch, train=True))()
    names = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(v2["params"])[0]]
    assert not any("logit_bias" in n for n in names)
    out2 = plain.apply(v2, batch, train=False,
                       rngs={"dropout": jax.random.PRNGKey(0)})
    assert "logit_bias" not in out2


def test_logit_bias_param_group():
    # rides the logit_scale group: zero weight decay under existing pconfigs
    assert classify_param(("logit_bias",), jnp.zeros((1,))) == "logit_scale"
    assert classify_param(("logit_scale",), jnp.zeros((1,))) == "logit_scale"


def test_sigmoid_impls_match_through_full_train_step(setup):
    mesh, model, batch, variables = setup
    ref_state, ref_metrics = _run_one_step(
        {"type": "sigmoid"}, mesh, model, batch, variables)
    # sanity: the sigmoid loss at init with bias=-10 is near -B*logsig(-10)...
    # just check it is finite and positive
    assert np.isfinite(ref_metrics["loss"]) and ref_metrics["loss"] > 0
    assert ref_metrics["logit_bias"] == pytest.approx(-10.0, abs=1e-2)
    for impl in ({"type": "sigmoid_chunked", "chunk_size": 8},
                 {"type": "sigmoid_chunked", "chunk_size": 5},
                 {"type": "sigmoid_ring"}):
        state, metrics = _run_one_step(impl, mesh, model, batch, variables)
        assert metrics["loss"] == pytest.approx(
            ref_metrics["loss"], rel=1e-5), impl
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"params diverged under loss_impl={impl}")


def test_sigmoid_differs_from_softmax(setup):
    # guard against silently falling back to InfoNCE
    mesh, model, batch, variables = setup
    _, sig = _run_one_step({"type": "sigmoid"}, mesh, model, batch, variables)
    _, soft = _run_one_step({"type": "full"}, mesh, model, batch, variables)
    assert sig["loss"] != pytest.approx(soft["loss"], rel=1e-3)


def test_siglip_recipe_config_runs(tmp_path):
    """The bundled SigLIP recipe (experiments/clip_experiments/yfcc15m/
    yfcc15m_vit_siglip) trains 2 steps + zero-shot eval through the
    production Solver on the 8-device mesh: sigmoid_ring loss + Adafactor +
    logit_scale_init=log10 / logit_bias_init=-10 all exercised together."""
    import json
    import os
    import shutil

    from declip_tpu.config import override
    from declip_tpu.solver import Solver

    path = os.path.join(
        os.path.dirname(__file__), "..", "experiments", "clip_experiments",
        "yfcc15m", "yfcc15m_vit_siglip", "config.yaml")
    shutil.copy(path, tmp_path / "config.yaml")
    cfg = parse_config(path)
    # hermetic-necessity overrides only (same set as
    # test_reference_configs_run._hermetic_overrides): synthetic storage,
    # tiny shapes/steps — the recipe's model/loss/optimizer stay untouched
    cfg = override(cfg, "model.kwargs.image_encode",
                   {"embed_dim": 64, "input_resolution": 64, "patch_size": 32,
                    "width": 64, "layers": 2, "heads": 2})
    cfg = override(cfg, "model.kwargs.text_encode",
                   {"embed_dim": 64, "transformer_width": 64,
                    "transformer_heads": 2, "transformer_layers": 2,
                    "bpe_path": None})
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 2)
    cfg = override(cfg, "lr_scheduler.kwargs.warmup_steps", 1)
    cfg = override(cfg, "data.batch_size", 1)
    cfg = override(cfg, "data.num_workers", 2)
    cfg = override(cfg, "data.read_from", "synthetic")
    cfg = override(cfg, "data.train.read_from", "synthetic")
    cfg = override(cfg, "data.train.meta_file", "32")
    cfg = override(cfg, "data.train.root_dir", "")
    cfg = override(cfg, "data.train.fseek", False)
    cfg = override(cfg, "data.train.batch_size", 1)
    cfg = override(cfg, "data.train.num_workers", 2)
    cfg = override(cfg, "data.test", [{
        "type": "clip", "read_from": "synthetic", "meta_file": "16",
        "batch_size": 8, "transforms": {"type": "ONECROP"},
        "label_texts_ensemble": "prompt8",
    }])
    cfg = override(cfg, "saver.print_freq", 1)
    cfg = override(cfg, "saver.val_freq", 0)
    cfg = override(cfg, "saver.save_freq", 0)
    cfg = override(cfg, "saver.pretrain", {"auto_resume": False, "path": None})
    cfg["_config_path"] = str(tmp_path / "config.yaml")

    solver = Solver(cfg)
    # the recipe's inits reached the params
    ls = float(np.asarray(solver.state.params["logit_scale"])[0])
    lb = float(np.asarray(solver.state.params["logit_bias"])[0])
    assert ls == pytest.approx(2.302585, abs=1e-6)
    assert lb == pytest.approx(-10.0)
    solver.train()
    assert int(solver.state.step) == 2
    scalars = (tmp_path / "events" / "scalars.jsonl").read_text().splitlines()
    by_tag = {}
    for line in scalars:
        rec = json.loads(line)
        by_tag.setdefault(rec["tag"], []).append(rec["value"])
    assert np.isfinite(by_tag["loss"]).all()
    assert "eval0/top1" in by_tag
