"""GradCache chunked-batch training (train/grad_cache.py): exact-gradient
parity vs the standard full-batch step, for CLIP and the full DeCLIP recipe
(bank + MLM + EDA two-text + SimSiam), plus the loud-refusal gates.

The claim under test is the strong one: grad_cache is NOT gradient
accumulation — InfoNCE negatives stay the full batch, so one step from the
same state must produce (numerically) the SAME new params as the unchunked
step, at fp32 within reduction-order noise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from declip_tpu.config import parse_config
from declip_tpu.models import model_entry
from declip_tpu.models.memory_bank import init_bank
from declip_tpu.optim import optim_entry, scheduler_entry
from declip_tpu.train import EmaConfig, init_ema, make_train_step, new_train_state


def _tiny_clip():
    return model_entry({"type": "clip_vitb32", "kwargs": {
        "image_encode": {"embed_dim": 32, "input_resolution": 64,
                         "patch_size": 16, "width": 32, "layers": 2,
                         "heads": 2},
        "text_encode": {"embed_dim": 32, "transformer_width": 32,
                        "transformer_heads": 2, "transformer_layers": 2,
                        "vocab_size": 97},
        "clip": {"use_allgather": True}}})


def _tiny_declip():
    return model_entry({"type": "declip_vitb32", "kwargs": {
        "image_encode": {"embed_dim": 32, "input_resolution": 64,
                         "patch_size": 16, "width": 32, "layers": 2,
                         "heads": 2},
        "text_encode": {"embed_dim": 32, "transformer_width": 32,
                        "transformer_heads": 2, "transformer_layers": 2,
                        "vocab_size": 97},
        "clip": {"use_allgather": True, "text_mask_type": "MLM",
                 "return_nn_bank": True, "feature_dim": 32}}})


def _clip_batch(b):
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.normal(size=(b, 64, 64, 3)), jnp.float32),
        "tokens": jnp.asarray(rng.integers(1, 97, (b, 77)), jnp.int32),
    }


def _declip_batch(b):
    rng = np.random.default_rng(0)
    labels = np.full((b, 77), -100, np.int32)
    labels[:, 2:9] = 5
    return {
        "images": jnp.asarray(rng.normal(size=(b, 64, 64, 6)), jnp.float32),
        "tokens": jnp.asarray(rng.integers(1, 97, (b, 77)), jnp.int32),
        "tokens_aug": jnp.asarray(rng.integers(1, 97, (b, 77)), jnp.int32),
        "mlm_tokens": jnp.asarray(rng.integers(1, 97, (b, 77)), jnp.int32),
        "mlm_labels": jnp.asarray(labels),
    }


def _state_and_tx(model, batch, *, bank_dim=0):
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True))()
    params = variables["params"]
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                      "warmup_steps": 2}}, max_iter=10)
    tx = optim_entry({"type": "AdamW",
                      "kwargs": {"lr": 1e-3, "weight_decay": 0.1}},
                     params, sched, pconfig={}, grad_clip={})
    state = new_train_state(
        params=params, batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=init_ema(params, EmaConfig(0.999)),
        bank_text=(init_bank(jax.random.PRNGKey(1), 128, bank_dim)
                   if bank_dim else None))
    return state, tx, sched


def _run_pair(model, batch, cfg_yaml, *, bank_dim=0, chunks=4):
    cfg_full = parse_config(cfg_yaml)
    cfg_gc = parse_config(cfg_yaml)
    cfg_gc["grad_cache"] = {"chunks": chunks}

    state, tx, sched = _state_and_tx(model, batch, bank_dim=bank_dim)
    step_full = jax.jit(make_train_step(
        model, tx, cfg_full, sched, ema_cfg=EmaConfig(0.999), total_steps=10))
    step_gc = jax.jit(make_train_step(
        model, tx, cfg_gc, sched, ema_cfg=EmaConfig(0.999), total_steps=10))

    s_full, m_full = step_full(state, batch)
    s_gc, m_gc = step_gc(state, batch)
    return (s_full, m_full), (s_gc, m_gc)


def _assert_tree_close(a, b, rtol, atol):
    fa, _ = jax.tree.flatten(a)
    fb, _ = jax.tree.flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(x, np.float64), np.asarray(y, np.float64),
            rtol=rtol, atol=atol)


def test_clip_grad_cache_matches_full_step():
    (s_full, m_full), (s_gc, m_gc) = _run_pair(
        _tiny_clip(), _clip_batch(16), "{}")
    np.testing.assert_allclose(float(m_gc["loss"]), float(m_full["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_gc["grad_norm"]),
                               float(m_full["grad_norm"]), rtol=1e-5)
    _assert_tree_close(s_gc.params, s_full.params, rtol=2e-5, atol=1e-7)
    _assert_tree_close(s_gc.ema_params, s_full.ema_params,
                       rtol=2e-5, atol=1e-7)


def test_filip_grad_cache_matches_full_step():
    """Multi-term coverage: FILIP's dense late-interaction loss over
    [B, L, D] token features goes through the same cached-outputs path."""
    model = model_entry({"type": "filip_vitb32", "kwargs": {
        "image_encode": {"embed_dim": 32, "input_resolution": 64,
                         "patch_size": 16, "width": 32, "layers": 2,
                         "heads": 2},
        "text_encode": {"embed_dim": 32, "transformer_width": 32,
                        "transformer_heads": 2, "transformer_layers": 2,
                        "vocab_size": 97},
        "clip": {"use_allgather": True}}})
    (s_full, m_full), (s_gc, m_gc) = _run_pair(model, _clip_batch(16), "{}")
    np.testing.assert_allclose(float(m_gc["loss"]), float(m_full["loss"]),
                               rtol=1e-6)
    _assert_tree_close(s_gc.params, s_full.params, rtol=5e-5, atol=1e-7)


def test_grad_cache_refuses_declip_simsiam_bn():
    """DeCLIP/SLIP SimSiam projectors are BatchNorm MLPs (reference design,
    heads.py) — batch-coupled inside the FORWARD, so GradCache is
    mathematically invalid there and must refuse, not silently drift."""
    cfg = parse_config(
        "clip_simsiam_loss_weight: {clip_loss: 0.4, nn_text: 0.2, "
        "simsiam_loss: 0.2, masking_language: 0.2}\n"
        "data: {train: {image_text_two_view: True}}")
    cfg["grad_cache"] = {"chunks": 4}
    model = _tiny_declip()
    batch = _declip_batch(16)
    state, tx, sched = _state_and_tx(model, batch, bank_dim=32)
    step = make_train_step(model, tx, cfg, sched, total_steps=10)
    with pytest.raises(NotImplementedError, match="BatchNorm"):
        jax.jit(step)(state, batch)


def test_grad_cache_on_mesh_batch_sharded():
    """Compiles + matches under jit over a Mesh with the batch sharded on
    'data' (the with_sharding_constraint chunk-pin path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from declip_tpu.parallel import make_mesh

    model = _tiny_clip()
    batch = _clip_batch(16)
    mesh = make_mesh()
    cfg_gc = parse_config("{}")
    cfg_gc["grad_cache"] = {"chunks": 4}
    state, tx, sched = _state_and_tx(model, batch)
    step_full = jax.jit(make_train_step(
        model, tx, parse_config("{}"), sched, total_steps=10))
    step_gc = jax.jit(make_train_step(
        model, tx, cfg_gc, sched, total_steps=10, mesh=mesh))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    sbatch = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)
    s_full, m_full = step_full(state, batch)
    s_gc, m_gc = step_gc(state, sbatch)
    np.testing.assert_allclose(float(m_gc["loss"]), float(m_full["loss"]),
                               rtol=1e-6)
    _assert_tree_close(s_gc.params, s_full.params, rtol=2e-5, atol=1e-7)


def test_grad_cache_refuses_bn_towers():
    model = model_entry({"type": "clip_res50", "kwargs": {
        "image_encode": {"embed_dim": 32, "input_resolution": 64,
                         "width": 8, "layers": [1, 1, 1, 1], "heads": 2},
        "text_encode": {"embed_dim": 32, "transformer_width": 32,
                        "transformer_heads": 2, "transformer_layers": 2,
                        "vocab_size": 97},
        "clip": {"use_allgather": True}}})
    batch = _clip_batch(8)
    cfg = parse_config("{}")
    cfg["grad_cache"] = {"chunks": 2}
    state, tx, sched = _state_and_tx(model, batch)
    step = make_train_step(model, tx, cfg, sched, total_steps=10)
    with pytest.raises(NotImplementedError, match="BatchNorm"):
        jax.jit(step)(state, batch)


def test_grad_cache_refuses_moe():
    model = model_entry({"type": "clip_vitb32", "kwargs": {
        "image_encode": {"embed_dim": 32, "input_resolution": 64,
                         "patch_size": 16, "width": 32, "layers": 2,
                         "heads": 2, "moe": {"num_experts": 2}},
        "text_encode": {"embed_dim": 32, "transformer_width": 32,
                        "transformer_heads": 2, "transformer_layers": 2,
                        "vocab_size": 97},
        "clip": {"use_allgather": True}}})
    cfg = parse_config("{}")
    cfg["grad_cache"] = {"chunks": 2}
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                      "warmup_steps": 2}}, max_iter=10)
    with pytest.raises(NotImplementedError, match="MoE"):
        make_train_step(model, None, cfg, sched, total_steps=10)


def test_grad_cache_indivisible_batch_errors():
    model = _tiny_clip()
    batch = _clip_batch(10)  # 10 % 4 != 0
    cfg = parse_config("{}")
    cfg["grad_cache"] = {"chunks": 4}
    state, tx, sched = _state_and_tx(model, batch)
    step = make_train_step(model, tx, cfg, sched, total_steps=10)
    with pytest.raises(ValueError, match="not divisible"):
        jax.jit(step)(state, batch)
