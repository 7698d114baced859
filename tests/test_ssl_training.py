"""End-to-end MoCo / SimCLR / CLSA training paths (reference
prototype/utils/{moco,simclr,clsa}_builder.py — the builders there are the
training algorithm; here it lives in the jitted train step's ssl branch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from declip_tpu.models import model_entry
from declip_tpu.models.ssl_builders import init_moco_state
from declip_tpu.optim import optim_entry, scheduler_entry
from declip_tpu.train import make_train_step, method_of, new_train_state

RES = 32


def _model(method, arch="res50", **ssl):
    return model_entry({
        "type": f"{method}_{arch}",
        "kwargs": {
            "image_encode": {"embed_dim": 32, "input_resolution": RES,
                             "layers": (1, 1, 1, 1), "width": 8, "heads": 4},
            "dim": 16, "K": 64, "m": 0.9, **ssl,
        },
    })


def _setup(model, batch):
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True))()
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-2,
                                      "warmup_steps": 2}}, max_iter=10)
    tx = optim_entry({"type": "SGD", "kwargs": {"lr": 1e-2, "momentum": 0.9}},
                     params, sched)
    ssl = None
    if model.ssl_method in ("moco", "clsa"):
        ssl = init_moco_state(params, jax.random.PRNGKey(1), model.K,
                              model.dim, stats)
    state = new_train_state(params=params, batch_stats=stats,
                            opt_state=tx.init(params), ssl=ssl)
    return state, tx, sched


def _batch(n=8, seed=0, strong_res=()):
    rng = np.random.default_rng(seed)
    b = {
        "images": jnp.asarray(rng.normal(size=(n, RES, RES, 6)), jnp.float32),
        "tokens": jnp.ones((n, 77), jnp.int32),
        "labels": jnp.zeros((n,), jnp.int32),
    }
    for i, r in enumerate(strong_res):
        b[f"images_strong_{i}"] = jnp.asarray(
            rng.normal(size=(n, r, r, 3)), jnp.float32)
    return b


def test_moco_trains_and_updates_state():
    model = _model("moco")
    assert method_of(model) == "moco"
    batch = _batch()
    state, tx, sched = _setup(model, batch)
    q0 = np.asarray(state.ssl.queue)
    key0 = jax.device_get(state.ssl.key_params)
    p0 = jax.device_get(state.params)
    step = jax.jit(make_train_step(model, tx, {}, sched))
    tops = []
    for i in range(4):
        # distinct batches: repeating one batch would enqueue its own keys
        # as negatives (positives == negatives, loss rises by construction)
        state, metrics = step(state, _batch(seed=i + 1))
        assert np.isfinite(float(metrics["loss"]))
        tops.append(float(metrics["top1"]))
    # positives beat the random queue negatives far above 1/65 chance
    # (the synthetic "views" here are independent noise, so this is loose)
    assert tops[0] >= 25.0
    # optimizer actually moved the query encoder
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(p0),
                        jax.tree.leaves(jax.device_get(state.params))))
    # queue advanced by 4 enqueues of 8 keys
    assert int(state.ssl.queue_ptr) == 32
    assert not np.allclose(np.asarray(state.ssl.queue)[:8], q0[:8])
    # momentum encoder moved toward the query encoder
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(key0),
                        jax.tree.leaves(jax.device_get(state.ssl.key_params))))
    assert moved


def test_simclr_trains():
    model = _model("simclr")
    assert method_of(model) == "simclr"
    assert float(model.T) == 0.5  # simclr default temperature
    batch = _batch()
    state, tx, sched = _setup(model, batch)
    assert state.ssl is None
    step = jax.jit(make_train_step(model, tx, {}, sched))
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_clsa_trains_with_strong_views():
    model = _model("clsa")
    # strong resolutions must survive the ResNet's 32x downsample
    batch = _batch(strong_res=(64, 96))
    state, tx, sched = _setup(model, batch)
    step = jax.jit(make_train_step(model, tx, {}, sched))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["ddm_loss"]))
    assert int(state.ssl.queue_ptr) == 8


def test_clsa_vit_multires_strong_views():
    """ViT towers must accept CLSA's off-train-resolution strong views
    (pos-emb grid interpolation; previously a reshape crash)."""
    model = model_entry({
        "type": "clsa_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 32, "input_resolution": 32,
                             "patch_size": 16, "width": 16, "layers": 1,
                             "heads": 2},
            "dim": 16, "K": 64, "m": 0.9,
        },
    })
    batch = _batch(strong_res=(16, 48))  # 1x1 and 3x3 patch grids vs 2x2
    state, tx, sched = _setup(model, batch)
    step = jax.jit(make_train_step(model, tx, {}, sched))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["ddm_loss"]))


def test_clsa_resnet_strong_views_share_pool_head():
    """All CLSA views route through the SAME attnpool head (the reference's
    base_encoder pools identically at every resolution); without
    attnpool_all_res the strong views would silently train a separate
    mean+fc parameterization."""
    model = _model("clsa")
    assert model.visual.attnpool_all_res
    batch = _batch(strong_res=(64,))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True))()
    assert "fc" not in variables["params"]["visual"]
    assert "attnpool" in variables["params"]["visual"]


def test_ssl_single_view_transform_refused():
    model = _model("moco")
    bad = {"images": jnp.zeros((2, RES, RES, 3))}  # single 3-channel view
    with pytest.raises(ValueError, match="two-view"):
        model.init(jax.random.PRNGKey(0), bad, train=True)


def test_clsa_loader_batches_multiview(tmp_path):
    from declip_tpu.data.dataloader import ClipDataLoader
    from declip_tpu.data.dataset import ClipDataset
    from declip_tpu.data.sampler import DistributedGivenIterationSampler
    from declip_tpu.data.transforms import build_common_augmentation

    ds = ClipDataset(root_dir="", meta_file="16", read_from="synthetic",
                     transform=build_common_augmentation("CLSA2-16-32"))
    loader = ClipDataLoader(
        ds, DistributedGivenIterationSampler(
            dataset_size=16, total_iter=1, batch_size=4),
        4, num_workers=1)
    batch = next(iter(loader))
    assert batch["images"].shape == (4, 224, 224, 6)
    assert batch["images_strong_0"].shape == (4, 16, 16, 3)
    assert batch["images_strong_1"].shape == (4, 32, 32, 3)


def test_moco_solver_end_to_end(tmp_path):
    from declip_tpu.config import parse_config
    from declip_tpu.solver import Solver

    (tmp_path / "config.yaml").write_text("""
model:
    type: moco_res50
    kwargs:
        image_encode: {embed_dim: 32, input_resolution: 224,
                       layers: [1, 1, 1, 1], width: 8, heads: 4}
        dim: 16
        K: 64
        m: 0.9
optimizer:
    type: SGD
    kwargs: {lr: 0.01, momentum: 0.9, weight_decay: 0.0001}
lr_scheduler:
    type: Cosine
    kwargs: {base_lr: 0.0, warmup_lr: 0.01, warmup_steps: 1, max_iter: 3}
data:
    train:
        batch_size: 1
        read_from: synthetic
        meta_file: "16"
        transforms: {type: MOCOV2}
        num_workers: 2
saver: {print_freq: 1, save_freq: 0, pretrain: {auto_resume: False}}
""")
    cfg = parse_config(str(tmp_path / "config.yaml"))
    cfg["_config_path"] = str(tmp_path / "config.yaml")
    solver = Solver(cfg)
    assert solver.method == "moco"
    solver.train()
    assert int(solver.state.step) == 3
    assert int(solver.state.ssl.queue_ptr) == 24  # 3 steps x 8 global keys
