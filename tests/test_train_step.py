"""Train-step tests: single-device correctness + 8-device SPMD equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from declip_tpu.config import parse_config
from declip_tpu.models import model_entry
from declip_tpu.models.memory_bank import init_bank
from declip_tpu.optim import optim_entry, scheduler_entry
from declip_tpu.parallel import make_mesh, shard_batch
from declip_tpu.train import (
    EmaConfig,
    init_ema,
    make_train_step,
    new_train_state,
)

RES = 32


def tiny_model(type_="clip_vitb32", clip_kwargs=None):
    node = {
        "type": type_,
        "kwargs": {
            "image_encode": {"embed_dim": 32, "input_resolution": RES,
                             "patch_size": 32, "width": 32, "layers": 2,
                             "heads": 2},
            "text_encode": {"embed_dim": 32, "transformer_width": 32,
                            "transformer_heads": 2, "transformer_layers": 2},
            "clip": dict(clip_kwargs or {"use_allgather": True}),
        },
    }
    return model_entry(node)


def make_batch(n, views=1, mlm=False, aug=False, seed=0):
    rng = np.random.default_rng(seed)
    b = {
        "images": jnp.asarray(
            rng.normal(size=(n, RES, RES, 3 * views)), jnp.float32
        ),
        "tokens": jnp.asarray(rng.integers(1, 100, (n, 77)), jnp.int32),
    }
    if aug:
        b["tokens_aug"] = jnp.asarray(rng.integers(1, 100, (n, 77)), jnp.int32)
    if mlm:
        b["mlm_tokens"] = b["tokens"]
        labels = np.full((n, 77), -100, np.int32)
        labels[:, 1] = 7
        b["mlm_labels"] = jnp.asarray(labels)
    return b


def build_state(model, batch, cfg, *, use_bank=False, ema=False):
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True)
    )()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                      "warmup_steps": 2}},
        max_iter=10,
    )
    tx = optim_entry(
        {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 0.1}},
        params, sched, pconfig={"logit_scale": {"weight_decay": 0}},
        grad_clip=cfg.get("grad_clip"),
    )
    state = new_train_state(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=init_ema(params, EmaConfig(0.999)) if ema else None,
        bank_text=init_bank(jax.random.PRNGKey(1), 64, 32) if use_bank else None,
        with_logit_guard=cfg.get("grad_clip", {}).get("type") == "logit_scale_param_ema",
    )
    return state, tx, sched


def test_clip_train_step_runs_and_descends():
    model = tiny_model()
    cfg = parse_config("grad_clip: {type: logit_scale_param_value, value: 3, max_value: 6}")
    batch = make_batch(8)
    state, tx, sched = build_state(model, batch, cfg)
    step = jax.jit(make_train_step(model, tx, cfg, sched))
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 4
    assert np.isfinite(losses).all()
    # same batch repeatedly: loss must decrease
    assert losses[-1] < losses[0]
    # logit_scale param clamped to [3, 6]
    assert 3.0 <= float(state.params["logit_scale"][0]) <= 6.0


def test_declip_full_step_with_bank_and_ema():
    model = tiny_model(
        "declip_vitb32",
        {"use_allgather": True, "text_mask_type": "MLM",
         "return_nn_bank": True, "feature_dim": 32},
    )
    cfg = parse_config("""
grad_clip: {type: logit_scale_param_ema, threshold: 0.2}
clip_simsiam_loss_weight: {clip_loss: 0.4, nn_text: 0.2, simsiam_loss: 0.2, masking_language: 0.2}
data: {train: {image_text_two_view: True}}
""")
    batch = make_batch(8, views=2, mlm=True, aug=True)
    state, tx, sched = build_state(model, batch, cfg, use_bank=True, ema=True)
    step = jax.jit(make_train_step(
        model, tx, cfg, sched, ema_cfg=EmaConfig(0.999), total_steps=10))
    ptr0 = int(state.bank_text.ptr)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.bank_text.ptr) == ptr0 + 16  # two enqueues of B=8
    # ema moved off zero-init
    assert float(jax.tree.leaves(state.ema_params)[0].sum()) != 0.0
    for k in ("clip_loss", "simsiam_loss", "text_mlm_loss",
              "clip_nn_text_loss", "lr", "grad_norm"):
        assert k in metrics


@pytest.mark.parametrize("method,type_,clip_kwargs,views,mlm,aug", [
    ("slip", "slip_vitb32",
     {"use_allgather": True, "return_sim": True, "feature_dim": 32,
      "sim_dim": 16}, 3, False, False),
    ("filip", "filip_vitb32",
     {"use_allgather": True, "return_dense": True, "select_topk": True,
      "top_k": 1, "text_mask_type": "MLM"}, 2, True, False),
    ("defilip", "defilip_vitb32",
     {"use_allgather": True, "text_mask_type": "MLM", "return_filip": True,
      "return_nn_bank": True, "select_topk": True, "top_k": 1}, 2, True, True),
])
def test_method_steps_run(method, type_, clip_kwargs, views, mlm, aug):
    model = tiny_model(type_, clip_kwargs)
    cfg = parse_config("""
clip_simsiam_loss_weight: {clip_loss: 0.4, simsiam_loss: 0.2, masking_language: 0.2, clip_dense_loss: 1.0, filip: 0.2, nn_text: 0.2}
loss_weight: {clip_loss: 1, simclr_loss: 1}
data: {train: {image_text_two_view: True}}
""")
    batch = make_batch(8, views=views, mlm=mlm, aug=aug)
    use_bank = clip_kwargs.get("return_nn_bank", False)
    state, tx, sched = build_state(model, batch, cfg, use_bank=use_bank)
    step = jax.jit(make_train_step(model, tx, cfg, sched, total_steps=10))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"])), metrics


def test_spmd_matches_single_device():
    """The sharded step over an 8-device mesh must produce the same loss and
    params as the unsharded step (the SPMD InfoNCE == reference gathered
    InfoNCE equivalence)."""
    model = tiny_model()
    cfg = parse_config("x: 0")
    batch = make_batch(16)
    state, tx, sched = build_state(model, batch, cfg)
    step = make_train_step(model, tx, cfg, sched)

    # single device
    s1, m1 = jax.jit(step)(state, batch)

    # 8-device mesh: batch sharded, state replicated
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = shard_batch(mesh, batch)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    state_r = jax.device_put(state, rep)
    s8, m8 = jax.jit(step)(state_r, sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-5)
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_declip_nn_simsiam_feature():
    """Regression: return_simsiam_nn_text used to crash at init (head params
    were never created) — now the full step must run."""
    model = tiny_model(
        "declip_vitb32",
        {"use_allgather": True, "text_mask_type": "MLM",
         "return_nn_bank": True, "return_simsiam_nn_text": True,
         "feature_dim": 32},
    )
    cfg = parse_config("""
clip_simsiam_loss_weight: {clip_loss: 0.4, nn_text: 0.2, simsiam_loss: 0.2, masking_language: 0.2, nn_simsiam_loss: 0.1}
data: {train: {image_text_two_view: True}}
""")
    batch = make_batch(8, views=2, mlm=True, aug=True)
    state, tx, sched = build_state(model, batch, cfg, use_bank=True)
    assert "projector_nn_text" in state.params
    step = jax.jit(make_train_step(model, tx, cfg, sched, total_steps=10))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_nonfinite_step_is_contained():
    """A NaN loss/grad at ANY step must leave params/opt/EMA/bank bit-identical
    (the reference checks every iteration, declip_solver.py:548-619; the host
    loop here only looks at loss on print boundaries, so the jitted step
    itself must refuse the poisoned update)."""
    model = tiny_model("declip_vitb32", {
        "use_allgather": True, "text_mask_type": "MLM",
        "return_nn_bank": True, "feature_dim": 32})
    cfg = parse_config(
        "clip_simsiam_loss_weight: {clip_loss: 0.4, nn_text: 0.2, "
        "simsiam_loss: 0.2, masking_language: 0.2}\n"
        "data: {train: {image_text_two_view: True}}")
    batch = make_batch(8, views=2, mlm=True, aug=True)
    state, tx, sched = build_state(model, batch, cfg, use_bank=True, ema=True)
    step = jax.jit(make_train_step(
        model, tx, cfg, sched, ema_cfg=EmaConfig(0.999), total_steps=10))

    state, _ = step(state, batch)  # one good step
    before = jax.device_get(state)

    poison = dict(batch)
    poison["images"] = batch["images"].at[0, 0, 0, 0].set(jnp.nan)
    state, metrics = step(state, poison)
    assert float(metrics["update_skipped"]) == 1.0
    assert not np.isfinite(float(metrics["loss"]))
    after = jax.device_get(state)
    assert int(after.step) == int(before.step) + 1  # host counter stays valid
    for name, (a, b) in zip(
        ("params", "opt_state", "ema_params", "bank"),
        ((before.params, after.params),
         (before.opt_state, after.opt_state),
         (before.ema_params, after.ema_params),
         (before.bank_text, after.bank_text)),
    ):
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(
                x, y, err_msg=f"{name} changed on a non-finite step"),
            a, b)

    # the very next finite step proceeds normally
    state, metrics = step(state, batch)
    assert float(metrics["update_skipped"]) == 0.0
    assert np.isfinite(float(metrics["loss"]))
    assert any(
        not np.array_equal(x, y)
        for x, y in zip(jax.tree.leaves(jax.device_get(state).params),
                        jax.tree.leaves(after.params)))
