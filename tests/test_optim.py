import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from declip_tpu.optim import optim_entry
from declip_tpu.optim.param_groups import (
    classify_param,
    group_mask,
    weight_decay_masks,
)
from declip_tpu.optim.schedulers import scheduler_entry


PARAMS = {
    "logit_scale": jnp.ones((1,)),
    "visual": {
        "conv1": {"kernel": jnp.ones((3, 3, 3, 8))},
        "bn1": {"BatchNorm_0": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}},
        "proj": jnp.ones((8, 4)),
    },
    "text": {
        "ln_final": {"LayerNorm_0": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}},
        "text_projection": {"kernel": jnp.ones((8, 4)), "bias": jnp.zeros((4,))},
    },
}


def test_classify():
    assert classify_param(("logit_scale",), None) == "logit_scale"
    assert classify_param(("visual", "bn1", "BatchNorm_0", "scale"), None) == "bn_w"
    assert classify_param(("text", "ln_final", "LayerNorm_0", "bias"), None) == "ln_b"
    assert classify_param(("text", "text_projection", "bias"), None) == "linear_b"
    assert classify_param(("visual", "conv1", "bias"), None) == "conv_b"
    assert classify_param(("visual", "proj",), None) == "default"


def test_weight_decay_masks():
    pconfig = {"bn_w": {"weight_decay": 0.0}, "ln_b": {"weight_decay": 0.0},
               "logit_scale": {"weight_decay": 0.0}}
    masks = weight_decay_masks(PARAMS, pconfig)
    zero_mask = masks[0.0]
    assert zero_mask["logit_scale"]
    assert zero_mask["visual"]["bn1"]["BatchNorm_0"]["scale"]
    assert not zero_mask["visual"]["bn1"]["BatchNorm_0"]["bias"]  # bn_b not listed
    default = masks[None]
    assert default["visual"]["proj"]
    assert not default["logit_scale"]


def test_cosine_schedule_shape():
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                      "warmup_steps": 10, "min_lr": 1e-5}},
        max_iter=110,
    )
    # schedule(s) == reference lr at curr_step = s+1 (scheduler.py:78-84,
    # 235-246): warmup interpolates over (ws-1), decay runs on curr-ws
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(9)) == pytest.approx(1e-3, rel=1e-5)
    assert float(sched(5)) == pytest.approx(5e-4 * 10 / 9, rel=1e-4)
    assert float(sched(109)) == pytest.approx(1e-5, rel=1e-3)
    # midpoint of cosine
    assert float(sched(59)) == pytest.approx((1e-3 + 1e-5) / 2, rel=1e-3)


def test_step_schedule():
    sched = scheduler_entry(
        {"type": "Step", "kwargs": {"base_lr": 0.0, "warmup_lr": 0.1,
                                    "warmup_steps": 0,
                                    "lr_mults": [0.1, 0.1],
                                    "lr_steps": [10, 20]}},
        max_iter=30,
    )
    assert float(sched(5)) == pytest.approx(0.1)
    assert float(sched(15)) == pytest.approx(0.01, rel=1e-5)
    assert float(sched(25)) == pytest.approx(0.001, rel=1e-5)


def test_adamw_no_decay_on_masked_groups():
    pconfig = {"bn_w": {"weight_decay": 0.0}, "logit_scale": {"weight_decay": 0.0}}
    tx = optim_entry(
        {"type": "AdamW", "kwargs": {"lr": 1.0, "weight_decay": 0.5,
                                     "betas": [0.9, 0.98]}},
        PARAMS,
        lambda s: 0.01,
        pconfig=pconfig,
    )
    state = tx.init(PARAMS)
    grads = jax.tree.map(jnp.zeros_like, PARAMS)
    updates, _ = tx.update(grads, state, PARAMS)
    # zero grads: decayed params move, no-decay params don't
    assert np.all(np.asarray(updates["logit_scale"]) == 0)
    assert np.all(np.asarray(updates["visual"]["bn1"]["BatchNorm_0"]["scale"]) == 0)
    assert np.any(np.asarray(updates["visual"]["proj"]) != 0)


def test_frozen_mask_blocks_all_updates():
    frozen = jax.tree.map(lambda _: False, PARAMS)
    frozen["visual"]["conv1"]["kernel"] = True
    tx = optim_entry(
        {"type": "AdamW", "kwargs": {"lr": 1.0, "weight_decay": 0.5}},
        PARAMS,
        lambda s: 0.1,
        frozen_mask=frozen,
    )
    state = tx.init(PARAMS)
    grads = jax.tree.map(jnp.ones_like, PARAMS)
    updates, _ = tx.update(grads, state, PARAMS)
    assert np.all(np.asarray(updates["visual"]["conv1"]["kernel"]) == 0)
    assert np.any(np.asarray(updates["visual"]["proj"]) != 0)


def test_sgd_momentum_matches_torch():
    import torch

    p0 = np.array([1.0, 2.0], np.float32)
    g = np.array([0.5, -0.3], np.float32)
    tp = torch.tensor(p0, requires_grad=True)
    opt = torch.optim.SGD([tp], lr=0.1, momentum=0.9, weight_decay=0.01)
    for _ in range(3):
        tp.grad = torch.tensor(g)
        opt.step()

    params = {"w": jnp.asarray(p0)}
    tx = optim_entry(
        {"type": "SGD", "kwargs": {"lr": 0.1, "momentum": 0.9,
                                   "weight_decay": 0.01}},
        params,
        lambda s: 0.1,
    )
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-5
    )


def test_adamw_matches_torch():
    import torch

    p0 = np.array([1.0, -2.0, 0.5], np.float32)
    g = np.array([0.1, 0.2, -0.4], np.float32)
    tp = torch.tensor(p0, requires_grad=True)
    opt = torch.optim.AdamW([tp], lr=0.01, betas=(0.9, 0.98), eps=1e-8,
                            weight_decay=0.1)
    for _ in range(5):
        tp.grad = torch.tensor(g)
        opt.step()

    params = {"w": jnp.asarray(p0)}
    tx = optim_entry(
        {"type": "AdamW", "kwargs": {"lr": 0.01, "betas": [0.9, 0.98],
                                     "eps": 1e-8, "weight_decay": 0.1}},
        params,
        lambda s: 0.01,
    )
    state = tx.init(params)
    for _ in range(5):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-4
    )


def test_adamw_sgd_split():
    tx = optim_entry(
        {"type": "AdamW_SGD",
         "kwargs": {"lr": 1.0,
                    "text_config": {"lr": 1.0, "betas": [0.9, 0.98]},
                    "visual_config": {"lr": 1.0, "momentum": 0.9}}},
        PARAMS,
        lambda s: 1.0,
    )
    state = tx.init(PARAMS)
    grads = jax.tree.map(jnp.ones_like, PARAMS)
    updates, _ = tx.update(grads, state, PARAMS)
    # both halves produce updates
    assert np.any(np.asarray(updates["text"]["text_projection"]["kernel"]) != 0)
    assert np.any(np.asarray(updates["visual"]["proj"]) != 0)


def test_adafactor_factored_state_and_decay():
    """Adafactor (beyond-reference, pod-scale): factored second moments +
    decoupled masked weight decay + schedule-scaled updates."""
    pconfig = {"logit_scale": {"weight_decay": 0.0}}
    tx = optim_entry(
        {"type": "Adafactor",
         "kwargs": {"weight_decay": 0.5, "min_dim_size_to_factor": 2}},
        PARAMS,
        lambda s: 0.01,
        pconfig=pconfig,
    )
    state = tx.init(PARAMS)
    # factored state: the [3,3,3,8] conv kernel stores O(rows)+O(cols)
    # vectors, not a dense O(n*m) second moment
    leaves = jax.tree.leaves(state)
    n_state = sum(int(np.prod(l.shape)) for l in leaves
                  if hasattr(l, "shape"))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(PARAMS))
    assert n_state < n_params  # Adam's moments alone would be 2*n_params

    grads = jax.tree.map(jnp.zeros_like, PARAMS)
    updates, _ = tx.update(grads, state, PARAMS)
    # zero grads: decoupled decay moves decayed params, not logit_scale
    assert np.all(np.asarray(updates["logit_scale"]) == 0)
    assert np.any(np.asarray(updates["visual"]["proj"]) != 0)

    grads = jax.tree.map(jnp.ones_like, PARAMS)
    updates, _ = tx.update(grads, state, PARAMS)
    flat = np.concatenate([np.asarray(u).ravel()
                           for u in jax.tree.leaves(updates)])
    assert np.all(np.isfinite(flat)) and np.any(flat != 0)
    # updates descend: unit grads + positive params => negative steps on
    # the undecayed logit_scale
    assert np.all(np.asarray(updates["logit_scale"]) <= 0)
