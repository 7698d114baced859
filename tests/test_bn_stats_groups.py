"""Grouped/per-replica BN statistics inside the jitted SPMD step.

The declip88m flagship recipes set ``use_sync_bn: False, bn_group_size: 16``
(declip88m_r50_declip/config.yaml:6); the reference binds plain
nn.BatchNorm2d (per-rank stats) for the former and grouped SyncBN
(modified_resnet.py:116-142, simple_group_split contiguous rank groups) for
the latter. Here those semantics are pure batch math: the global [N] batch
axis reshapes to [G, N/G] contiguous groups (rank order == batch order under
the solver's data sharding), so the invariant tested is exact:

    grouped_model(x)[g] == global_model(x[group g])   for every group g

which holds end-to-end through a full ModifiedResNet because every non-BN
op is per-sample.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from declip_tpu.models.clip_model import resolve_bn_stats_groups
from declip_tpu.models.resnet import BatchNorm, ModifiedResNet


def test_resolve_bn_stats_groups():
    # use_sync_bn False -> per-rank stats, bn_group_size IGNORED (the
    # reference binds nn.BatchNorm2d without consulting it)
    assert resolve_bn_stats_groups(8, use_sync_bn=False, bn_group_size=16) == 8
    assert resolve_bn_stats_groups(1, use_sync_bn=False) == 1
    # grouped SyncBN: world/G contiguous groups
    assert resolve_bn_stats_groups(32, bn_group_size=16) == 2
    assert resolve_bn_stats_groups(8, bn_group_size=2) == 4
    # group spans (or exceeds) the world -> global stats
    assert resolve_bn_stats_groups(8, bn_group_size=8) == 1
    assert resolve_bn_stats_groups(4, bn_group_size=16) == 1
    # non-divisible world falls back loudly to global
    assert resolve_bn_stats_groups(6, bn_group_size=4) == 1
    # defaults: plain SyncBN == global stats
    assert resolve_bn_stats_groups(8) == 1


def _bn_apply(module, x, train=True):
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    y, mut = module.apply(variables, x, train=train,
                          mutable=["batch_stats"])
    return y, variables, mut["batch_stats"]


def test_grouped_bn_layer_matches_per_group_global(rng):
    """BatchNorm(stats_groups=G)(x) == concat_g BatchNorm()(x[g])."""
    n, h, w, c, g = 8, 3, 3, 5, 4
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32) * 3 + 1)

    grouped = BatchNorm(stats_groups=g)
    plain = BatchNorm()
    y_grouped, _, stats_grouped = _bn_apply(grouped, x)

    per_group = []
    for i in range(g):
        y_i, _, _ = _bn_apply(plain, x[i * (n // g):(i + 1) * (n // g)])
        per_group.append(np.asarray(y_i))
    np.testing.assert_allclose(
        np.asarray(y_grouped), np.concatenate(per_group), atol=2e-5, rtol=0)

    # running stats update with the GLOBAL moments (documented delta — the
    # reference keeps per-rank running stats and checkpoints rank 0's)
    _, _, stats_global = _bn_apply(plain, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        stats_grouped, stats_global)


def test_grouped_bn_matches_torch_per_rank(rng):
    """use_sync_bn: False semantics vs torch.nn.BatchNorm2d per rank."""
    torch = pytest.importorskip("torch")
    n, h, w, c, g = 8, 4, 4, 3, 4
    x = rng.normal(size=(n, h, w, c)).astype(np.float32)

    y_jax, _, _ = _bn_apply(BatchNorm(stats_groups=g), jnp.asarray(x))

    bn = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    bn.train()
    outs = []
    for i in range(g):  # each "rank" normalizes its own slice
        xt = torch.from_numpy(
            x[i * (n // g):(i + 1) * (n // g)].transpose(0, 3, 1, 2))
        outs.append(bn(xt).detach().numpy().transpose(0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(y_jax), np.concatenate(outs), atol=2e-5, rtol=0)


def test_grouped_resnet_end_to_end(rng):
    """Full tiny ModifiedResNet: grouped model on the global batch ==
    global-stats model run per group slice (same params)."""
    n, g = 8, 4
    kw = dict(layers=(1, 1, 1, 1), embed_dim=16, heads=2,
              input_resolution=32, width=8)
    grouped = ModifiedResNet(bn_stats_groups=g, **kw)
    plain = ModifiedResNet(**kw)
    x = jnp.asarray(rng.normal(size=(n, 32, 32, 3)).astype(np.float32))

    variables = plain.init(jax.random.PRNGKey(1), x[:2], train=False)
    y_grouped = grouped.apply(x=x, train=True, variables=variables,
                              mutable=["batch_stats"])[0]
    per_group = [
        np.asarray(plain.apply(variables, x[i * (n // g):(i + 1) * (n // g)],
                               train=True, mutable=["batch_stats"])[0])
        for i in range(g)
    ]
    np.testing.assert_allclose(
        np.asarray(y_grouped), np.concatenate(per_group), atol=5e-5, rtol=0)

    # eval mode ignores grouping entirely (running stats path)
    e1 = grouped.apply(variables, x, train=False)
    e2 = plain.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=0)


def test_grouped_bn_sharded_matches_single_device(rng):
    """Grouped-stats ResNet under pjit with the batch sharded over an
    8-device 'data' mesh == the same model on one device (standalone
    variant: tests/standalone_bn_groups_sharded.py)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n, g = 16, 8
    model = ModifiedResNet(layers=(1, 1, 1, 1), embed_dim=16, heads=2,
                           input_resolution=32, width=8, bn_stats_groups=g)
    x = rng.normal(size=(n, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x[:2]),
                           train=False)

    def fwd(v, xx):
        return model.apply(v, xx, train=True, mutable=["batch_stats"])

    y_ref, stats_ref = jax.jit(fwd)(variables, jnp.asarray(x))
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    y_sh, stats_sh = jax.jit(fwd)(vs, xs)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sh),
                               atol=1e-4, rtol=0)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        stats_ref["batch_stats"], stats_sh["batch_stats"])


def test_bn_stats_dtype_bf16_close(rng):
    """bn_stats_dtype=bfloat16 (experiment knob, bench --bn-bf16-stats):
    same math in bf16, running stats still fp32, output close to fp32."""
    n, h, w, c = 8, 4, 4, 6
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    y32, _, stats32 = _bn_apply(BatchNorm(), x)
    y16, _, stats16 = _bn_apply(BatchNorm(stats_dtype=jnp.bfloat16), x)
    assert all(v.dtype == jnp.float32
               for v in jax.tree.leaves(stats16))
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=0, atol=3e-2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-2),
        stats16, stats32)


def test_batch_not_divisible_raises():
    with pytest.raises(ValueError, match="stats_groups"):
        _bn_apply(BatchNorm(stats_groups=3),
                  jnp.zeros((8, 2, 2, 4), jnp.float32))


def test_build_towers_resolves_bn_knobs():
    """declip88m-style config -> per-replica groups on the ResNet tower."""
    from declip_tpu.models import model_entry

    model = model_entry({
        "type": "clip_res50",
        "kwargs": {
            "image_encode": {
                "embed_dim": 16, "width": 8, "layers": (1, 1, 1, 1),
                "heads": 2, "input_resolution": 32,
                "use_sync_bn": False, "bn_group_size": 16,
                "bn_sync_stats": True, "bn_world": 8,
            },
            "text_encode": {
                "embed_dim": 16, "transformer_width": 16,
                "transformer_heads": 2, "transformer_layers": 1,
            },
        },
    })
    assert model.visual.bn_stats_groups == 8
    # grouped SyncBN flavor: 8 ranks / groups of 2 -> 4 batch groups
    model2 = model_entry({
        "type": "clip_res50",
        "kwargs": {
            "image_encode": {
                "embed_dim": 16, "width": 8, "layers": (1, 1, 1, 1),
                "heads": 2, "input_resolution": 32,
                "bn_group_size": 2, "bn_world": 8,
            },
            "text_encode": {
                "embed_dim": 16, "transformer_width": 16,
                "transformer_heads": 2, "transformer_layers": 1,
            },
        },
    })
    assert model2.visual.bn_stats_groups == 4
