"""Pallas fused attention vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from declip_tpu.ops.attention import _xla_attention
from declip_tpu.ops.flash_attention import flash_attention


def _qkv(rng, b=2, h=2, l=7, dh=16):
    def mk():
        return jnp.asarray(rng.normal(size=(b, h, l, dh)), jnp.float32)

    return mk(), mk(), mk()


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("l", [7, 16, 77])
def test_forward_matches_xla(rng, causal, l):
    q, k, v = _qkv(rng, l=l)
    ref = _xla_attention(q, k, v, causal, q.shape[-1] ** -0.5)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_xla(rng, causal):
    q, k, v = _qkv(rng, l=10)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, causal=causal, interpret=True) ** 2
                ).sum()

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v, causal,
                               q.shape[-1] ** -0.5) ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_attention_dispatch_pallas_fallback(rng):
    """impl='pallas' must work (interpret on CPU) through the dispatch."""
    from declip_tpu.ops.attention import dot_product_attention

    q, k, v = _qkv(rng, l=9)
    out = dot_product_attention(q, k, v, causal=True, impl="pallas")
    ref = dot_product_attention(q, k, v, causal=True, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


def test_auto_dispatch_by_length(monkeypatch):
    """'auto' (the model default since round 4) routes self-attention at
    L>=224 to the Pallas kernel ON TPU — the measured crossover (ViT-L/14
    L=257: +29% vs XLA; B/16 L=197 and text L=77: XLA wins) — and
    everything else, and every shape off-TPU, to the XLA path."""
    import declip_tpu.ops.attention as att
    import declip_tpu.ops.flash_attention as fa

    routed = []

    def spy_flash(q, k, v, *, causal=False, scale=None):
        routed.append(q.shape)
        return q

    monkeypatch.setattr(fa, "flash_attention", spy_flash)

    q77 = jnp.zeros((2, 4, 77, 64))
    q257 = jnp.zeros((2, 4, 257, 64))
    q1 = jnp.zeros((2, 4, 1, 64))

    # off-TPU (this suite runs on CPU): always XLA, any length
    att.dot_product_attention(q257, q257, q257, impl="auto")
    assert routed == []

    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    att.dot_product_attention(q77, q77, q77, impl="auto")   # short: XLA
    assert routed == []
    att.dot_product_attention(q1, q257, q257, impl="auto")  # cross: XLA
    assert routed == []
    att.dot_product_attention(q257, q257, q257, impl="auto")  # long self
    assert routed == [(2, 4, 257, 64)]


def test_pallas_partitions_under_mesh():
    """A bare pallas_call under GSPMD REPLICATES (the partitioner can't
    shard a custom call — measured: 12 all-gathers, replicated output on an
    8-device mesh). The dispatch must instead shard_map the kernel over the
    installed mesh context: batch over 'data', per-device kernels, output
    still batch-sharded, numerics identical to XLA."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from declip_tpu.ops.attention import dot_product_attention
    from declip_tpu.parallel.tp import (
        clear_activation_sharding,
        set_activation_sharding,
    )

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    set_activation_sharding(mesh, model_axis=None)
    try:
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.normal(size=(16, 2, 12, 8)), jnp.float32)
                   for _ in range(3))
        sh = NamedSharding(mesh, P("data"))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

        def f(q, k, v):
            return dot_product_attention(q, k, v, impl="pallas")

        jf = jax.jit(f, in_shardings=(sh, sh, sh))
        out = jf(qs, ks, vs)
        # sharded compute: the output must stay batch-sharded, not be the
        # replicated result of an all-gathered kernel
        assert out.sharding.spec == P("data"), out.sharding
        ref = dot_product_attention(q, k, v, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)
        # gradients flow through the shard_map dispatch
        g = jax.grad(lambda a: (f(a, ks, vs) ** 2).sum())(qs)
        gr = jax.grad(lambda a: (dot_product_attention(
            a, k, v, impl="xla") ** 2).sum())(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)
    finally:
        clear_activation_sharding()


def test_pallas_mesh_tp_heads_shard():
    """Under TP (model axis installed) the head dim shard_maps over 'model'
    when it divides; otherwise the dispatch falls back to XLA."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from declip_tpu.ops.attention import dot_product_attention
    from declip_tpu.parallel.tp import (
        clear_activation_sharding,
        set_activation_sharding,
    )

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    set_activation_sharding(mesh, model_axis="model")
    try:
        rng = np.random.default_rng(1)
        q, k, v = (jnp.asarray(rng.normal(size=(4, 4, 10, 8)), jnp.float32)
                   for _ in range(3))
        sh = NamedSharding(mesh, P("data", "model"))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        out = jax.jit(
            lambda a, b, c: dot_product_attention(a, b, c, impl="pallas"),
            in_shardings=(sh, sh, sh))(qs, ks, vs)
        assert out.sharding.spec == P("data", "model"), out.sharding
        ref = dot_product_attention(q, k, v, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)
        # heads=3 doesn't divide model=4 -> XLA fallback, still correct
        q3, k3, v3 = (x[:, :3] for x in (q, k, v))
        out3 = dot_product_attention(q3, k3, v3, impl="pallas")
        ref3 = dot_product_attention(q3, k3, v3, impl="xla")
        np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3),
                                   rtol=2e-5, atol=2e-6)
    finally:
        clear_activation_sharding()
