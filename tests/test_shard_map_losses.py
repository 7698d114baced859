"""shard_map (explicit axis_name) loss path must equal the dense global
computation — validates the rank-offset InfoNCE labels and the
all_gather/psum_scatter gradient path (the reference's AllGather.backward,
clip.py:42-49)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from declip_tpu.ops.contrastive import clip_pair_loss
from declip_tpu.train.method_losses import clip_losses


def _mesh():
    return Mesh(np.asarray(jax.devices()), ("data",))


def test_shard_map_clip_loss_matches_dense(rng):
    mesh = _mesh()
    n = 16
    img = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.asarray(10.0)

    dense_loss, _, _ = clip_pair_loss(img, txt, scale, axis_name=None)

    @jax.jit
    def sharded(img, txt):
        def f(i, t):
            loss, _, _ = clip_pair_loss(i, t, scale, axis_name="data")
            return jax.lax.pmean(loss, "data")

        return shard_map(
            f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
        )(img, txt)

    s = NamedSharding(mesh, P("data"))
    loss = sharded(jax.device_put(img, s), jax.device_put(txt, s))
    np.testing.assert_allclose(float(loss), float(dense_loss), rtol=1e-5)


def test_shard_map_gradients_match(rng):
    """Gradients through lax.all_gather must equal dense gradients (the
    hand-written allreduce-and-slice backward of the reference)."""
    mesh = _mesh()
    n = 16
    img = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    scale = jnp.asarray(5.0)

    def dense(img, txt):
        return clip_pair_loss(img, txt, scale, axis_name=None)[0]

    g_dense = jax.grad(dense, argnums=(0, 1))(img, txt)

    @jax.jit
    def sharded_grad(img, txt):
        def f(i, t):
            def local_loss(i, t):
                loss, _, _ = clip_pair_loss(i, t, scale, axis_name="data")
                return jax.lax.pmean(loss, "data")

            return jax.grad(local_loss, argnums=(0, 1))(i, t)

        return shard_map(
            f, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=(P("data"), P("data")),
        )(img, txt)

    s = NamedSharding(mesh, P("data"))
    g_shard = sharded_grad(jax.device_put(img, s), jax.device_put(txt, s))
    for a, b in zip(g_dense, g_shard):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-7)


def test_method_losses_axis_name_mode(rng):
    """clip_losses with axis_name under shard_map == SPMD metrics."""
    mesh = _mesh()
    n = 16
    out_full = {
        "image_embed": jnp.asarray(rng.normal(size=(n, 8)), jnp.float32),
        "text_embed": jnp.asarray(rng.normal(size=(n, 8)), jnp.float32),
        "logit_scale": jnp.asarray(14.0),
    }
    dense_total, dense_metrics = clip_losses(out_full, {}, None)

    @jax.jit
    def sharded(img, txt):
        def f(i, t):
            out = {"image_embed": i, "text_embed": t,
                   "logit_scale": jnp.asarray(14.0)}
            total, metrics = clip_losses(out, {}, "data")
            return jax.lax.pmean(total, "data"), jax.lax.pmean(
                metrics["top1"], "data")

        return shard_map(
            f, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=(P(), P()),
        )(img, txt)

    s = NamedSharding(mesh, P("data"))
    total, top1 = sharded(
        jax.device_put(out_full["image_embed"], s),
        jax.device_put(out_full["text_embed"], s),
    )
    np.testing.assert_allclose(float(total), float(dense_total), rtol=1e-5)
    np.testing.assert_allclose(float(top1), float(dense_metrics["top1"]),
                               atol=1e-4)
