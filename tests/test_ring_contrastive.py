"""Ring (ppermute) InfoNCE must match the dense gathered loss — value and
gradients — on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from declip_tpu.ops.contrastive import clip_pair_loss, ring_clip_pair_loss


def _mesh():
    return Mesh(np.asarray(jax.devices()), ("data",))


def _feats(rng, n=16, d=8):
    a = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    return a / jnp.linalg.norm(a, axis=-1, keepdims=True)


def test_ring_loss_matches_dense(rng):
    mesh = _mesh()
    img, txt = _feats(rng), _feats(rng)
    scale = jnp.asarray(20.0)
    dense = clip_pair_loss(img, txt, scale)[0]

    @jax.jit
    def ring(img, txt):
        def f(i, t):
            return jax.lax.pmean(
                ring_clip_pair_loss(i, t, scale, "data"), "data")

        return shard_map(f, mesh=mesh, in_specs=(P("data"), P("data")),
                         out_specs=P())(img, txt)

    s = NamedSharding(mesh, P("data"))
    out = ring(jax.device_put(img, s), jax.device_put(txt, s))
    np.testing.assert_allclose(float(out), float(dense), rtol=1e-5)


def test_ring_gradients_match_dense(rng):
    mesh = _mesh()
    img, txt = _feats(rng), _feats(rng)
    scale = jnp.asarray(10.0)

    g_dense = jax.grad(
        lambda i, t: clip_pair_loss(i, t, scale)[0], argnums=(0, 1)
    )(img, txt)

    @jax.jit
    def ring_grads(img, txt):
        def f(i, t):
            def loss(i, t):
                return jax.lax.pmean(
                    ring_clip_pair_loss(i, t, scale, "data"), "data")

            return jax.grad(loss, argnums=(0, 1))(i, t)

        return shard_map(f, mesh=mesh, in_specs=(P("data"), P("data")),
                         out_specs=(P("data"), P("data")))(img, txt)

    s = NamedSharding(mesh, P("data"))
    g_ring = ring_grads(jax.device_put(img, s), jax.device_put(txt, s))
    for a, b in zip(g_dense, g_ring):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-7)
