"""Grouped SyncBatchNorm under shard_map: flax BatchNorm with axis_name +
axis_index_groups must compute statistics within rank groups — the TPU
equivalent of the reference's grouped SyncBN (modified_resnet.py:121-142,
bn_group_size config)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from declip_tpu.models.resnet import BatchNorm
from declip_tpu.parallel.comms import group_split


def test_grouped_bn_statistics(rng):
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    w = mesh.devices.size  # 8
    groups = group_split(w, 4)  # two groups of 4 ranks
    n, c = 16, 4
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(n, c)), jnp.float32)

    bn = BatchNorm(axis_name="data", axis_index_groups=groups)
    variables = bn.init(jax.random.PRNGKey(0), x[:2], train=False)

    @jax.jit
    def grouped(x):
        def f(x):
            y, _ = bn.apply(variables, x, train=True,
                            mutable=["batch_stats"])
            return y

        return shard_map(f, mesh=mesh, in_specs=P("data"),
                         out_specs=P("data"))(x)

    y = np.asarray(grouped(jax.device_put(x, NamedSharding(mesh, P("data")))))

    # expected: normalize each half of the batch (ranks 0-3 hold rows 0..7,
    # ranks 4-7 hold rows 8..15) with ITS OWN statistics
    xh = np.asarray(x)
    expect = np.empty_like(xh)
    for rows in (slice(0, n // 2), slice(n // 2, n)):
        mu = xh[rows].mean(0)
        var = xh[rows].var(0)
        expect[rows] = (xh[rows] - mu) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-5)

    # and the two halves genuinely used different stats
    global_mu = xh.mean(0)
    global_norm = (xh - global_mu) / np.sqrt(xh.var(0) + 1e-5)
    assert not np.allclose(y, global_norm, atol=1e-3)
