"""Standalone sharded smoke for grouped BN under pjit (8 virtual CPU devs).

Run directly (NOT under pytest — see CLAUDE.md 1-vCPU rendezvous gotcha):
    python tests/standalone_bn_groups_sharded.py
Asserts that the grouped-stats ResNet produces identical outputs whether the
batch is sharded over an 8-device 'data' mesh axis or run on one device.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from declip_tpu.models.resnet import ModifiedResNet  # noqa: E402


def main():
    n, g = 16, 8  # 8 data ways, per-replica stats (use_sync_bn: False)
    model = ModifiedResNet(layers=(1, 1, 1, 1), embed_dim=16, heads=2,
                           input_resolution=32, width=8, bn_stats_groups=g)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x[:2]),
                           train=False)

    def fwd(v, xx):
        return model.apply(v, xx, train=True, mutable=["batch_stats"])

    # single-device truth
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
    print("OK: grouped-BN ResNet identical sharded (8-dev) vs single-device")


if __name__ == "__main__":
    main()
