"""FSDP (ZeRO-3-style) train-state sharding over the data axis.

The reference framework is pure data-parallel: every GPU holds a full
replica of params + Adam moments + EMA (linklink DistModule,
linklink/__init__.py). That caps model size at one device's HBM. This
module goes beyond the reference the TPU-native way: shard every large
train-state array over the existing 1-D ``data`` mesh axis and let XLA's
SPMD partitioner insert the all-gathers (weights, forward+backward) and
reduce-scatters (gradients) — the standard JAX "fully sharded data
parallel" recipe (How to Scale Your Model, §sharded-params). No model code
changes: computation follows the shardings attached to the jitted train
step's inputs/outputs, and the optax update (elementwise over matching
leaves) preserves them, so params, Adam moments, and EMA all stay sharded
across steps while the batch stays sharded over the same axis.

Per-array rule (``array_sharding``): shard the largest axis divisible by
the mesh size, preferring LEADING axes on ties — TPU tiles are (8, 128)
on (sublane, lane), so shrinking the minor-most (lane) axis below 128
pads every shard's tile out to 128 and can double the very HBM this
module exists to save; splitting a leading axis keeps full lanes.
Arrays smaller than ``min_size`` or with no divisible axis stay
replicated (BN scalars, biases, logit_scale).
nn.scan-stacked transformer leaves [L, ...] are treated like any other
array — with L=12 layers and 8-way FSDP the rule lands on the weight
matrices' feature axes, not L.

Enable with ``parallelism: {fsdp: true}`` in a config (Solver) or call
``shard_train_state`` directly. Memory: 8-way FSDP cuts per-chip
params+moments+EMA from 4x|P| to 4x|P|/8 (bf16 compute casts are
rematerialized from the gathered shards).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from declip_tpu.parallel.mesh import DATA_AXIS

# below this many elements an array is replicated — gathering tiny arrays
# costs more in collective latency than the shard saves in HBM
MIN_SHARD_SIZE = 2 ** 14


def best_shard_axis(shape, n: int, skip=()) -> Any:
    """Pick the axis to shard ``n``-ways, or None.

    Candidate ranking (lexicographic): tile-aligned first — a lane-axis
    (minor-most) shard must stay a multiple of the 128-lane tile and a
    sublane-axis shard a multiple of 8, else every shard is padded back
    out and the memory saving erodes — then largest axis, then LEADING
    position (ties: splitting a leading axis never touches the tile).
    ``skip``: axis indices unavailable (already sharded, e.g. by TP)."""
    best = None  # (aligned, size, -idx)
    for i, d in enumerate(shape):
        if i in skip or d % n:
            continue
        shard = d // n
        if i == len(shape) - 1:
            aligned = shard % 128 == 0
        elif i == len(shape) - 2:
            aligned = shard % 8 == 0
        else:
            aligned = True
        key = (aligned, d, -i)
        if best is None or key > best[:3]:
            best = (aligned, d, -i, i)
    return None if best is None else best[3]


def array_sharding(mesh: Mesh, x: Any, *, axis_name: str = DATA_AXIS,
                   min_size: int = MIN_SHARD_SIZE) -> NamedSharding:
    """The FSDP sharding for one array: largest divisible axis, else
    replicated."""
    shape = getattr(x, "shape", None)
    if shape is None or not shape:
        return NamedSharding(mesh, P())
    n = mesh.shape[axis_name]
    if int(np.prod(shape)) < min_size or n == 1:
        return NamedSharding(mesh, P())
    axis = best_shard_axis(shape, n)
    if axis is None:
        return NamedSharding(mesh, P())
    spec = [None] * len(shape)
    spec[axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def state_shardings(mesh: Mesh, state: Any, *, axis_name: str = DATA_AXIS,
                    min_size: int = MIN_SHARD_SIZE) -> Any:
    """Pytree of NamedShardings mirroring ``state`` (TrainState or any
    pytree). Applied leaf-by-leaf by shape, so params, Adam moments, and
    EMA shadows (same shapes) land on identical specs and the optax
    update stays collective-free."""
    return jax.tree.map(
        lambda x: array_sharding(mesh, x, axis_name=axis_name,
                                 min_size=min_size),
        state,
    )


def shard_train_state(mesh: Mesh, state: Any, *, axis_name: str = DATA_AXIS,
                      min_size: int = MIN_SHARD_SIZE) -> Any:
    """Device-put ``state`` with FSDP shardings (scatter, not replicate)."""
    return jax.device_put(
        state, state_shardings(mesh, state, axis_name=axis_name,
                               min_size=min_size))
