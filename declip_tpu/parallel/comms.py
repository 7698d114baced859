"""Host-level communication helpers.

Rebuilds the remaining linklink surface (SURVEY.md §2.1):
- ``broadcast_object`` (prototype/utils/dist.py:111-126, pickle broadcast of
  eval metrics) -> ``multihost_utils.broadcast_one_to_all`` over bytes;
- ``simple_group_split`` (dist.py:39-46, subgroup communicators for grouped
  SyncBN) -> ``axis_index_groups`` lists consumed by flax BatchNorm /
  lax.pmean under shard_map;
- ``AverageMeter.reduce_update``'s allreduce (misc.py:38-40) ->
  ``global_mean`` psum-mean of host scalars.
"""

from __future__ import annotations

import pickle
from typing import Any, List, Sequence

import jax
import numpy as np


def broadcast_object(obj: Any, root: int = 0) -> Any:
    """Pickle-broadcast an arbitrary object from the root process to all
    hosts (single-host: identity)."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    is_src = jax.process_index() == root
    payload = pickle.dumps(obj) if is_src else b""
    # length-prefix to a fixed buffer: first broadcast the size, then bytes
    size = np.asarray([len(payload)], np.int64)
    size = multihost_utils.broadcast_one_to_all(size, is_source=is_src)
    buf = np.zeros(int(size[0]), np.uint8)
    if is_src:
        buf[:] = np.frombuffer(payload, np.uint8)
    buf = multihost_utils.broadcast_one_to_all(buf, is_source=is_src)
    return pickle.loads(buf.tobytes())


def group_split(world_size: int, group_size: int) -> List[List[int]]:
    """Contiguous subgroups of ``group_size`` ranks — the axis_index_groups
    equivalent of the reference's ``simple_group_split``
    (modified_resnet.py:121-142's bn_group construction)."""
    assert world_size % group_size == 0
    return [
        list(range(i, i + group_size))
        for i in range(0, world_size, group_size)
    ]


def global_mean(values: Sequence[float]) -> np.ndarray:
    """Mean of per-host scalars across processes (meter reduction)."""
    arr = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(arr)
    ).mean(axis=0)
