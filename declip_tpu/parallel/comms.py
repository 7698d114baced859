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


def gather_object(obj: Any) -> List[Any]:
    """All-gather arbitrary pickleable objects across processes, returned in
    process order (single-host: ``[obj]``).

    Replaces the reference's shared-filesystem result merging
    (base_dataset.py:122-139: every rank dumps results.txt.rank<i> and rank
    0 reads them back — which requires NFS). Pods have no shared FS, so the
    eval merge rides the ICI/DCN collective instead: pickled bytes are
    length-prefixed and padded to the max size for process_allgather."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64))  # [W, 1]
    buf = np.zeros((int(sizes.max()),), np.uint8)
    buf[:payload.size] = payload
    bufs = multihost_utils.process_allgather(buf)  # [W, max]
    return [
        pickle.loads(bufs[i, :int(sizes[i, 0])].tobytes())
        for i in range(bufs.shape[0])
    ]


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
