"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's L0 distributed backend
(linklink shim + DistModule + SLURM rendezvous, SURVEY.md §2.1): one
``jax.sharding.Mesh`` whose 'data' axis carries the global batch; parameters
and train state are replicated; XLA inserts all collectives (gradient psum,
feature all-gather) during SPMD partitioning.

``jax.distributed.initialize`` handles multi-host rendezvous (the analogue of
linklink/__init__.py:42-67's SLURM parsing) — called by the solver when
JAX coordination env vars are present.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"  # multi-slice data parallelism: the inter-slice network


def _slice_major(devices: np.ndarray, slices: int) -> np.ndarray:
    """Order devices slice-major for a [slices, per_slice] reshape.

    Real multi-slice TPU devices carry ``slice_index``; grouping rows by it
    keeps every 'data'-axis collective on intra-slice ICI and only the
    leading 'dcn' axis on the (slower) inter-slice DCN. Devices without
    slice_index (CPU test meshes, single slice) keep their given order."""
    devs = list(devices.ravel())
    if devices.size % slices:
        raise ValueError(
            f"{devices.size} devices not divisible by slices={slices}")
    idx = {getattr(d, "slice_index", None) for d in devs}
    if None not in idx:
        # real multi-slice hardware: the 'dcn' axis MUST align with the
        # physical slice boundaries, otherwise 'data'-axis collectives
        # silently ride DCN (a large perf cliff, not an error XLA reports).
        # Refuse any request that cannot partition devices slice-major into
        # `slices` equal groups.
        counts: dict = {}
        for d in devs:
            counts[d.slice_index] = counts.get(d.slice_index, 0) + 1
        per = devices.size // slices
        if len(idx) != slices or any(c != per for c in counts.values()):
            raise ValueError(
                f"parallelism: slices={slices} does not match the physical "
                f"topology: devices span {len(idx)} slice_index group(s) "
                f"with sizes {sorted(counts.values())} (need {slices} "
                f"groups of {per}). A 'dcn' axis cutting across slice "
                "boundaries would put 'data' collectives on DCN.")
        devs = sorted(devs, key=lambda d: (d.slice_index, d.id))
    return np.asarray(devs)


def make_mesh(devices=None, axis_name: str = DATA_AXIS, tp: int = 1,
              pp: int = 1, ep: int = 1, slices: int = 1) -> Mesh:
    """1-D data mesh, or — with ``tp > 1`` / ``pp > 1`` / ``ep > 1`` — a
    2-D [data, model], [data, pipe] or [data, expert] mesh whose trailing
    axis carries tensor-parallel (parallel/tp.py), pipeline
    (parallel/pp.py) or MoE expert-parallel (models/layers.py MoeMlpBlock)
    shards. Adjacent device ids land on the same model/pipe/expert group,
    keeping the intra-group collectives (TP all-reduces, pipeline
    ppermutes, MoE dispatch all-to-alls) on the shortest ICI hops.

    ``slices > 1`` (``parallelism: {slices: N}``) prepends a 'dcn' axis for
    multi-slice data parallelism: the batch shards over BOTH ('dcn',
    'data'), gradients psum hierarchically (reduce within the slice over
    ICI, then across slices over DCN — GSPMD emits that decomposition from
    the mesh topology), and everything placed over 'data' only (FSDP
    shards, TP groups) stays inside one slice's ICI domain."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if sum(n > 1 for n in (tp, pp, ep)) > 1:
        raise ValueError("tp, pp and ep do not compose yet — pick one")
    lead_axes: tuple = (axis_name,)
    if slices > 1:
        if pp > 1:
            raise ValueError(
                "parallelism: slices does not compose with pp — the GPipe "
                "ppermute schedule is not validated across DCN hops")
        devices = _slice_major(devices, slices)
        lead_axes = (DCN_AXIS, axis_name)
    lead_shape = (slices, -1) if slices > 1 else (-1,)
    for n, axis in ((tp, MODEL_AXIS), (pp, "pipe"), (ep, "expert")):
        if n > 1:
            if devices.size % (n * slices):
                raise ValueError(f"{devices.size} devices not divisible by "
                                 f"{axis}={n} x slices={slices}")
            return Mesh(devices.reshape(*lead_shape, n), (*lead_axes, axis))
    return Mesh(devices.reshape(lead_shape), lead_axes)


def batch_axes(mesh: Mesh) -> tuple:
    """The mesh axes that carry the global batch's data-parallel shards, in
    sharding order — ('dcn', 'data') on a multi-slice mesh, ('data',)
    otherwise. Ring-scheduled losses iterate these hierarchically (inner
    ring on ICI, one outer shift per inner cycle on DCN); 'expert' is NOT
    included — it co-shards the batch under ep but carries MoE dispatch,
    not a ring."""
    if DCN_AXIS in mesh.axis_names:
        return (DCN_AXIS, DATA_AXIS)
    return (DATA_AXIS,)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over every data-parallel axis.

    On an expert mesh ([data, expert], ``parallelism: {ep: N}``) the batch
    shards over BOTH axes: non-MoE compute stays fully data-parallel and
    only the MoE dispatch/FFN tensors pin to 'expert'
    (parallel/tp.py set_activation_sharding). On a multi-slice mesh
    ([dcn, data, ...], ``parallelism: {slices: N}``) the batch additionally
    shards over the leading 'dcn' axis."""
    axes = list(batch_axes(mesh))
    if "expert" in mesh.axis_names:
        axes.append("expert")
    return NamedSharding(mesh, P(tuple(axes) if len(axes) > 1 else axes[0]))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch with the batch dim sharded over the mesh.

    Multi-process: each host's loader yields only ITS rows of the global
    batch (Solver.host_batch), so the global array is assembled from
    process-local shards — plain device_put of per-rank-different values
    trips jax's same-value-across-processes assertion (caught by
    tests/test_multiprocess_smoke.py::test_two_process_solver_train)."""
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def apply_platform_override() -> None:
    """Honor ``DECLIP_PLATFORM=cpu|tpu`` in-process.

    Some site configurations (the axon remote-TPU shim here) rewrite
    ``JAX_PLATFORMS`` in a sitecustomize, so the standard env var cannot
    force the CPU backend from a shell. This reads our own env var and
    applies it via jax.config BEFORE any backend initializes —
    ``--xla_force_host_platform_device_count`` in XLA_FLAGS is read lazily,
    so an 8-virtual-device CPU solver run works from the CLI:
    ``DECLIP_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
    python -m declip_tpu.solver ...``."""
    import os

    plat = os.environ.get("DECLIP_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)


_dist_initialized = False


def maybe_initialize_distributed() -> None:
    """Multi-host rendezvous when launched under a JAX coordinator.

    The env check MUST come before any backend query: jax.process_count()
    initializes the local backend, after which jax.distributed.initialize()
    refuses to run."""
    import os

    global _dist_initialized
    apply_platform_override()
    if _dist_initialized:
        return
    slurm_nodes = int(os.environ.get("SLURM_JOB_NUM_NODES", "1") or 1)
    if ("COORDINATOR_ADDRESS" in os.environ
            or "JAX_COORDINATOR_ADDRESS" in os.environ
            or slurm_nodes > 1):
        # jax.distributed autodetects SLURM/TPU-pod cluster environments
        # (the analogue of linklink's SLURM_NODELIST parsing)
        jax.distributed.initialize()
        _dist_initialized = True
