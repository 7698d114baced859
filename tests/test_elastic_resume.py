"""World-size-elastic resume (beyond-reference; VERDICT r4 #9).

The reference's sampler slabs are world-size-baked
(prototype/data/sampler.py:57-106): a run can only resume on the topology it
started on. Our DistributedGivenIterationSampler accepts the ORIGINAL
(orig_world_size, orig_batch_size) layout and re-shards the original run's
per-iteration global batches onto the new topology, so a checkpoint saved at
N hosts restores onto M with an IDENTICAL global batch stream (conserved
global batch), and the Solver auto-detects the topology change from the
ckpt_meta.json sidecar.
"""

import json
import os
import shutil

import numpy as np
import pytest

from declip_tpu.data.sampler import DistributedGivenIterationSampler

CONFIG_SRC = os.path.join(
    os.path.dirname(__file__), "..", "experiments", "unit", "tiny_clip",
    "config.yaml",
)


def _global_stream(world, batch, total_iter, last_iter=-1, orig=None):
    """iteration -> rank-major global index batch for a topology."""
    kw = {}
    if orig:
        kw = {"orig_world_size": orig[0], "orig_batch_size": orig[1]}
    per_rank = [
        list(DistributedGivenIterationSampler(
            dataset_size=1000, total_iter=total_iter, batch_size=batch,
            world_size=world, rank=r, last_iter=last_iter, seed=0, **kw))
        for r in range(world)
    ]
    steps = len(per_rank[0]) // batch
    out = []
    for t in range(steps):
        out.append(np.concatenate(
            [np.asarray(pr[t * batch:(t + 1) * batch]) for pr in per_rank]))
    return out


def test_sampler_elastic_preserves_global_batches():
    """8 hosts x b=4 -> 4 x 8, 2 x 16 and 1 x 32: every iteration's global
    batch (rank-major) is identical to the original topology's."""
    ref = _global_stream(8, 4, total_iter=12)
    for world, batch in ((4, 8), (2, 16), (1, 32)):
        got = _global_stream(world, batch, total_iter=12, orig=(8, 4))
        assert len(got) == len(ref)
        for t, (a, b) in enumerate(zip(ref, got)):
            np.testing.assert_array_equal(a, b, err_msg=f"iter {t}")


def test_sampler_elastic_resume_midstream():
    """Resuming at last_iter=k on the new topology continues the original
    stream from iteration k+1."""
    ref = _global_stream(8, 4, total_iter=12)
    got = _global_stream(2, 16, total_iter=12, last_iter=4, orig=(8, 4))
    for t, g in enumerate(got):
        np.testing.assert_array_equal(ref[5 + t], g)


def test_sampler_elastic_noop_when_same():
    a = list(DistributedGivenIterationSampler(
        dataset_size=100, total_iter=5, batch_size=4, world_size=2, rank=1,
        seed=0))
    b = list(DistributedGivenIterationSampler(
        dataset_size=100, total_iter=5, batch_size=4, world_size=2, rank=1,
        seed=0, orig_world_size=2, orig_batch_size=4))
    assert a == b


def test_sampler_elastic_rejects_global_batch_change():
    with pytest.raises(ValueError, match="global batch"):
        DistributedGivenIterationSampler(
            dataset_size=100, total_iter=5, batch_size=4, world_size=4,
            rank=0, orig_world_size=8, orig_batch_size=4)


def test_solver_elastic_resume_detection(tmp_path):
    """A checkpoint whose ckpt_meta.json records a different topology makes
    the Solver re-shard the sampler stream: its loader batches equal the
    original-topology global batches."""
    import jax
    import jax.numpy as jnp

    from declip_tpu.checkpoint import save_checkpoint
    from declip_tpu.config import override, parse_config
    from declip_tpu.solver import Solver

    shutil.copy(CONFIG_SRC, tmp_path / "config.yaml")
    cfg = parse_config(str(tmp_path / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 8)
    cfg = override(cfg, "data.test", [])
    cfg["_config_path"] = str(tmp_path / "config.yaml")
    solver = Solver(cfg)
    b = solver.host_batch

    # write a step-3 checkpoint recorded as a 2-host x b/2 run
    solver.state = solver.state.replace(step=jnp.asarray(3, jnp.int32))
    save_checkpoint(solver.path.ckpt_path, solver.state,
                    meta={"world_size": 2, "host_batch": b // 2,
                          "global_batch": b})

    solver2 = Solver(cfg)
    assert solver2.start_step == 3
    assert solver2._elastic_orig == (2, b // 2)

    # the re-sharded loader's batches must equal the 2-host stream's
    # rank-major global batches from iteration 4 on
    loader = solver2._train_loader(3)
    per_rank = [
        DistributedGivenIterationSampler(
            dataset_size=len(solver2.train_dataset), total_iter=8,
            batch_size=b // 2, world_size=2, rank=r, last_iter=3,
            seed=int(cfg.get_path("seed", 0)))
        for r in range(2)
    ]
    streams = [list(s) for s in per_rank]
    got_indices = list(loader.sampler)
    for t in range(len(got_indices) // b):
        want = np.concatenate([
            np.asarray(streams[r][t * (b // 2):(t + 1) * (b // 2)])
            for r in range(2)])
        np.testing.assert_array_equal(
            want, np.asarray(got_indices[t * b:(t + 1) * b]),
            err_msg=f"iter {t}")

    # global-batch change refuses loudly
    save_checkpoint(solver.path.ckpt_path, solver.state,
                    meta={"world_size": 2, "host_batch": b,
                          "global_batch": 2 * b})
    with pytest.raises(ValueError, match="global batch"):
        Solver(cfg)
