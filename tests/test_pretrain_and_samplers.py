"""Pretrain weight loading (checkpoint.load_pretrain), the ranked-local
sampler, and the Cutout transform — the last §2 inventory items: reference
misc.py:441-479 + clip_solver.py:140-163, sampler.py:171-227,
transforms.py:94-120."""

import os
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from declip_tpu.checkpoint import load_pretrain, save_checkpoint
from declip_tpu.data.sampler import RankedGivenIterationSampler
from declip_tpu.data.transforms import Cutout
from declip_tpu.train.state import new_train_state


def _tiny_state(seed=0, extra=False):
    k = jax.random.PRNGKey(seed)
    params = {
        "visual": {"conv": {"kernel": jax.random.normal(k, (3, 3, 4, 8))}},
        "text": {"proj": {"kernel": jax.random.normal(k, (8, 16))}},
    }
    if extra:  # a head the pretrain checkpoint doesn't have
        params["head"] = {"w": jnp.zeros((16, 2))}
    stats = {"visual": {"bn": {"mean": jnp.zeros((8,)),
                               "var": jnp.ones((8,))}}}
    return new_train_state(params=params, batch_stats=stats,
                           opt_state={"count": jnp.zeros(())})


def test_load_pretrain_model_only(tmp_path):
    src = _tiny_state(seed=1)
    src = src.replace(step=jnp.asarray(777, jnp.int32),
                      opt_state={"count": jnp.asarray(99.0)})
    path = save_checkpoint(str(tmp_path), src)

    dst = _tiny_state(seed=2, extra=True)
    loaded, unmatched = load_pretrain(path, dst)
    # model weights came from the checkpoint...
    np.testing.assert_array_equal(
        np.asarray(loaded.params["visual"]["conv"]["kernel"]),
        np.asarray(src.params["visual"]["conv"]["kernel"]))
    # ...but step/optimizer stay fresh (modify_state drops them)
    assert int(loaded.step) == 0
    assert float(loaded.opt_state["count"]) == 0.0
    # the extra head has no source -> kept at init, reported
    assert unmatched == ["head/w"]
    np.testing.assert_array_equal(np.asarray(loaded.params["head"]["w"]), 0.0)


def test_load_pretrain_ignore_prefix(tmp_path):
    src = _tiny_state(seed=1)
    path = save_checkpoint(str(tmp_path), src)
    dst = _tiny_state(seed=2)
    loaded, _ = load_pretrain(path, dst, ignore=("text",))
    # text subtree kept at dst's init despite existing in the checkpoint
    np.testing.assert_array_equal(
        np.asarray(loaded.params["text"]["proj"]["kernel"]),
        np.asarray(dst.params["text"]["proj"]["kernel"]))
    assert not np.allclose(np.asarray(loaded.params["text"]["proj"]["kernel"]),
                           np.asarray(src.params["text"]["proj"]["kernel"]))
    # visual still loaded
    np.testing.assert_array_equal(
        np.asarray(loaded.params["visual"]["conv"]["kernel"]),
        np.asarray(src.params["visual"]["conv"]["kernel"]))


def test_ranked_sampler_cycles_and_resumes():
    s = RankedGivenIterationSampler(
        dataset_size=10, total_iter=5, batch_size=4, seed=0)
    idx = list(s)
    assert len(idx) == 20
    assert all(0 <= i < 10 for i in idx)
    # single permutation cycled (no reshuffle between passes)
    assert idx[10:20] == idx[0:10]
    # resume at last_iter=2 skips exactly 2*4 draws
    s2 = RankedGivenIterationSampler(
        dataset_size=10, total_iter=5, batch_size=4, seed=0, last_iter=1)
    assert list(s2) == idx[8:]


def test_cutout_zeroes_patches():
    rng = random.Random(0)
    arr = np.ones((32, 32, 3), np.float32)
    out = Cutout(n_holes=2, length=8, prob=1.0, rng=rng)(arr)
    assert (out == 0).any() and (out == 1).any()
    assert arr.min() == 1.0  # input not mutated
    # prob=0 is the identity
    out2 = Cutout(prob=0.0, rng=rng)(arr)
    np.testing.assert_array_equal(out2, arr)


def test_build_clip_dataloader_ranked():
    """use_ranked wires ClipDatasetRanked + the local sampler
    (clip_dataloader.py:86-90)."""
    from declip_tpu.data.dataloader import build_clip_dataloader
    from declip_tpu.data.dataset import ClipDatasetRanked

    cfg = {"meta_file": "64", "read_from": "synthetic", "batch_size": 4,
           "use_ranked": True, "num_workers": 1}
    loaders = [build_clip_dataloader(dict(cfg), world_size=4, rank=r,
                                     total_iter=2) for r in (0, 1)]
    for ld in loaders:
        assert isinstance(ld.dataset, ClipDatasetRanked)
        assert len(ld) == 2
    b0 = next(iter(loaders[0]))
    b1 = next(iter(loaders[1]))
    assert b0["images"].shape == b1["images"].shape
    # different ranks hold disjoint shards -> different content
    assert not np.array_equal(b0["images"], b1["images"])
