"""Solver data-path wiring: the production build_data/_train_loader must
consume the FULL reference data config (use_ranked, image_reader, sampler
type, server_cfg) through build_clip_dataloader, not a hand-rolled subset
(reference: prototype/data/clip_dataloader.py:66-136, sampler.py:237-266)."""

import shutil

import numpy as np
import pytest

from declip_tpu.config import override, parse_config
from declip_tpu.data.dataloader import build_clip_dataloader, build_sampler
from declip_tpu.data.dataset import ClipDatasetRanked, ImageNetDataset
from declip_tpu.data.sampler import (
    DistributedEpochSampler,
    DistributedGivenIterationSampler,
    DistributedSampler,
    RankedGivenIterationSampler,
)

CONFIG_SRC = __file__.rsplit("/", 2)[0] + \
    "/experiments/unit/tiny_clip/config.yaml"


def _solver(tmp_path, **overrides):
    from declip_tpu.solver import Solver

    shutil.copy(CONFIG_SRC, tmp_path / "config.yaml")
    cfg = parse_config(str(tmp_path / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 4)
    for key, value in overrides.items():
        cfg = override(cfg, key, value)
    cfg["_config_path"] = str(tmp_path / "config.yaml")
    return Solver(cfg)


def test_solver_consumes_use_ranked_and_image_reader(tmp_path):
    solver = _solver(
        tmp_path,
        **{
            "data.train.use_ranked": True,
            "data.train.image_reader": {"type": "native", "min_side": 320},
        },
    )
    ds = solver.train_dataset
    assert isinstance(ds, ClipDatasetRanked)
    assert ds.image_reader_type == "native"
    assert ds.native_min_side == 320
    loader = solver._train_loader(-1)
    assert isinstance(loader.sampler, RankedGivenIterationSampler)
    batch = next(iter(loader))
    assert batch["images"].shape[0] == solver.host_batch


def test_solver_sampler_type_dispatch(tmp_path):
    solver = _solver(
        tmp_path, **{"data.train.sampler": {"type": "distributed_epoch"}})
    loader = solver._train_loader(-1)
    assert isinstance(loader.sampler, DistributedEpochSampler)
    # default stays the reference default
    solver2 = _solver(tmp_path)
    assert isinstance(
        solver2._train_loader(-1).sampler, DistributedGivenIterationSampler)


def test_plain_distributed_sampler():
    # reference sampler.py:8-54: epoch permutation, round_up padding,
    # contiguous per-rank slabs, full coverage
    samplers = [
        DistributedSampler(dataset_size=10, world_size=4, rank=r)
        for r in range(4)
    ]
    seen = []
    for s in samplers:
        idx = list(iter(s))
        assert len(idx) == 3  # ceil(10/4)
        seen.extend(idx)
    assert set(seen) == set(range(10))
    # deterministic per epoch, reshuffled across epochs
    a = list(iter(samplers[0]))
    samplers[0].set_epoch(0)
    assert list(iter(samplers[0])) == a
    samplers[0].set_epoch(1)
    assert list(iter(samplers[0])) != a


def test_build_sampler_distributed_via_config():
    s = build_sampler(
        {"sampler": {"type": "distributed"}, "batch_size": 4, "max_epoch": 1},
        dataset_size=16, world_size=2, rank=0)
    assert isinstance(s, DistributedSampler)
    assert len(s) == 8


def test_use_ranked_forces_ranked_sampler():
    # clip_dataloader.py:88-90: use_ranked overrides the configured sampler
    s = build_sampler(
        {"sampler": {"type": "distributed_iteration"}, "use_ranked": True,
         "batch_size": 2, "max_iter": 3},
        dataset_size=8)
    assert isinstance(s, RankedGivenIterationSampler)


def test_imagenet_dataset_honors_reader_kwargs(tmp_path):
    meta = tmp_path / "val.txt"
    meta.write_text("\n".join(f"img_{i}.jpg {i % 2}" for i in range(6)))
    ds = ImageNetDataset(
        root_dir="", meta_file=str(meta), read_from="synthetic",
        fseek=True, image_reader_type="native", native_min_side=256)
    assert ds.image_reader_type == "native"
    assert ds.native_min_side == 256
    assert len(ds) == 6
    item = ds[3]
    assert item["label"] == 1
    assert item["filename"] == "img_3.jpg"


def test_eval_loader_builds_imagenet_with_reader(tmp_path):
    solver = _solver(tmp_path)
    meta = tmp_path / "val.txt"
    meta.write_text("\n".join(f"img_{i}.jpg {i % 2}" for i in range(4)))
    # imagenet type + fs read: ImageNetDataset with the native reader wired
    ds, bs = solver._eval_loader({
        "type": "imagenet", "meta_file": str(meta), "root_dir": "",
        "read_from": "fs", "batch_size": 2,
        "image_reader": {"type": "native", "min_side": 0},
        "transforms": {"type": "ONECROP"},
    })
    assert isinstance(ds, ImageNetDataset)
    assert ds.image_reader_type == "native"
    assert bs == 2


def test_solver_trains_with_autoaug(tmp_path):
    solver = _solver(
        tmp_path,
        **{"data.train.transforms": {"type": "AUTOAUG"},
           "saver.print_freq": 2, "data.test": []},
    )
    solver.train()
    assert int(solver.state.step) == 4
