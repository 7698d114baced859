"""Config adapter details: reference data layout normalization, epoch-domain
schedulers, CLI overrides."""

import pytest

from declip_tpu.config import override, parse_config
from declip_tpu.optim.schedulers import scheduler_entry
from declip_tpu.solver import Solver


def test_normalize_reference_layout():
    cfg = parse_config("""
data:
    type: clip
    read_from: fs
    batch_size: 128
    num_workers: 7
    train:
        root_dir: ['/a/']
        meta_file: ['/m.json']
        transforms: {type: MOCOV2}
        fseek: True
    test:
      - type: clip
        read_from: fs
        batch_size: 64
        test:
            root_dir: '/val/'
            meta_file: '/val.json'
            transforms: {type: ONECROP}
            label_texts_ensemble: 'prompt80'
""")
    norm = Solver.normalize_data_config(cfg.data)
    assert norm["train"]["batch_size"] == 128
    assert norm["train"]["num_workers"] == 7
    assert norm["train"]["fseek"] is True
    entry = norm["test"][0]
    assert entry["batch_size"] == 64
    assert entry["meta_file"] == "/val.json"
    assert entry["label_texts_ensemble"] == "prompt80"


def test_epoch_schedulers():
    sched = scheduler_entry(
        {"type": "StepEpoch", "kwargs": {
            "base_lr": 0.0, "warmup_lr": 0.1, "warmup_steps": 0,
            "lr_mults": [0.1], "lr_epochs": [2]}},
        max_iter=100, iters_per_epoch=10,
    )
    assert float(sched(10)) == pytest.approx(0.1)
    assert float(sched(30)) == pytest.approx(0.01, rel=1e-5)

    sched = scheduler_entry(
        {"type": "CosineEpoch", "kwargs": {
            "base_lr": 0.0, "warmup_lr": 0.1, "warmup_steps": 0,
            "min_lr": 0.0}},
        max_iter=100,
    )
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)


def test_poly_scheduler():
    sched = scheduler_entry(
        {"type": "Poly", "kwargs": {"base_lr": 0.0, "warmup_lr": 1.0,
                                    "warmup_steps": 0, "power": 2.0}},
        max_iter=10,
    )
    # reference indexing (schedulers.py docstring): sched(s) is the lr at
    # curr_step = s+1, and Poly divides (curr - ws) by max_iter with no
    # min_lr (scheduler.py:289-298) — so step 0 is already one tick into
    # the decay: (1 - 1/10)^2
    assert float(sched(0)) == pytest.approx(0.81, rel=1e-5)
    assert float(sched(4)) == pytest.approx(0.25, rel=1e-5)  # (1 - 5/10)^2
    assert float(sched(9)) == pytest.approx(0.0, abs=1e-6)


def test_cli_override_json_values():
    cfg = parse_config("a: {b: 1}\nlst: [1]")
    cfg2 = override(cfg, "lst", [1, 2, 3])
    assert cfg2.lst == [1, 2, 3]
    cfg3 = override(cfg, "a.c.d", True)
    assert cfg3.a.c.d is True
    assert "c" not in cfg.a
