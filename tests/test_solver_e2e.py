"""End-to-end solver test: the hermetic tiny-CLIP config (BASELINE.json
config #1 analogue) — train, eval, checkpoint, resume."""

import json
import os
import shutil

import numpy as np
import pytest

CONFIG_SRC = os.path.join(
    os.path.dirname(__file__), "..", "experiments", "unit", "tiny_clip",
    "config.yaml",
)


@pytest.fixture
def exp_dir(tmp_path):
    shutil.copy(CONFIG_SRC, tmp_path / "config.yaml")
    return tmp_path


def test_tiny_clip_end_to_end(exp_dir):
    from declip_tpu.config import override, parse_config
    from declip_tpu.solver import Solver

    cfg = parse_config(str(exp_dir / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 8)
    cfg = override(cfg, "saver.save_freq", 4)
    cfg = override(cfg, "saver.print_freq", 4)
    cfg["_config_path"] = str(exp_dir / "config.yaml")

    solver = Solver(cfg)
    assert solver.max_iter == 8
    solver.train()

    # checkpoints written
    ckpts = os.listdir(exp_dir / "checkpoints")
    assert any(c.startswith("ckpt_") for c in ckpts)
    # scalars logged
    scalars = (exp_dir / "events" / "scalars.jsonl").read_text().splitlines()
    tags = {json.loads(l)["tag"] for l in scalars}
    assert {"loss", "lr", "top1"} <= tags
    # eval results dumped
    res = (exp_dir / "results" / "results.txt.rank0").read_text().splitlines()
    assert len(res) == 64
    line = json.loads(res[0])
    assert set(line) >= {"label", "score", "prediction", "filename"}

    # resume: a new solver picks up from the checkpoint
    solver2 = Solver(cfg)
    assert solver2.start_step == 8

    # evaluate-only path produces a sane metric dict
    metrics = solver2.evaluate(solver2.test_cfgs[0])
    assert 0.0 <= metrics["top1"] <= 100.0
    assert metrics["n"] == 64
