"""Loss-spike detection + checkpoint rollback (declip_solver.py:548-619
equivalent)."""

import os
import shutil

import numpy as np
import pytest

from declip_tpu.utils.meters import AverageMeter

CONFIG_SRC = os.path.join(
    os.path.dirname(__file__), "..", "experiments", "unit", "tiny_clip",
    "config.yaml",
)


def test_spike_detector_logic():
    from declip_tpu.config import parse_config
    from declip_tpu.solver import Solver

    window = AverageMeter(length=100)
    spike = Solver._spike.__get__(
        type("S", (), {"config": parse_config("saver: {spike_threshold: 10}")})()
    )
    # NaN always spikes
    assert spike(float("nan"), window)
    # warmup: no spike before 20 updates
    for _ in range(10):
        window.update(2.0)
    assert not spike(100.0, window)
    for _ in range(15):
        window.update(2.0)
    assert spike(100.0, window)  # avg 2 + thr 10 < 100
    assert not spike(5.0, window)


def test_rollback_restores_old_checkpoint(tmp_path):
    from declip_tpu.config import override, parse_config
    from declip_tpu.checkpoint import save_checkpoint
    from declip_tpu.solver import Solver

    shutil.copy(CONFIG_SRC, tmp_path / "config.yaml")
    cfg = parse_config(str(tmp_path / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 10)
    cfg = override(cfg, "saver.rollback", True)
    cfg = override(cfg, "data.test", [])
    cfg["_config_path"] = str(tmp_path / "config.yaml")
    solver = Solver(cfg)

    # fabricate checkpoints at steps 1..4
    import jax
    import jax.numpy as jnp

    for step in (1, 2, 3, 4):
        solver.state = solver.state.replace(
            step=jnp.asarray(step, jnp.int32))
        save_checkpoint(solver.path.ckpt_path, solver.state, save_many=True)

    solver.state = solver.state.replace(step=jnp.asarray(9, jnp.int32))
    before_decay = solver._warmup_decay
    assert solver._rollback(9)
    # rolled back to an old step (>= 3 save-points back: step 1 or 2)
    assert int(solver.state.step) in (1, 2)
    assert solver._warmup_decay == pytest.approx(before_decay * 0.997)
    # rollback disabled -> no-op
    cfg2 = override(cfg, "saver.rollback", False)
    cfg2["_config_path"] = str(tmp_path / "config.yaml")
    solver2 = Solver(cfg2)
    assert not solver2._rollback(9)
