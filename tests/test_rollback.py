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


def test_rollback_reset_opt_reference_mode(tmp_path):
    """saver.rollback_reset_opt: reference-exact recovery
    (declip_solver.py:600-607) — Adam moments zeroed / bias-correction
    count restarted, but the rebuilt schedule fast-forwarded to the
    restored step so the LR does not silently replay warmup from 0."""
    import jax
    import jax.numpy as jnp
    import optax

    from declip_tpu.config import override, parse_config
    from declip_tpu.checkpoint import save_checkpoint
    from declip_tpu.solver import Solver

    shutil.copy(CONFIG_SRC, tmp_path / "config.yaml")
    cfg = parse_config(str(tmp_path / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 10)
    cfg = override(cfg, "saver.rollback", True)
    cfg = override(cfg, "saver.rollback_reset_opt", True)
    cfg = override(cfg, "data.test", [])
    cfg["_config_path"] = str(tmp_path / "config.yaml")
    solver = Solver(cfg)

    # dirty the moments so a restore-without-reset would be visible
    dirty_opt = jax.tree.map(
        lambda x: x + 1.0 if jnp.issubdtype(x.dtype, jnp.floating) else x,
        solver.state.opt_state)
    solver.state = solver.state.replace(opt_state=dirty_opt)
    for step in (1, 2, 3, 4):
        solver.state = solver.state.replace(step=jnp.asarray(step, jnp.int32))
        save_checkpoint(solver.path.ckpt_path, solver.state, save_many=True)
    solver.state = solver.state.replace(step=jnp.asarray(9, jnp.int32))

    assert solver._rollback(9)
    restored_step = int(solver.state.step)
    assert restored_step in (1, 2)

    counts, moments = [], []

    def walk(s):
        if isinstance(s, optax.ScaleByScheduleState):
            counts.append(int(s.count))
            return s
        if isinstance(s, optax.ScaleByAdamState):
            moments.append(s)
            counts.append(("adam", int(s.count)))
            return s
        return s

    jax.tree.map(walk, solver.state.opt_state,
                 is_leaf=lambda s: isinstance(
                     s, (optax.ScaleByScheduleState, optax.ScaleByAdamState)))
    # schedule count fast-forwarded to the restored step
    assert any(c == restored_step for c in counts if isinstance(c, int))
    # Adam restarted: count 0, moments exactly zero (the checkpoint's were
    # dirtied to nonzero above, so this proves the reset happened)
    adam_counts = [c[1] for c in counts if isinstance(c, tuple)]
    assert adam_counts and all(c == 0 for c in adam_counts)
    for st in moments:
        assert all(float(jnp.abs(leaf).max()) == 0.0
                   for leaf in jax.tree.leaves((st.mu, st.nu)))
