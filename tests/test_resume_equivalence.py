"""Exact-resume: train N steps straight vs train k (same config), checkpoint,
restart, train to N — final parameters must match (the sampler precomputes
the full total_iter index stream, so both runs see identical batches; state
restores exactly)."""

import os
import shutil

import jax
import numpy as np
import pytest

CONFIG_SRC = os.path.join(
    os.path.dirname(__file__), "..", "experiments", "unit", "tiny_clip",
    "config.yaml",
)

MAX_ITER = 6


def _make_solver(exp):
    from declip_tpu.config import override, parse_config
    from declip_tpu.solver import Solver

    exp.mkdir(parents=True, exist_ok=True)
    if not (exp / "config.yaml").exists():
        shutil.copy(CONFIG_SRC, exp / "config.yaml")
    cfg = parse_config(str(exp / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", MAX_ITER)
    cfg = override(cfg, "saver.save_freq", 0)
    cfg = override(cfg, "saver.print_freq", 100)
    cfg = override(cfg, "data.test", [])
    cfg["_config_path"] = str(exp / "config.yaml")
    return Solver(cfg)


def _manual_steps(solver, n):
    """Run n steps through the solver's own loader + jitted step."""
    loader = solver._train_loader(int(solver.state.step) - 1)
    it = iter(loader)
    for _ in range(n):
        batch = solver._shard(next(it))
        solver.state, _ = solver._train_step(solver.state, batch)


def test_resume_matches_straight_run(tmp_path):
    from declip_tpu.checkpoint import save_checkpoint

    # A: 6 straight steps
    a = _make_solver(tmp_path / "straight")
    _manual_steps(a, MAX_ITER)

    # B: 3 steps, checkpoint, fresh solver auto-resumes, 3 more
    b1 = _make_solver(tmp_path / "resume")
    _manual_steps(b1, 3)
    save_checkpoint(b1.path.ckpt_path, b1.state, save_many=True)
    b2 = _make_solver(tmp_path / "resume")
    assert b2.start_step == 3
    _manual_steps(b2, MAX_ITER - 3)

    pa = jax.device_get(a.state.params)
    pb = jax.device_get(b2.state.params)
    for (ka, va), (kb, vb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(pa), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(pb), key=str),
    ):
        np.testing.assert_allclose(va, vb, rtol=1e-6, atol=1e-7,
                                   err_msg=str(ka))


def test_async_save_restores_identically(tmp_path):
    """async_write saves land the identical bytes (writer thread does
    serialization; wait_for_pending_saves drains before a read)."""
    from declip_tpu.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
        wait_for_pending_saves,
    )

    s = _make_solver(tmp_path / "asave")
    _manual_steps(s, 2)
    p_sync = save_checkpoint(str(tmp_path / "sync"), s.state)
    p_async = save_checkpoint(str(tmp_path / "async"), s.state,
                              async_write=True)
    wait_for_pending_saves()
    with open(p_sync, "rb") as f1, open(p_async, "rb") as f2:
        assert f1.read() == f2.read()
    template = jax.device_get(s.state)
    restored = restore_checkpoint(p_async, template)
    for a, b in zip(jax.tree.leaves(template), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
