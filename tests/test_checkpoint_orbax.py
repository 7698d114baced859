"""Orbax backend coverage (VERDICT r3 #4): the msgpack paths' test parity.

saver.backend: orbax is wired through periodic save, final save, auto-resume
and the preemption path (solver/__init__.py); these tests give it the same
coverage the msgpack backend has: raw round-trip, keep/GC behavior,
solver train -> auto-resume, and the preemption save."""

import os
import shutil
import threading

import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

CONFIG_SRC = os.path.join(
    os.path.dirname(__file__), "..", "experiments", "unit", "tiny_clip",
    "config.yaml",
)


def _reset_manager():
    """The module caches one CheckpointManager per directory; drop it so
    every test gets a fresh manager for its own tmp dir."""
    import declip_tpu.checkpoint as ckpt

    if ckpt._orbax_mgr is not None:
        ckpt._orbax_mgr.wait_until_finished()
        ckpt._orbax_mgr.close()
        ckpt._orbax_mgr = None


@pytest.fixture(autouse=True)
def fresh_manager():
    _reset_manager()
    yield
    _reset_manager()


def _tiny_state(step=0, fill=0.0):
    from declip_tpu.train import new_train_state

    params = {"w": jnp.full((2, 3), fill, jnp.float32),
              "logit_scale": jnp.ones((1,))}
    return new_train_state(
        params=params, batch_stats={"bn": {"mean": jnp.zeros((3,))}},
        opt_state=(), step=jnp.asarray(step))


def test_orbax_save_restore_roundtrip(tmp_path):
    from declip_tpu.checkpoint import (
        restore_checkpoint_orbax,
        save_checkpoint_orbax,
        wait_for_orbax,
    )

    d = str(tmp_path / "orbax_ck")
    assert restore_checkpoint_orbax(d, _tiny_state()) is None

    save_checkpoint_orbax(d, _tiny_state(step=3, fill=7.0))
    save_checkpoint_orbax(d, _tiny_state(step=6, fill=9.0))
    wait_for_orbax()

    latest = restore_checkpoint_orbax(d, _tiny_state())
    assert int(latest.step) == 6
    np.testing.assert_allclose(np.asarray(latest.params["w"]), 9.0)
    np.testing.assert_allclose(
        np.asarray(latest.batch_stats["bn"]["mean"]), 0.0)

    older = restore_checkpoint_orbax(d, _tiny_state(), step=3)
    assert int(older.step) == 3
    np.testing.assert_allclose(np.asarray(older.params["w"]), 7.0)


def test_orbax_keep_gc(tmp_path):
    from declip_tpu.checkpoint import (
        _orbax_manager,
        save_checkpoint_orbax,
        wait_for_orbax,
    )

    d = str(tmp_path / "orbax_keep")
    for s in range(1, 6):
        save_checkpoint_orbax(d, _tiny_state(step=s), keep=2)
    wait_for_orbax()
    mgr = _orbax_manager(d, keep=2)
    assert mgr.latest_step() == 5
    assert sorted(mgr.all_steps()) == [4, 5]


def test_orbax_same_step_resave_is_safe(tmp_path):
    """The solver saves at every save_freq boundary AND once at train end —
    the final step can hit both (max_iter % save_freq == 0). A duplicate
    step must not raise."""
    from declip_tpu.checkpoint import save_checkpoint_orbax, wait_for_orbax

    d = str(tmp_path / "orbax_dup")
    save_checkpoint_orbax(d, _tiny_state(step=4, fill=1.0))
    save_checkpoint_orbax(d, _tiny_state(step=4, fill=1.0))
    wait_for_orbax()


@pytest.fixture
def exp_dir(tmp_path):
    shutil.copy(CONFIG_SRC, tmp_path / "config.yaml")
    return tmp_path


def test_orbax_solver_train_and_auto_resume(exp_dir):
    from declip_tpu.config import override, parse_config
    from declip_tpu.solver import Solver

    cfg = parse_config(str(exp_dir / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 8)
    cfg = override(cfg, "saver.save_freq", 4)
    cfg = override(cfg, "saver.print_freq", 4)
    cfg = override(cfg, "saver.backend", "orbax")
    cfg["_config_path"] = str(exp_dir / "config.yaml")

    solver = Solver(cfg)
    solver.train()

    # orbax step dirs written where msgpack files would have gone
    entries = os.listdir(exp_dir / "checkpoints")
    assert "8" in entries, entries

    solver2 = Solver(cfg)
    assert solver2.start_step == 8
    # the restored state actually carries the trained params (not template)
    assert int(solver2.state.step) == 8


def test_orbax_preemption_saves_and_resumes(exp_dir):
    from declip_tpu.config import override, parse_config
    from declip_tpu.solver import Solver

    cfg = parse_config(str(exp_dir / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 500)
    cfg = override(cfg, "saver.save_freq", 1000)  # only the preempt save
    cfg = override(cfg, "saver.print_freq", 1)
    cfg = override(cfg, "saver.backend", "orbax")
    cfg["_config_path"] = str(exp_dir / "config.yaml")

    solver = Solver(cfg)

    def set_flag_once_running():
        import time

        while getattr(solver, "_preempt", None) is None:
            time.sleep(0.01)
        solver._preempt.set()

    thr = threading.Thread(target=set_flag_once_running, daemon=True)
    thr.start()
    solver.train()
    thr.join(5)

    solver2 = Solver(cfg)
    assert 0 < solver2.start_step < 500
