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


def test_preemption_guard_signal_sets_flag(exp_dir):
    """SIGTERM inside the guard sets the flag without killing the process."""
    import signal
    import threading

    from declip_tpu.config import override, parse_config
    from declip_tpu.solver import Solver

    cfg = parse_config(str(exp_dir / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 2)
    cfg["_config_path"] = str(exp_dir / "config.yaml")
    solver = Solver(cfg)

    if threading.current_thread() is not threading.main_thread():
        import pytest

        pytest.skip("signal handlers require the main thread")
    prev = signal.getsignal(signal.SIGTERM)
    with solver._preemption_guard() as ev:
        assert not ev.is_set()
        os.kill(os.getpid(), signal.SIGTERM)
        assert ev.wait(10), "SIGTERM did not set the preemption flag"
    # previous handler restored on exit
    assert signal.getsignal(signal.SIGTERM) is prev


def test_preemption_saves_and_resumes(exp_dir):
    """A preemption flag mid-run cuts a checkpoint at the next step boundary;
    auto_resume continues from it. Eval is skipped (the grace window is for
    IO)."""
    import threading

    from declip_tpu.config import override, parse_config
    from declip_tpu.solver import Solver

    cfg = parse_config(str(exp_dir / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 500)
    cfg = override(cfg, "saver.save_freq", 1000)  # only the preempt save
    cfg = override(cfg, "saver.print_freq", 1)
    cfg["_config_path"] = str(exp_dir / "config.yaml")

    solver = Solver(cfg)

    def set_flag_once_running():
        import time

        while getattr(solver, "_preempt", None) is None:
            time.sleep(0.01)
        solver._preempt.set()  # deterministic stand-in for the signal

    thr = threading.Thread(target=set_flag_once_running, daemon=True)
    thr.start()
    solver.train()
    thr.join(5)

    # stopped early, final checkpoint written, eval skipped
    ckpts = [c for c in os.listdir(exp_dir / "checkpoints")
             if c.startswith("ckpt_")]
    assert ckpts, "preemption wrote no checkpoint"
    assert not (exp_dir / "results" / "results.txt.rank0").exists()

    solver2 = Solver(cfg)
    assert 0 < solver2.start_step < 500
