"""Pod-ready checkpoint storage: fsspec-routed gs:// paths (VERDICT r3 #3).

The reference assumed a shared cluster filesystem for rank-0 saves
(declip_solver.py:796-815); TPU pods have object storage. checkpoint.py
routes any ``scheme://`` path through fsspec, so ``saver.save_path:
gs://bucket/run`` works for save / auto-resume / k_times archives / GC /
pretrain loads. Tests use fsspec's in-memory filesystem — registered under
the ``gs`` protocol for the solver-level test (same injected-client spirit
as the GCS dataset tests)."""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CONFIG_SRC = os.path.join(
    os.path.dirname(__file__), "..", "experiments", "unit", "tiny_clip",
    "config.yaml",
)


def _clear_memory_fs():
    from fsspec.implementations.memory import MemoryFileSystem

    MemoryFileSystem.store.clear()
    MemoryFileSystem.pseudo_dirs = [""]


@pytest.fixture(autouse=True)
def memory_fs():
    _clear_memory_fs()
    yield
    _clear_memory_fs()


def _tiny_state():
    from declip_tpu.train import new_train_state

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "logit_scale": jnp.ones((1,))}
    return new_train_state(params=params, batch_stats={}, opt_state=())


def test_remote_save_find_restore_roundtrip():
    from declip_tpu.checkpoint import (
        find_last_checkpoint,
        gc_checkpoints,
        list_checkpoints,
        restore_checkpoint,
        save_checkpoint,
    )

    d = "memory://bucket/run1/checkpoints"
    assert find_last_checkpoint(d) is None

    state = _tiny_state()
    for step in (2, 4, 6):
        s = state.replace(
            step=jnp.asarray(step),
            params={"w": state.params["w"] + step,
                    "logit_scale": state.params["logit_scale"]})
        path = save_checkpoint(d, s, save_many=True,
                               k_times_dir=d + "_k_times")
        assert path.startswith("memory://") or path.startswith("/")

    assert [s for s, _ in list_checkpoints(d)] == [2, 4, 6]
    last = find_last_checkpoint(d)
    assert "ckpt_6.msgpack" in last
    restored = restore_checkpoint(last, _tiny_state())
    assert int(restored.step) == 6
    np.testing.assert_allclose(
        np.asarray(restored.params["w"]),
        np.arange(6, dtype=np.float32).reshape(2, 3) + 6)

    # k_times archive copies landed remotely too
    assert [s for s, _ in list_checkpoints(d + "_k_times")] == [2, 4, 6]

    gc_checkpoints(d, keep=1)
    assert [s for s, _ in list_checkpoints(d)] == [6]


def test_remote_find_prefers_newest_plain_file():
    from declip_tpu.checkpoint import find_last_checkpoint, save_checkpoint

    d = "memory://bucket/run2/ck"
    state = _tiny_state()
    save_checkpoint(d, state.replace(step=jnp.asarray(3)), save_many=True)
    save_checkpoint(d, state.replace(step=jnp.asarray(9)), save_many=False)
    assert find_last_checkpoint(d).endswith("ckpt.msgpack")


def test_remote_load_pretrain():
    from declip_tpu.checkpoint import load_pretrain, save_checkpoint

    d = "memory://bucket/run3/ck"
    donor = _tiny_state().replace(
        params={"w": jnp.full((2, 3), 7.0), "logit_scale": jnp.ones((1,))})
    path = save_checkpoint(d, donor)
    fresh = _tiny_state()
    loaded, unmatched = load_pretrain(path, fresh)
    assert unmatched == []
    np.testing.assert_allclose(np.asarray(loaded.params["w"]), 7.0)
    assert int(loaded.step) == 0  # model weights only


class _FakeGCS:
    """Registered lazily inside the test (subclassing at import time would
    import fsspec for every collected test)."""


def _register_fake_gcs():
    import fsspec
    from fsspec.implementations.memory import MemoryFileSystem

    class FakeGCS(MemoryFileSystem):
        protocol = "gs"
        cachable = False

        @classmethod
        def _strip_protocol(cls, path):
            path = str(path)
            if path.startswith("gs://"):
                path = "/" + path[len("gs://"):]
            return super()._strip_protocol(path)

    fsspec.register_implementation("gs", FakeGCS, clobber=True)
    return FakeGCS


def test_solver_trains_and_resumes_with_gs_save_path(tmp_path):
    """saver.save_path: gs://... — train writes checkpoints to the (fake)
    bucket, auto-resume restores from it, nothing checkpoint-shaped lands
    next to the config."""
    _register_fake_gcs()
    from declip_tpu.config import override, parse_config
    from declip_tpu.solver import Solver

    shutil.copy(CONFIG_SRC, tmp_path / "config.yaml")
    cfg = parse_config(str(tmp_path / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 4)
    cfg = override(cfg, "saver.save_freq", 2)
    cfg = override(cfg, "saver.print_freq", 2)
    cfg = override(cfg, "saver.save_path", "gs://ckpt-bucket/exp1/ck")
    cfg = override(cfg, "saver.async_save", False)
    cfg["_config_path"] = str(tmp_path / "config.yaml")

    solver = Solver(cfg)
    assert solver.path.ckpt_path == "gs://ckpt-bucket/exp1/ck"
    solver.train()

    from declip_tpu.checkpoint import find_last_checkpoint, list_checkpoints

    steps = [s for s, _ in list_checkpoints("gs://ckpt-bucket/exp1/ck")]
    assert 4 in steps
    assert find_last_checkpoint("gs://ckpt-bucket/exp1/ck").startswith("gs://")
    assert not (tmp_path / "checkpoints").exists()

    solver2 = Solver(cfg)
    assert solver2.start_step == 4
