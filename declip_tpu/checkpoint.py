"""Checkpoint save/restore + reference-format conversion hooks.

Rebuilds the reference's single-file torch.save checkpointing
(declip_solver.py:796-815: ``{model, optimizer, last_iter[, ema]}`` written
by rank 0 every save_freq, long-horizon copies every 20x into
checkpoints_k_times/, auto-resume from the newest file,
clip_solver.py:128-176).

Format: flax.serialization msgpack of the TrainState pytree plus a small
JSON sidecar of metadata. The torch ``.pth.tar`` converter lives in
declip_tpu/convert_pth.py.

Storage: plain paths hit the local filesystem with atomic tmp+rename writes;
any ``scheme://`` path (``gs://...``) routes through fsspec, where object
uploads are already atomic-on-commit — TPU pods have GCS, not the shared
cluster FS the reference assumed (declip_solver.py:796-815), so
``saver.save_path: gs://bucket/run`` works end to end (save, auto-resume,
k_times archives, GC, pretrain load).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


CKPT_RE = re.compile(r"ckpt_(\d+)\.msgpack$")


def _fs_for(path: str):
    """(fsspec filesystem, stripped path) for ``scheme://`` URLs, or
    (None, path) for local filesystem paths."""
    if "://" in str(path):
        from fsspec.core import url_to_fs

        return url_to_fs(str(path))
    return None, str(path)


def _join(dir_path: str, name: str) -> str:
    return dir_path.rstrip("/") + "/" + name if "://" in str(dir_path) \
        else os.path.join(dir_path, name)


def _write_bytes(path: str, blob: bytes) -> None:
    fs, p = _fs_for(path)
    if fs is None:
        with open(p + ".tmp", "wb") as f:
            f.write(blob)
        os.replace(p + ".tmp", p)  # readers never see a partial file
    else:
        # object stores commit atomically on close; no tmp+rename needed
        # (GCS has no rename)
        with fs.open(p, "wb") as f:
            f.write(blob)


def _open_read(path: str):
    fs, p = _fs_for(path)
    return open(p, "rb") if fs is None else fs.open(p, "rb")


def _ensure_dir(path: str) -> None:
    fs, p = _fs_for(path)
    if fs is None:
        os.makedirs(p, exist_ok=True)
    else:
        try:
            fs.makedirs(p, exist_ok=True)
        except Exception:
            pass  # bucket stores have no directories


def _mtime(fs, path: str) -> float:
    try:
        return fs.modified(path).timestamp()
    except Exception:
        return 0.0

# single-worker writer so async saves serialize + land in submission order.
# Device ops (device_get) stay on the CALLER's thread — background-thread
# device transfers deadlock some remote-execution clients (CLAUDE.md).
_writer = None
_pending: list = []


def _get_writer():
    global _writer
    if _writer is None:
        from concurrent.futures import ThreadPoolExecutor

        _writer = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer")
    return _writer


def wait_for_pending_saves() -> None:
    """Block until every async save has hit disk (call before reading a
    just-written checkpoint, at rollback, and at train end)."""
    global _pending
    for f in _pending:
        f.result()
    _pending = []


def _write_state(host_state, step: int, path: str, ckpt_dir: str,
                 k_times_dir: Optional[str], meta: Optional[dict]) -> str:
    blob = serialization.to_bytes(host_state)
    _write_bytes(path, blob)
    meta_path = _join(ckpt_dir, "ckpt_meta.json")
    _write_bytes(meta_path,
                 json.dumps({"last_iter": step, "path": path,
                             **(meta or {})}).encode())
    if k_times_dir is not None:
        _ensure_dir(k_times_dir)
        _write_bytes(_join(k_times_dir, f"ckpt_{step}.msgpack"), blob)
    return path


def load_checkpoint_meta(ckpt_dir: str) -> dict:
    """The ckpt_meta.json sidecar ({} when absent/unreadable). Carries the
    saving run's topology (world_size/host_batch/global_batch) for
    world-size-elastic resume."""
    try:
        fs, d = _fs_for(ckpt_dir)
        meta_path = _join(ckpt_dir, "ckpt_meta.json")
        if fs is None:
            with open(meta_path) as f:
                return json.load(f)
        with fs.open(meta_path) as f:
            return json.load(f)
    except Exception:  # noqa: BLE001 — older/foreign ckpt dirs have no meta
        return {}


def save_checkpoint(ckpt_dir: str, state, *, save_many: bool = False,
                    k_times_dir: Optional[str] = None,
                    async_write: bool = False,
                    meta: Optional[dict] = None) -> str:
    """Host-side save (call on process 0). Returns the written path.

    ``async_write=True`` overlaps the msgpack serialization + file write
    (seconds for GB-scale states) with training on a single writer thread;
    the device->host transfer still happens here, synchronously, so the
    donated train state can't be mutated under the writer."""
    _ensure_dir(ckpt_dir)
    step = int(state.step)
    host_state = jax.device_get(state)
    name = f"ckpt_{step}.msgpack" if save_many else "ckpt.msgpack"
    path = _join(ckpt_dir, name)
    if async_write:
        _pending.append(_get_writer().submit(
            _write_state, host_state, step, path, ckpt_dir, k_times_dir,
            meta))
        return path
    return _write_state(host_state, step, path, ckpt_dir, k_times_dir, meta)


def find_last_checkpoint(ckpt_dir: str) -> Optional[str]:
    """The NEWEST checkpoint among ckpt.msgpack and ckpt_<iter>.msgpack
    (clip_solver.py:167-176). Chosen by mtime so a stale plain file (from a
    save_many: False phase) never shadows newer step-named saves."""
    fs, d = _fs_for(ckpt_dir)
    candidates = []
    if fs is None:
        plain = os.path.join(d, "ckpt.msgpack")
        if os.path.exists(plain):
            candidates.append((os.path.getmtime(plain), 0, plain))
        for p in glob.glob(os.path.join(d, "ckpt_*.msgpack")):
            m = CKPT_RE.search(p)
            if m:
                candidates.append((os.path.getmtime(p), int(m.group(1)), p))
        if not candidates:
            return None
        return max(candidates)[2]
    plain = d.rstrip("/") + "/ckpt.msgpack"
    if fs.exists(plain):
        candidates.append((_mtime(fs, plain), 0, plain))
    for p in fs.glob(d.rstrip("/") + "/ckpt_*.msgpack"):
        m = CKPT_RE.search(p)
        if m:
            # step is the mtime tiebreak: some object stores don't expose
            # modified() through fsspec (then all mtimes are 0.0)
            candidates.append((_mtime(fs, p), int(m.group(1)), p))
    if not candidates:
        return None
    return fs.unstrip_protocol(max(candidates)[2])


def list_checkpoints(ckpt_dir: str):
    """(step, path) ascending."""
    fs, d = _fs_for(ckpt_dir)
    out = []
    if fs is None:
        for p in glob.glob(os.path.join(d, "ckpt_*.msgpack")):
            m = CKPT_RE.search(p)
            if m:
                out.append((int(m.group(1)), p))
        return sorted(out)
    for p in fs.glob(d.rstrip("/") + "/ckpt_*.msgpack"):
        m = CKPT_RE.search(p)
        if m:
            out.append((int(m.group(1)), fs.unstrip_protocol(p)))
    return sorted(out)


def gc_checkpoints(ckpt_dir: str, keep: int = 10) -> None:
    """Old-ckpt GC (declip_solver.py:570-576)."""
    ckpts = list_checkpoints(ckpt_dir)
    for _, p in ckpts[:-keep]:
        fs, sp = _fs_for(p)
        try:
            os.remove(sp) if fs is None else fs.rm(sp)
        except (OSError, FileNotFoundError):
            pass


def restore_checkpoint(path: str, target):
    """Restore into a template TrainState (shapes/dtypes from target)."""
    with _open_read(path) as f:
        blob = f.read()
    return serialization.from_bytes(target, blob)


def _graft(dst, src, ignore, prefix, unmatched):
    """Copy leaves from src into the dst template where the path exists and
    the shape matches (strict=False load, misc.py:441-455); record everything
    else in ``unmatched`` and keep dst's freshly-initialized value."""
    import jax.numpy as jnp

    if not isinstance(dst, dict):
        key = "/".join(prefix)
        # component-boundary match: "text" ignores text/* but NOT
        # text_label_predictor/*
        if any(key == ig or key.startswith(ig + "/") for ig in ignore):
            return dst
        if src is None or isinstance(src, dict) or \
                np.shape(src) != np.shape(dst):
            unmatched.append(key)
            return dst
        return jnp.asarray(src, dtype=getattr(dst, "dtype", None))
    out = {}
    for k, v in dst.items():
        sub = src.get(k) if isinstance(src, dict) else None
        out[k] = _graft(v, sub, ignore, prefix + (k,), unmatched)
    return out


def load_pretrain(path: str, state, ignore=()):
    """Load MODEL weights only (params + batch_stats) from a checkpoint into
    a fresh TrainState, keeping the new optimizer state / step / EMA.

    The TPU equivalent of the reference's pretrain flow: ``modify_state``
    drops optimizer/ema/last_iter and named keys (misc.py:466-479), then
    ``load_state_model`` grafts strict=False (clip_solver.py:140-163).
    ``ignore``: param-path prefixes (e.g. ``"text"``) kept at their fresh
    initialization. Accepts our msgpack states or reference ``.pth(.tar)``
    files (converted via convert_pth). Returns ``(state, unmatched_keys)``.
    """
    if path.endswith((".pth", ".pth.tar", ".pt")):
        from declip_tpu.convert_pth import load_pth

        raw = load_pth(path)
    else:
        with _open_read(path) as f:
            raw = serialization.msgpack_restore(f.read())
    unmatched: list = []
    params = _graft(jax.device_get(state.params), raw.get("params") or {},
                    tuple(ignore), (), unmatched)
    stats = state.batch_stats
    if stats is not None:
        stats = _graft(jax.device_get(stats), raw.get("batch_stats") or {},
                       tuple(ignore), (), unmatched)
    return state.replace(params=params, batch_stats=stats), unmatched


# --------------------------------------------------------------------------
# Orbax backend (optional): async, multi-host-aware, sharded saves for
# production-scale runs. The msgpack path above remains the default (single
# file, torch-convertible layout); select with saver.backend: orbax.
# --------------------------------------------------------------------------

_orbax_mgr = None


def _orbax_manager(ckpt_dir: str, keep: int = 10):
    global _orbax_mgr
    import orbax.checkpoint as ocp

    # gs:// (or any URL) paths go to orbax/tensorstore verbatim — only
    # local paths get absolutized
    ckpt_dir = ckpt_dir if "://" in str(ckpt_dir) else os.path.abspath(
        ckpt_dir)
    if _orbax_mgr is None or str(_orbax_mgr.directory) != str(ckpt_dir):
        if _orbax_mgr is not None:
            _orbax_mgr.wait_until_finished()
            _orbax_mgr.close()
        _orbax_mgr = ocp.CheckpointManager(
            ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True
            ),
        )
    return _orbax_mgr


def save_checkpoint_orbax(ckpt_dir: str, state, *, keep: int = 10) -> None:
    """Async sharded save; returns immediately, the write happens in the
    background (waits for any previous save first)."""
    import orbax.checkpoint as ocp

    mgr = _orbax_manager(ckpt_dir, keep=keep)
    mgr.save(int(state.step), args=ocp.args.StandardSave(state))


def restore_checkpoint_orbax(ckpt_dir: str, target, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    mgr = _orbax_manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore(target))


def wait_for_orbax() -> None:
    if _orbax_mgr is not None:
        _orbax_mgr.wait_until_finished()
