"""Config-driven training/eval solver.

One generic Solver replaces the reference's five ~90%-duplicated per-method
ClsSolver classes (prototype/solver/{clip,slip,filip,declip,defilip}_solver.py)
— the method is inferred from the model type and dispatched inside the jitted
train step (declip_tpu/train). Preserved reference contracts:

- experiment-dir layout: checkpoints/ events/ results/ next to config.yaml
  (clip_solver.py:110-117);
- CLI: ``python -m declip_tpu.solver --config config.yaml [--evaluate]``
  (clip_solver.py:740-768);
- saver semantics: auto_resume from newest ckpt, save every save_freq,
  long-horizon copies every 20x save_freq (declip_solver.py:796-815);
- zero-shot protocol: per-class prompt-ensemble text embeddings, image@class
  logits, softmax x ensemble matrix, per-rank JSONL dump -> merge -> top-k
  (clip_solver.py:675-737); FILIP dense late-interaction eval
  (filip_solver.py:839-960);
- loss-spike/NaN auto-rollback: reload an old checkpoint, decay warmup_lr by
  0.997, rebuild optimizer+schedule (declip_solver.py:548-619);
- EMA evaluation swap (declip_solver.py:778-787).

TPU structure: a single jitted train step over a data-axis Mesh; the host
loop only feeds sharded batches and reads back metric scalars.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import os.path as osp
import signal
import threading
import time
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from declip_tpu.checkpoint import (
    find_last_checkpoint,
    gc_checkpoints,
    list_checkpoints,
    restore_checkpoint,
    save_checkpoint,
    wait_for_pending_saves,
)
from declip_tpu.config import Cfg, parse_config
from declip_tpu.data.dataloader import (
    ClipDataLoader,
    build_clip_dataloader,
    build_clip_dataset,
)
from declip_tpu.data.evaluator import ImageNetEvaluator, Metric
from declip_tpu.data.sampler import compute_total_iter
from declip_tpu.models import model_entry
from declip_tpu.models.clip_model import l2_normalize
from declip_tpu.models.memory_bank import init_bank
from declip_tpu.optim import optim_entry, scheduler_entry
from declip_tpu.optim.param_groups import path_prefix_mask
from declip_tpu.ops.filip_ops import late_interaction_logits
from declip_tpu.parallel import make_mesh, maybe_initialize_distributed, shard_batch
from declip_tpu.tokenizer import get_tokenizer
from declip_tpu.train import (
    EmaConfig,
    TrainState,
    init_ema,
    make_train_step,
    method_of,
    new_train_state,
)
from declip_tpu.utils import AverageMeter, MeterGroup, ScalarWriter, create_logger


def _enable_compile_cache():
    """Persistent XLA compile cache — first-run compiles of the big train
    steps take minutes (especially through remote-compile tunnels); every
    later solver start is then instant. CPU entries are machine-scoped
    (declip_tpu/utils/compile_cache.py — foreign-host CPU AOT entries can
    SIGILL)."""
    try:
        from declip_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
    except Exception:
        pass


def make_class_embed_fn(apply_fn, prompts_num: int, classes_per_call: int):
    """Jitted [cpc*P, L] token chunk -> [cpc, ...] normalized class embeds.

    apply_fn(params, ids) returns raw text embeddings ([rows, D] pooled or
    [rows, Ltok, D] dense). The reduction reproduces the reference per-class
    math exactly (clip_solver.py:688-700 / filip_solver.py:845-860):
    L2-normalize each prompt embedding, mean over the class's prompts,
    L2-normalize the mean."""

    def fn(params, chunk_ids):
        emb = apply_fn(params, chunk_ids)
        emb = l2_normalize(emb)
        emb = emb.reshape((classes_per_call, prompts_num) + emb.shape[1:])
        return l2_normalize(emb.mean(axis=1))

    return jax.jit(fn)


def batched_class_embeddings(embed_fn, params, ids, n_class: int,
                             prompts_num: int, classes_per_call: int):
    """Drive a make_class_embed_fn over all classes; the tail chunk is padded
    with copies of the last class so every dispatch shares one static shape
    (single compile)."""
    ids = np.asarray(ids)
    out = []
    for beg in range(0, n_class, classes_per_call):
        cls = min(classes_per_call, n_class - beg)
        chunk = ids[beg * prompts_num:(beg + cls) * prompts_num]
        if cls < classes_per_call:
            pad = np.tile(chunk[-prompts_num:], (classes_per_call - cls, 1))
            chunk = np.concatenate([chunk, pad])
        out.append(np.asarray(embed_fn(params, jnp.asarray(chunk)))[:cls])
    return jnp.asarray(np.concatenate(out))


class Solver:
    def __init__(self, config, *, devices=None):
        if isinstance(config, str):
            config = parse_config(config)
        self.config = config
        from declip_tpu.parallel.mesh import apply_platform_override

        apply_platform_override()  # before anything initializes a backend
        _enable_compile_cache()
        maybe_initialize_distributed()
        self.rank = jax.process_index()
        self.world = jax.process_count()
        self.setup_env()
        # parallelism: {tp: N} builds a 2-D [data, model] mesh for
        # Megatron-style tensor parallelism (parallel/tp.py)
        pcfg = self.config.get("parallelism") or {}
        tp = int(pcfg.get("tp", 1) or 1)
        pp = int(pcfg.get("pp", 1) or 1)
        ep = int(pcfg.get("ep", 1) or 1)
        # parallelism: {slices: N} — multi-slice data parallelism over a
        # hybrid [dcn, data, ...] mesh: batch over BOTH axes, gradient
        # reductions decomposed by GSPMD into intra-slice ICI + inter-slice
        # DCN phases, FSDP/TP placements kept inside one slice's ICI domain
        slices = int(pcfg.get("slices", 1) or 1)
        self.mesh = make_mesh(devices, tp=tp, pp=pp, ep=ep, slices=slices)
        if tp > 1 or ep > 1 or pcfg.get("fsdp") \
                or int(self.mesh.devices.size) > 1:
            # in-model activation constraints (parallel/tp.py): pin the
            # TP head/hidden splits, and under FSDP stop ZeRO-3 weight
            # shards from leaking contraction-axis shardings into the
            # attention remat body (involuntary full rematerialization).
            # Installed for plain multi-device DP too (model_axis=None: the
            # DATA pins match what GSPMD infers anyway) so mesh-aware ops —
            # the Pallas attention shard_map dispatch (ops/attention.py
            # _pallas_attention) — can see the mesh at trace time.
            from declip_tpu.parallel.mesh import batch_axes
            from declip_tpu.parallel.tp import set_activation_sharding

            daxes = batch_axes(self.mesh)
            set_activation_sharding(
                self.mesh,
                data_axis=daxes if len(daxes) > 1 else daxes[0],
                model_axis="model" if tp > 1 else None,
                seq=bool(pcfg.get("sp")) and tp > 1)
        if pp > 1:
            # pipeline parallelism (parallel/pp.py): transformer towers run
            # the GPipe shard_map schedule over the 'pipe' axis
            if pcfg.get("fsdp"):
                raise ValueError("parallelism: pp does not compose with "
                                 "fsdp yet — pick one")
            from declip_tpu.parallel.pp import set_pipeline_context

            set_pipeline_context(
                self.mesh, n_micro=int(pcfg.get("microbatches", 4 * pp)))
        self.n_devices = int(self.mesh.devices.size)
        # data-parallel ways: batch is sharded over 'data' and replicated
        # over 'model'/'pipe', so all batch math scales by data ways, not
        # chips. Under ep the batch shards over data x expert (full mesh),
        # so ep does NOT divide the data ways.
        self.data_ways = self.n_devices // (tp * pp)
        self.build_model()
        self.build_data()
        self.build_optimizer()
        self.init_state()
        self.build_step()

    # ------------------------------------------------------------------ env
    def setup_env(self):
        cfg_path = self.config.get("_config_path")
        base = osp.dirname(cfg_path) if cfg_path else os.getcwd()
        # saver.save_path overrides the checkpoint location; gs:// (any
        # fsspec URL) works — TPU pods have object storage, not the shared
        # cluster FS the reference assumed (declip_solver.py:796-815).
        # Events/results/logs stay next to the config (local, per-host).
        save_root = self.config.get_path("saver.save_path")
        if save_root:
            ckpt_path = str(save_root)
            ckpt_k = (ckpt_path.rstrip("/") + "_k_times" if "://" in ckpt_path
                      else osp.join(osp.dirname(ckpt_path.rstrip("/")),
                                    "checkpoints_k_times"))
        else:
            ckpt_path = osp.join(base, "checkpoints")
            ckpt_k = osp.join(base, "checkpoints_k_times")
        self.path = Cfg(
            root_path=base,
            ckpt_path=ckpt_path,
            ckpt_k_times_path=ckpt_k,
            event_path=osp.join(base, "events"),
            result_path=osp.join(base, "results"),
        )
        if self.rank == 0:
            from declip_tpu.checkpoint import _ensure_dir

            for p in (self.path.ckpt_path, self.path.event_path,
                      self.path.result_path):
                _ensure_dir(p)
        self.logger = create_logger(osp.join(base, "log.txt"))
        self.writer = ScalarWriter(self.path.event_path, enabled=self.rank == 0)
        self.meters = MeterGroup(length=int(
            self.config.get_path("saver.print_freq", 10)))

    # ---------------------------------------------------------------- model
    def build_model(self):
        mcfg = self.config.model
        kwargs = dict(mcfg.get("kwargs") or {})
        prec = self.config.get_path("precision.dtype", "bfloat16")
        kwargs["dtype"] = prec
        # BN grouping knobs (declip88m: use_sync_bn False / bn_group_size)
        # need the data-parallel world to resolve rank groups into batch
        # groups (clip_model.resolve_bn_stats_groups)
        ik = kwargs.get("image_encode")
        if isinstance(ik, dict) and (
                "use_sync_bn" in ik or "bn_group_size" in ik):
            ik = dict(ik)
            ik.setdefault("bn_world", self.data_ways)
            kwargs["image_encode"] = ik
        self.model = model_entry({"type": mcfg["type"], "kwargs": kwargs})
        self.method = method_of(self.model)
        self.logger.info(
            f"model={mcfg['type']} method={self.method} dtype={prec} "
            f"devices={jax.device_count()} hosts={self.world}"
        )

    # ----------------------------------------------------------------- data
    @staticmethod
    def normalize_data_config(dcfg: Dict) -> Dict:
        """Accept both the reference layout (batch_size/read_from at the
        data level, test entries nesting a second ``test`` dict —
        yfcc15m_r50_declip/config.yaml:81-131) and the flat layout."""
        dcfg = dict(dcfg or {})
        train = dict(dcfg.get("train") or {})
        for key in ("batch_size", "num_workers", "read_from", "input_size"):
            if key in dcfg and key not in train:
                train[key] = dcfg[key]
        tests = dcfg.get("test") or []
        if isinstance(tests, dict):
            tests = [tests]
        norm_tests = []
        for entry in tests:
            entry = dict(entry)
            inner = dict(entry.pop("test", {}) or {})
            merged = {**entry, **inner}
            norm_tests.append(merged)
        return {"train": train, "test": norm_tests}

    def build_data(self):
        dcfg = self.normalize_data_config(self.config.get("data") or {})
        train_cfg = dict(dcfg.get("train") or {})
        # pure-vision SSL methods need a two-view transform; STANDARD_CLIP's
        # single 3-channel view would leave the key branch a zero-channel
        # slice (the model also refuses <6 channels at trace time)
        default_aug = {"moco": "MOCOV2", "simclr": "SIMCLR",
                       "clsa": "CLSA"}.get(self.method, "STANDARD_CLIP")
        train_cfg.setdefault("transforms", {"type": default_aug})
        self.per_chip_batch = int(train_cfg.get("batch_size", 8))
        # reference batch_size is per-rank(=per-GPU); per-host loader batch =
        # per-chip x local chips, sharded over the mesh by the train step
        local_ways = self.data_ways // self.world
        self.host_batch = self.per_chip_batch * local_ways
        self.global_batch = self.per_chip_batch * self.data_ways

        # full config-driven dataset build (use_ranked, image_reader,
        # server_cfg, fseek — clip_dataloader.py:66-120)
        ds = build_clip_dataset(
            train_cfg, world_size=self.world, rank=self.rank)
        self.max_iter = compute_total_iter(
            {**train_cfg,
             **({"max_iter": self.config.get_path("lr_scheduler.kwargs.max_iter")}
                if self.config.get_path("lr_scheduler.kwargs.max_iter") else {})},
            len(ds), self.data_ways,
        )
        self.train_dataset = ds
        self.train_cfg = train_cfg
        views = {"clip": 1, "filip": 2, "slip": 3}.get(self.method, 2)
        tcfg = train_cfg["transforms"]
        aug_type = (tcfg.get("type", "STANDARD_CLIP")
                    if isinstance(tcfg, dict) else "STANDARD_CLIP")
        self.device_aug = (
            {"views": views, "preset": aug_type}
            if train_cfg.get("device_aug", False) else None
        )
        self.test_cfgs: List[Dict] = list(dcfg.get("test") or [])
        if isinstance(self.test_cfgs, dict):
            self.test_cfgs = [self.test_cfgs]

    def _ckpt_meta(self) -> dict:
        """Topology sidecar for world-size-elastic resume: what the sampler
        stream was laid out for when this checkpoint was written."""
        return {"world_size": self.world, "host_batch": self.host_batch,
                "global_batch": self.global_batch}

    def _train_loader(self, last_iter: int) -> ClipDataLoader:
        if self.device_aug is not None:
            # on-device pipeline: swap the dataset transform to geometry-only
            # uint8 crops; photometrics run inside the jitted step
            from declip_tpu.data.transforms import build_geometry_augmentation

            self.train_dataset.transform = build_geometry_augmentation(
                self.device_aug["preset"])
        split_cfg = dict(self.train_cfg)
        split_cfg["batch_size"] = self.host_batch  # per-host loader batch
        if getattr(self, "_elastic_orig", None):
            scfg = dict(split_cfg.get("sampler") or {})
            kw = dict(scfg.get("kwargs") or {})
            kw["orig_world_size"], kw["orig_batch_size"] = self._elastic_orig
            scfg["kwargs"] = kw
            split_cfg["sampler"] = scfg
        split_cfg.setdefault("seed", int(self.config.get_path("seed", 0)))
        # DeCLIP extras flow from the model config (declip.py:203-212)
        split_cfg["eda"] = bool(getattr(self.model, "EDA", False)) and \
            self.method in ("declip", "defilip")
        split_cfg["text_mask_type"] = getattr(
            self.model, "text_mask_type", None)
        return build_clip_dataloader(
            split_cfg, world_size=self.world, rank=self.rank,
            last_iter=last_iter, total_iter=self.max_iter,
            dataset=self.train_dataset,
        )

    # ------------------------------------------------------------ optimizer
    def build_optimizer(self):
        ocfg = dict(self.config.get("optimizer") or
                    {"type": "AdamW", "kwargs": {"lr": 1e-4}})
        scfg = dict(self.config.get("lr_scheduler") or
                    {"type": "Cosine",
                     "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                "warmup_steps": 0}})
        self._sched_cfg = scfg
        self._warmup_decay = 1.0
        iters_per_epoch = max(
            1, len(self.train_dataset) // max(self.global_batch, 1))
        self.schedule = scheduler_entry(
            scfg, max_iter=self.max_iter, iters_per_epoch=iters_per_epoch)
        self._opt_cfg = ocfg

    def _make_tx(self, params):
        frozen = None
        vis = getattr(self.model, "visual", None)
        frozen_paths = getattr(vis, "frozen_param_paths", lambda: ())()
        if frozen_paths:
            frozen = path_prefix_mask(params, tuple(frozen_paths))
        return optim_entry(
            self._opt_cfg, params, self.schedule,
            pconfig=self._opt_cfg.get("pconfig") or {},
            grad_clip=dict(self.config.get("grad_clip") or {}),
            frozen_mask=frozen,
        )

    # ---------------------------------------------------------------- state
    def _example_batch(self) -> Dict[str, jnp.ndarray]:
        n = self.global_batch
        views = {"clip": 1, "filip": 1, "slip": 3}.get(self.method, 2)
        if self.method in ("declip", "defilip"):
            views = 2
        res = getattr(self.model.visual, "input_resolution", 224)
        batch = {
            "images": jnp.zeros((n, res, res, 3 * views), jnp.float32),
            "tokens": jnp.ones((n, 77), jnp.int32),
        }
        if self.method in ("declip", "defilip"):
            batch["tokens_aug"] = batch["tokens"]
        if getattr(self.model, "text_mask_type", None) is not None:
            batch["mlm_tokens"] = batch["tokens"]
            batch["mlm_labels"] = jnp.full((n, 77), -100, jnp.int32)
        return batch

    def init_state(self):
        example = self._example_batch()
        with self.mesh:
            variables = jax.jit(
                lambda: self.model.init(jax.random.PRNGKey(0), example,
                                        train=True)
            )()
        from declip_tpu.models.hf_text import HFTextEncoder

        if isinstance(getattr(self.model, "text", None), HFTextEncoder):
            from declip_tpu.models.hf_text import load_pretrained_variables

            variables = load_pretrained_variables(self.model.text, variables)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.tx = self._make_tx(params)

        ema_cfg = None
        ema_params = None
        if self.config.get_path("ema.enable", False):
            kw = dict(self.config.get_path("ema.kwargs", {}) or {})
            kw.pop("model", None)
            ema_cfg = EmaConfig(
                decay=float(kw.get("decay", 0.999)),
                warmup=int(kw.get("warmup", 1)),
                inner_T=int(kw.get("inner_T", 1)),
                copy_init=bool(kw.get("copy_init", False)),
            )
            ema_params = init_ema(params, ema_cfg)
        self.ema_cfg = ema_cfg

        bank = None
        if getattr(self.model, "return_nn_bank", False):
            dim = self._feature_dim(params)
            bank = init_bank(
                jax.random.PRNGKey(1),
                int(getattr(self.model, "nn_size", 2 ** 16)),
                dim,
            )

        ssl = None
        if self.method in ("moco", "clsa"):
            from declip_tpu.models.ssl_builders import init_moco_state

            ssl = init_moco_state(
                params, jax.random.PRNGKey(2), int(self.model.K),
                int(self.model.dim), batch_stats)

        guard = dict(self.config.get("grad_clip") or {}).get(
            "type") == "logit_scale_param_ema"
        state = new_train_state(
            params=params, batch_stats=batch_stats,
            opt_state=self.tx.init(params), ema_params=ema_params,
            bank_text=bank, with_logit_guard=guard, ssl=ssl,
        )

        # auto-resume (clip_solver.py:128-139)
        self.start_step = 0
        if self.config.get_path("saver.pretrain.auto_resume", True):
            if self.config.get_path("saver.backend") == "orbax":
                from declip_tpu.checkpoint import restore_checkpoint_orbax

                restored = restore_checkpoint_orbax(self.path.ckpt_path, state)
                if restored is not None:
                    state = restored
                    self.start_step = int(state.step)
                    self.logger.info(
                        f"auto-resumed (orbax) at step {self.start_step}")
            else:
                last = find_last_checkpoint(self.path.ckpt_path)
                if last is not None:
                    state = restore_checkpoint(last, state)
                    self.start_step = int(state.step)
                    self.logger.info(
                        f"auto-resumed from {last} at step {self.start_step}")
        # world-size-elastic resume (beyond-reference; the reference's
        # sampler slabs are world-size-baked, sampler.py:57-106): when the
        # checkpoint was written on a DIFFERENT topology, reconstruct the
        # original run's global batch stream and re-shard it (data/sampler
        # orig_world_size/orig_batch_size) so the training trajectory is
        # identical to the uninterrupted run. Requires a conserved global
        # batch; preemption-tolerant pods shrink/grow hosts, not math.
        self._elastic_orig = None
        if self.start_step > 0:
            from declip_tpu.checkpoint import load_checkpoint_meta

            meta = load_checkpoint_meta(self.path.ckpt_path)
            ow = int(meta.get("world_size", self.world))
            ohb = int(meta.get("host_batch", self.host_batch))
            if (ow, ohb) != (self.world, self.host_batch):
                if ow * ohb != self.world * self.host_batch:
                    raise ValueError(
                        f"resuming a {ow}x{ohb} run on {self.world} host(s) "
                        f"x {self.host_batch} changes the global batch "
                        f"({ow * ohb} -> {self.world * self.host_batch}); "
                        "elastic resume conserves it — adjust batch_size")
                stype = dict(self.train_cfg.get("sampler") or {}).get(
                    "type", "distributed_iteration")
                if stype != "distributed_iteration":
                    raise ValueError(
                        "world-size-elastic resume supports sampler.type "
                        f"distributed_iteration only (got {stype})")
                self._elastic_orig = (ow, ohb)
                self.logger.info(
                    f"elastic resume: checkpoint topology {ow} host(s) x "
                    f"batch {ohb} -> {self.world} x {self.host_batch}; "
                    "re-sharding the original sampler stream")
        # pretrain weights (model only, fresh optimizer/step) when nothing
        # was resumed (clip_solver.py:140-163 + misc.py modify_state)
        pretrain_path = self.config.get_path("saver.pretrain.path")
        if self.start_step == 0 and pretrain_path:
            from declip_tpu.checkpoint import load_pretrain

            ignore = tuple(
                self.config.get_path("saver.pretrain.ignore") or ())
            state, unmatched = load_pretrain(
                pretrain_path, state, ignore=ignore)
            msg = f"loaded pretrain weights from {pretrain_path}"
            if unmatched:
                msg += (f" ({len(unmatched)} keys kept at init, e.g. "
                        f"{unmatched[:5]})")
            self.logger.info(msg)
        self.state = self._place_state(state)

    def _feature_dim(self, params) -> int:
        # joint embedding dim: the model's feature_dim field when set
        # (DECLIP/DEFILIP carry it), else the text projection output — which
        # HF text towers name differently, so probe both layouts
        dim = getattr(self.model, "feature_dim", None)
        if dim:
            return int(dim)
        text = params.get("text", {})
        if "text_projection" in text:
            return int(text["text_projection"]["kernel"].shape[-1])
        return int(getattr(self.model.text, "embed_dim"))

    def _replicated(self):
        from jax.sharding import NamedSharding, PartitionSpec

        return NamedSharding(self.mesh, PartitionSpec())

    def _place_state(self, state):
        """Replicated (reference DDP semantics), FSDP-sharded
        (``parallelism: {fsdp: true}`` — ZeRO-3 over the data axis,
        parallel/fsdp.py), tensor-parallel (``parallelism: {tp: N}`` —
        Megatron-style weight sharding over the model axis, parallel/tp.py),
        or both composed (``{tp: N, fsdp: true}`` — TP dims kept, largest
        free axis of every leaf additionally ZeRO-3-sharded over 'data')."""
        pcfg = self.config.get("parallelism") or {}
        if int(pcfg.get("pp", 1) or 1) > 1:
            from declip_tpu.parallel.pp import shard_train_state_pp

            return shard_train_state_pp(self.mesh, state)
        # ep routes through the same path-rule placement as tp: the moe
        # rules pin expert FFNs to 'expert', the model rules degrade to
        # replicated on a mesh without a 'model' axis (and vice versa)
        if (int(pcfg.get("tp", 1) or 1) > 1
                or int(pcfg.get("ep", 1) or 1) > 1):
            if pcfg.get("fsdp"):
                from declip_tpu.parallel.tp import shard_train_state_tp_fsdp

                return shard_train_state_tp_fsdp(self.mesh, state)
            from declip_tpu.parallel.tp import shard_train_state_tp

            return shard_train_state_tp(self.mesh, state)
        if pcfg.get("fsdp"):
            from declip_tpu.parallel.fsdp import shard_train_state

            return shard_train_state(self.mesh, state)
        return jax.device_put(state, self._replicated())

    # ----------------------------------------------------------------- step
    def build_step(self):
        step_fn = make_train_step(
            self.model, self.tx, self.config, self.schedule,
            method=self.method, ema_cfg=self.ema_cfg,
            total_steps=self.max_iter, device_aug=self.device_aug,
            mesh=self.mesh,
        )
        self._train_step = jax.jit(step_fn, donate_argnums=(0,))

    # ----------------------------------------------------------- preemption
    @contextlib.contextmanager
    def _preemption_guard(self):
        """Save-and-exit-clean on SIGTERM/SIGUSR1 (beyond-reference: the
        reference relied on SLURM requeue + auto_resume losing up to
        save_freq steps; TPU pods and GKE spot VMs send SIGTERM with a grace
        window, so the loop checks a flag each step and cuts a final
        checkpoint before the kill).

        The handler only sets an Event — all checkpoint IO happens on the
        main thread at a step boundary (device state is consistent there,
        and the axon client forbids device access from handlers/threads).
        With the orbax backend every rank must see the signal for the
        collective save; cluster managers signal the whole job, and the
        msgpack backend saves from rank 0 only, so either way no rank
        blocks. Non-main-thread callers (tests driving Solver from a
        worker) skip handler installation — signal.signal is main-thread
        only."""
        self._preempt = threading.Event()
        prev = {}
        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGUSR1):
                try:
                    prev[sig] = signal.signal(
                        sig, lambda *_: self._preempt.set())
                except (ValueError, OSError):  # pragma: no cover
                    pass
        try:
            yield self._preempt
        finally:
            for sig, handler in prev.items():
                signal.signal(sig, handler)

    # ---------------------------------------------------------------- train
    def train(self):
        with self._preemption_guard() as preempt:
            self._train_loop(preempt)

    def _train_loop(self, preempt):
        saver = self.config.get("saver") or {}
        print_freq = int(saver.get("print_freq", 10))
        val_freq = int(saver.get("val_freq", 0) or 0)
        save_freq = int(saver.get("save_freq", 0) or 0)
        save_many = bool(saver.get("save_many", True))

        prof = dict(self.config.get("profile") or {})
        prof_start = int(prof.get("start_step", 10))
        prof_steps = int(prof.get("num_steps", 5))
        prof_on = bool(prof.get("enable", False)) and self.rank == 0

        spike_window = AverageMeter(length=100)
        loader = self._train_loader(self.start_step - 1)
        it = self._device_prefetch(iter(loader))
        step = self.start_step
        t_last = time.time()
        while step < self.max_iter:
            try:
                batch = next(it)
            except StopIteration:
                break
            data_time = time.time() - t_last
            if prof_on and step + 1 == prof_start:
                # jax.profiler trace (SURVEY.md §5.1's TPU equivalent of the
                # reference's manual timing meters)
                jax.profiler.start_trace(
                    osp.join(self.path.event_path, "profile"))
            self.state, metrics = self._train_step(self.state, batch)
            # step is host-predictable — reading state.step here would force
            # a blocking device->host sync every iteration and stall async
            # dispatch (resynced only after rollback)
            step += 1
            if prof_on and step == prof_start + prof_steps:
                jax.tree.map(lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
                self.logger.info(
                    f"profile trace written to {self.path.event_path}/profile")
                prof_on = False

            if step % print_freq == 0 or step == self.max_iter:
                metrics = {k: float(v) for k, v in metrics.items()}
                loss = metrics.get("loss", float("nan"))
                # loss-spike / NaN rollback (declip_solver.py:548-619)
                if self._spike(loss, spike_window) and self._rollback(step):
                    step = int(self.state.step)  # resync host counter
                    loader = self._train_loader(step - 1)
                    it = self._device_prefetch(iter(loader))
                    t_last = time.time()
                    continue
                if np.isfinite(loss):  # a NaN would poison the window avg
                    spike_window.update(loss)
                batch_time = time.time() - t_last
                self.meters.update(
                    {**metrics, "batch_time": batch_time,
                     "data_time": data_time}
                )
                for k, v in metrics.items():
                    self.writer.add_scalar(k, v, step)
                pairs_per_sec = (
                    self.global_batch * print_freq / max(batch_time, 1e-9)
                    if step > self.start_step + print_freq else 0.0
                )
                remain = (self.max_iter - step) * self.meters[
                    "batch_time"].avg / max(print_freq, 1)
                self.logger.info(
                    f"Iter [{step}/{self.max_iter}] "
                    f"loss {loss:.4f} ({self.meters['loss'].avg:.4f}) "
                    f"lr {metrics.get('lr', 0):.2e} "
                    f"top1 {metrics.get('top1', 0):.2f} "
                    f"pairs/s {pairs_per_sec:.1f} "
                    f"eta {remain / 3600:.2f}h"
                )
                self.writer.flush()
                t_last = time.time()

            if val_freq and step % val_freq == 0 and step > 0:
                self.validate(step)
            if save_freq and step % save_freq == 0:
                keep = int(self.config.get_path("saver.keep", 10))
                if self.config.get_path("saver.backend") == "orbax":
                    # orbax sharded/async save is a cross-process collective
                    # — every rank must participate
                    from declip_tpu.checkpoint import save_checkpoint_orbax

                    save_checkpoint_orbax(self.path.ckpt_path, self.state,
                                          keep=keep)
                elif self.rank == 0:
                    k_dir = (self.path.ckpt_k_times_path
                             if step % (save_freq * 20) == 0 else None)
                    save_checkpoint(
                        self.path.ckpt_path, self.state,
                        save_many=save_many, k_times_dir=k_dir,
                        async_write=bool(self.config.get_path(
                            "saver.async_save", True)),
                        meta=self._ckpt_meta())
                    gc_checkpoints(self.path.ckpt_path, keep=keep)

            if preempt.is_set():
                self.logger.info(
                    f"Preemption signal received at iter {step} — writing "
                    "final checkpoint and exiting (auto_resume continues "
                    "from here)")
                break

        if self.config.get_path("saver.backend") == "orbax":
            from declip_tpu.checkpoint import (
                save_checkpoint_orbax,
                wait_for_orbax,
            )

            save_checkpoint_orbax(self.path.ckpt_path, self.state)
            wait_for_orbax()
        elif self.rank == 0:
            # drain in-flight async writes BEFORE the final synchronous save
            # (they share ckpt_meta.json; last writer must be the newest)
            wait_for_pending_saves()
            save_checkpoint(self.path.ckpt_path, self.state, save_many=True,
                            meta=self._ckpt_meta())
        if not preempt.is_set():  # the grace window is for IO, not eval
            self.validate(step)
        self.writer.close()

    def _shard(self, batch):
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        return shard_batch(self.mesh, arrays)

    def _device_prefetch(self, it, depth: int = 2):
        """Keep `depth` host batches staged ahead on a background thread and
        shard them to the device from the MAIN thread (the reference's
        DataPrefetcher role, clip_solver.py:30-61). device_put must stay on
        the main thread: remote-execution tunnels (axon) deadlock on
        concurrent transfers, and JAX's async dispatch already overlaps the
        main-thread transfer with device compute."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(1)
        buf = deque()

        def fetch():
            try:
                return next(it)
            except StopIteration:
                return None

        def fill():
            while len(buf) < depth:
                buf.append(pool.submit(fetch))

        fill()
        while buf:
            batch = buf.popleft().result()
            if batch is None:
                break
            fill()
            yield self._shard(batch)
        pool.shutdown(wait=False)

    def _spike(self, loss: float, window: AverageMeter) -> bool:
        if not np.isfinite(loss):
            return True
        thr = float(self.config.get_path("saver.spike_threshold", 10.0))
        return window.count > 20 and loss > window.avg + thr

    def _rollback(self, step: int) -> bool:
        """Reload an old checkpoint, decay warmup lr, rebuild optimizer
        (declip_solver.py:548-619). Returns True if a rollback happened."""
        if not bool(self.config.get_path("saver.rollback", False)):
            self.logger.warning(
                f"loss spike/NaN at step {step} (rollback disabled)")
            return False
        wait_for_pending_saves()  # in-flight async writes must land first
        ckpts = list_checkpoints(self.path.ckpt_path)
        if not ckpts:
            self.logger.warning("spike but no checkpoint to roll back to")
            return False
        # >= 3 save-points back from the newest (declip_solver.py:590-594);
        # clamp to the oldest when fewer exist
        target = ckpts[max(0, len(ckpts) - 4)]
        self.logger.warning(
            f"loss spike at {step}: rolling back to step {target[0]}, "
            f"warmup_lr x= 0.997"
        )
        self._warmup_decay *= 0.997
        scfg = dict(self._sched_cfg)
        kwargs = dict(scfg.get("kwargs") or {})
        kwargs["warmup_lr"] = float(kwargs.get("warmup_lr", 1e-3)) * \
            self._warmup_decay
        scfg["kwargs"] = kwargs
        self.schedule = scheduler_entry(scfg, max_iter=self.max_iter)
        template = jax.device_get(self.state)
        state = restore_checkpoint(target[1], template)
        # Default: keep the restored opt_state — it belongs to the good
        # checkpoint (moments healthy) and carries the schedule count for
        # that step. Re-initializing would silently replay the LR schedule
        # from 0. (Delta vs reference, which reloads only model state and
        # therefore must rebuild its optimizer, declip_solver.py:548-619.)
        self.tx = self._make_tx(state.params)
        if bool(self.config.get_path("saver.rollback_reset_opt", False)):
            # reference-exact mode (declip_solver.py:600-607): fresh
            # optimizer — Adam moments zeroed, bias correction restarted —
            # with the rebuilt schedule still evaluated at the restored
            # step (see optim.fast_forward_schedule). Parity-tested against
            # the reference loop in tests/test_rollback_parity.py.
            from declip_tpu.optim import fast_forward_schedule

            state = state.replace(opt_state=fast_forward_schedule(
                self.tx.init(state.params), int(state.step)))
        self.state = self._place_state(state)
        self.build_step()
        return True

    # ----------------------------------------------------------------- eval
    def _eval_loader(self, tcfg: Dict):
        split_cfg = dict(tcfg)
        split_cfg.setdefault("meta_file", "256")
        split_cfg.setdefault("label_texts_ensemble", "prompt80")
        ds = build_clip_dataset(split_cfg)
        return ds, int(tcfg.get("batch_size", self.host_batch))

    def validate(self, step: int):
        for i, tcfg in enumerate(self.test_cfgs):
            metrics = self.evaluate(tcfg)
            self.logger.info(
                f"eval[{i}] @ {step}: " + json.dumps(dict(metrics)))
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self.writer.add_scalar(f"eval{i}/{k}", v, step)
            if self.state.ema_params is not None:
                ema_metrics = self.evaluate(tcfg, use_ema=True)
                self.logger.info(
                    f"eval[{i}] EMA @ {step}: " + json.dumps(dict(ema_metrics)))
                for k, v in ema_metrics.items():
                    if isinstance(v, (int, float)):
                        self.writer.add_scalar(f"eval{i}/ema_{k}", v, step)

    def _encode_text_fn(self):
        # cached: fresh closures would defeat jax.jit's cache and re-trace
        # the tower on every validate() call
        if not hasattr(self, "_jit_encode_text"):
            def fn(params, tokens):
                return self.model.apply(
                    {"params": params}, tokens, method="encode_text")

            self._jit_encode_text = jax.jit(fn)
        return self._jit_encode_text

    def _encode_image_fn(self, batch_stats):
        if not hasattr(self, "_jit_encode_image"):
            def fn(params, batch_stats, images):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                return self.model.apply(
                    variables, images, train=False, method="encode_image")

            self._jit_encode_image = jax.jit(fn)
        jit_fn = self._jit_encode_image
        return lambda params, images: jit_fn(params, batch_stats, images)

    def _class_embed_fn(self, *, dense: bool, prompts_num: int,
                        classes_per_call: int):
        """Cached jitted chunk encoder for the two class-embedding flavors
        (fresh closures would defeat jax.jit's cache every validate())."""
        cache = getattr(self, "_class_emb_cache", None)
        if cache is None:
            cache = self._class_emb_cache = {}
        key = (dense, prompts_num, classes_per_call)
        if key not in cache:
            method = "encode_text_dense" if dense else "encode_text"

            def apply_fn(params, chunk_ids):
                return self.model.apply(
                    {"params": params}, chunk_ids, method=method)

            cache[key] = make_class_embed_fn(
                apply_fn, prompts_num, classes_per_call)
        return cache[key]

    def class_embeddings(self, params, label_texts: List[str], n_class: int
                         ) -> jnp.ndarray:
        """Prompt-ensemble class embeddings (clip_solver.py:688-700).

        The reference encodes each class's prompt block as its own [P, 77]
        forward — 1000 serial tiny dispatches that leave the chip idle
        between launches. Classes are packed into [cpc*P, 77] chunks here
        (one static shape => one compile), with the normalize->mean->
        normalize reduction inside the jitted call; per-class math is
        unchanged (tests/test_class_embed_batched.py)."""
        tok = get_tokenizer()
        if n_class == 0:
            raise ValueError(
                "zero-shot eval needs class names: the test metafile has no "
                "'label_name' fields (use a JSONL metafile with label/"
                "label_name like the reference's val_official.json, or pass "
                "class_names)."
            )
        prompts_num = len(label_texts) // n_class
        ids = np.asarray(tok.tokenize(label_texts))
        cpc = min(max(1, 2048 // prompts_num), n_class)
        embed = self._class_embed_fn(
            dense=False, prompts_num=prompts_num, classes_per_call=cpc)
        return batched_class_embeddings(
            embed, params, ids, n_class, prompts_num, cpc)

    def evaluate(self, tcfg: Dict, *, use_ema: bool = False) -> Metric:
        if (tcfg.get("evaluation") or {}).get("type") == "retrieval":
            return self.evaluate_retrieval(tcfg, use_ema=use_ema)
        state = self.state
        # copy_init=False zero-init EMA shadows are never debiased — same as
        # the reference (ema.py:27-33 zero-inits, step() never corrects); the
        # warmup ramp min(decay, (1+t)/(warmup+t)) makes early decays ~0 so
        # the bias washes out within ~warmup steps.
        params = state.ema_params if use_ema else state.params
        dataset, batch_size = self._eval_loader(tcfg)
        label_texts, ensemble = dataset.get_label_texts()
        n_class = ensemble.shape[0]
        class_emb = self.class_embeddings(params, label_texts, n_class)

        encode_image = self._encode_image_fn(state.batch_stats)
        # FILIP-family evaluates with token-wise late interaction by
        # default (filip_solver.py:839-960); override with dense_eval: false
        default_dense = self.method in ("filip", "defilip")
        has_dense_head = bool(
            getattr(self.model, "return_dense", False)
            or getattr(self.model, "return_filip", False)
        )
        dense_eval = bool(tcfg.get("dense_eval", default_dense)) and \
            hasattr(self.model, "encode_image_dense") and has_dense_head
        if dense_eval:
            dense_class = self._dense_class_embeddings(
                params, label_texts, n_class)
            encode_image_dense = jax.jit(partial(
                self.model.apply, method="encode_image_dense", train=False))

        res_path = osp.join(
            self.path.result_path, f"results.txt.rank{self.rank}")
        all_scores, all_labels = [], []
        n = len(dataset)

        # parallel item loading: decode/transform runs on worker threads a
        # few batches ahead (PIL releases the GIL), so eval wall-time is the
        # jitted encode, not 50k serial PIL decodes
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        # hosts split the val set by interleaved batches; results merge
        # via the per-rank dumps (base_dataset.py:122-139)
        idx_batches = [
            range(beg, min(beg + batch_size, n))
            for beg in range(self.rank * batch_size, n,
                             batch_size * self.world)
        ]
        workers = max(1, int(tcfg.get("num_workers", 4)))

        def _fetch(idxs):
            return [dataset[i] for i in idxs]

        with open(res_path, "w") as writer, \
                ThreadPoolExecutor(workers) as pool:
            inflight: deque = deque()
            queued = 0
            while queued < len(idx_batches) and len(inflight) < workers + 2:
                inflight.append(pool.submit(_fetch, idx_batches[queued]))
                queued += 1
            while inflight:
                items = inflight.popleft().result()
                if queued < len(idx_batches):
                    inflight.append(pool.submit(_fetch, idx_batches[queued]))
                    queued += 1
                imgs = np.stack([it["image"] for it in items])
                valid = imgs.shape[0]
                if valid < batch_size:  # pad to the jitted shape
                    pad = np.repeat(imgs[-1:], batch_size - valid, axis=0)
                    imgs = np.concatenate([imgs, pad])
                if dense_eval:
                    variables = {"params": params}
                    if state.batch_stats:
                        variables["batch_stats"] = state.batch_stats
                    d = encode_image_dense(variables, jnp.asarray(imgs))
                    d = l2_normalize(d)
                    logits = late_interaction_logits(
                        d, dense_class, jnp.asarray(1.0))
                else:
                    emb = encode_image(params, jnp.asarray(imgs))
                    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
                    logits = jnp.einsum("nd,cd->nc", emb, class_emb,
                                        preferred_element_type=jnp.float32)
                scores = jax.nn.softmax(logits.astype(jnp.float32), -1) @ \
                    jnp.asarray(ensemble)
                scores = np.asarray(scores)[:valid]
                preds = scores.argmax(-1)
                for j, it in enumerate(items):
                    writer.write(json.dumps({
                        "image_id": it["image_id"],
                        "filename": it["filename"],
                        "label": it["label"],
                        "label_name": it["label_name"],
                        "caption": it["caption"],
                        "tag": it["tag"],
                        "prediction": int(preds[j]),
                        "score": [round(float(s), 8) for s in scores[j]],
                    }, ensure_ascii=False) + "\n")
                all_scores.append(scores)
                all_labels.append(np.asarray([it["label"] for it in items]))
        evaluator = ImageNetEvaluator()
        if self.world > 1:
            # merge via process all-gather — NO shared filesystem needed
            # (the reference's rank-0-reads-every-shard merge,
            # base_dataset.py:122-139, assumed cluster NFS; pods have GCS).
            # The per-rank results.txt.rank<i> dumps above remain as local
            # debug artifacts.
            from declip_tpu.parallel.comms import gather_object

            shards = gather_object((
                np.concatenate(all_scores) if all_scores
                else np.zeros((0, n_class), np.float32),
                np.concatenate(all_labels) if all_labels
                else np.zeros((0,), np.int64),
            ))
            scores = np.concatenate([s for s, _ in shards])
            labels = np.concatenate([l for _, l in shards])
            return evaluator.eval_arrays(scores, labels)
        if not all_scores:
            return Metric({"top1": 0.0, "top5": 0.0, "n": 0})
        return evaluator.eval_arrays(
            np.concatenate(all_scores), np.concatenate(all_labels))

    def evaluate_retrieval(self, tcfg: Dict, *, use_ema: bool = False
                           ) -> Metric:
        """Image<->text retrieval eval (beyond-reference; the reference
        evaluates classification only). Config: a data.test entry with
        ``evaluation: {type: retrieval, kwargs: {topk: [1, 5, 10]}}`` —
        every sample's own caption is its positive. Embeddings are encoded
        batched, metrics computed host-side by RetrievalEvaluator; under
        multi-host each rank dumps its interleaved shard (index-keyed .npz,
        the results.txt.rank* pattern) and rank 0 reassembles the global
        order before ranking."""
        from declip_tpu.data.evaluator import RetrievalEvaluator

        state = self.state
        params = state.ema_params if use_ema else state.params
        dataset, batch_size = self._eval_loader(tcfg)
        encode_image = self._encode_image_fn(state.batch_stats)
        encode_text = self._encode_text_fn()
        tok = get_tokenizer()
        n = len(dataset)
        idx_batches = [
            range(beg, min(beg + batch_size, n))
            for beg in range(self.rank * batch_size, n,
                             batch_size * self.world)
        ]
        idx_all, img_all, txt_all = [], [], []
        for idxs in idx_batches:
            items = [dataset[i] for i in idxs]
            imgs = np.stack([it["image"] for it in items])
            toks = np.asarray(tok.tokenize([it["caption"] for it in items]))
            valid = imgs.shape[0]
            if valid < batch_size:  # pad to the jitted shape
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], batch_size - valid, 0)])
                toks = np.concatenate(
                    [toks, np.repeat(toks[-1:], batch_size - valid, 0)])
            emb_i = np.asarray(encode_image(params, jnp.asarray(imgs)),
                               np.float32)[:valid]
            emb_t = np.asarray(encode_text(params, jnp.asarray(toks)),
                               np.float32)[:valid]
            idx_all.append(np.asarray(idxs, np.int64))
            img_all.append(emb_i)
            txt_all.append(emb_t)

        kwargs = dict((tcfg.get("evaluation") or {}).get("kwargs") or {})
        evaluator = RetrievalEvaluator(**kwargs)
        idx = (np.concatenate(idx_all) if idx_all
               else np.zeros((0,), np.int64))
        img = (np.concatenate(img_all) if img_all
               else np.zeros((0, 1), np.float32))
        txt = (np.concatenate(txt_all) if txt_all
               else np.zeros((0, 1), np.float32))
        if self.world > 1:
            # all-gather the per-rank embedding shards — no shared FS
            # needed (see validate()); the local .npz dump stays as a
            # debug artifact
            from declip_tpu.parallel.comms import gather_object

            shard = osp.join(self.path.result_path,
                             f"retrieval.rank{self.rank}.npz")
            np.savez(shard, idx=idx, img=img, txt=txt)
            parts = gather_object((idx, img, txt))
            idx = np.concatenate([p[0] for p in parts])
            order = np.argsort(idx)
            img = np.concatenate([p[1] for p in parts])[order]
            txt = np.concatenate([p[2] for p in parts])[order]
            return evaluator.eval_arrays(img, txt)
        order = np.argsort(idx)
        return evaluator.eval_arrays(img[order], txt[order])

    def _dense_class_embeddings(self, params, label_texts, n_class):
        """Token-wise class embeddings for FILIP dense zero-shot eval
        (filip_solver.py:839-960): mean over prompts of dense token features,
        batched into multi-class chunks like class_embeddings."""
        tok = get_tokenizer()
        prompts_num = len(label_texts) // n_class
        ids = np.asarray(tok.tokenize(label_texts))
        cpc = min(max(1, 512 // prompts_num), n_class)
        embed = self._class_embed_fn(
            dense=True, prompts_num=prompts_num, classes_per_call=cpc)
        return batched_class_embeddings(
            embed, params, ids, n_class, prompts_num, cpc)  # [C, L, D]


def main(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(description="declip_tpu solver")
    parser.add_argument("--config", required=True)
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--set", nargs="*", default=[],
                        help="dotted.key=value config overrides")
    args = parser.parse_args(argv)

    cfg = parse_config(args.config)
    from declip_tpu.config import override
    for kv in args.set:
        key, _, value = kv.partition("=")
        try:
            value = json.loads(value)
        except json.JSONDecodeError:
            pass
        cfg = override(cfg, key, value)
        cfg["_config_path"] = osp.abspath(args.config)

    solver = Solver(cfg)
    if args.evaluate:
        for tcfg in solver.test_cfgs:
            metrics = solver.evaluate(tcfg)
            solver.logger.critical(json.dumps(dict(metrics), indent=2))
    else:
        solver.train()


if __name__ == "__main__":
    main()
