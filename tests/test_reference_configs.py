"""Parity: every reference experiment config must parse and build through
our registries unchanged (model module construction, scheduler, optimizer
node validation, data-config normalization).

The reference tree is mounted read-only at /root/reference; these configs are
the user API surface (SURVEY.md §2.8) and BASELINE.json requires they run
unchanged.
"""

import glob
import os

import pytest

from declip_tpu.config import parse_config
from declip_tpu.models import model_entry
from declip_tpu.optim.schedulers import scheduler_entry
from declip_tpu.solver import Solver

REF_EXPERIMENTS = sorted(
    glob.glob("/root/reference/experiments/*/*/*/config.yaml")
)


@pytest.mark.skipif(not REF_EXPERIMENTS, reason="reference tree not mounted")
@pytest.mark.parametrize(
    "path", REF_EXPERIMENTS, ids=[p.split("/")[-2] for p in REF_EXPERIMENTS]
)
def test_reference_config_builds(path):
    cfg = parse_config(path)

    # model node resolves through our registry with unchanged kwargs
    model = model_entry(
        {"type": cfg.model.type, "kwargs": dict(cfg.model.kwargs)}
    )
    assert model is not None

    # scheduler node builds and produces sane lrs
    if "lr_scheduler" in cfg:
        sched = scheduler_entry(
            cfg.lr_scheduler,
            max_iter=int(cfg.get_path("lr_scheduler.kwargs.max_iter", 1000)),
        )
        warm = cfg.get_path("lr_scheduler.kwargs.warmup_lr")
        steps = cfg.get_path("lr_scheduler.kwargs.warmup_steps", 0)
        if warm is not None:
            assert float(sched(steps)) == pytest.approx(warm, rel=1e-4)

    # optimizer type is known
    if "optimizer" in cfg:
        from declip_tpu.optim import _scale_by

        kind = cfg.optimizer.type
        if kind not in ("LARS", "AdamW_SGD", "FP16AdamW_SGD"):
            _scale_by(kind, dict(cfg.optimizer.get("kwargs") or {}))

    # data section normalizes into train/test
    norm = Solver.normalize_data_config(cfg.get("data") or {})
    assert "train" in norm
    if norm["test"]:
        entry = norm["test"][0]
        assert "meta_file" in entry
        assert "label_texts_ensemble" in entry or "transforms" in entry

    # grad_clip type is one we implement
    gc = cfg.get("grad_clip") or {}
    if gc:
        assert gc["type"] in (
            "norm", "value", "constant", "logit_scale_grad",
            "logit_scale_param", "logit_scale_param_abs_min",
            "logit_scale_param_value", "logit_scale_param_ema",
        )
