"""Optimizer construction (optax) — `optim_entry` equivalent.

Rebuilds prototype/optimizer/: torch SGD/RMSprop/Adadelta/Adagrad/Adam/AdamW,
LARS (lars.py), the text-AdamW + visual-SGD split optimizer
(AdamW_SGD.py:38-138), and grad clipping. The FP16 wrappers
(fp16_optim.py, linklink FusedFP16*) are subsumed by the bf16-compute /
fp32-master-param policy: params and optimizer state stay fp32, the model
computes in bf16, so the master-weight machinery disappears — fused types
alias their base optimizer here.

Per-group weight-decay overrides (pconfig, misc.py:267-412) are expressed as
masked ``add_decayed_weights`` stages; decay ordering follows each family's
torch semantics (coupled for SGD-likes, decoupled for AdamW).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from declip_tpu.optim.param_groups import (
    group_mask,
    path_prefix_mask,
    weight_decay_masks,
)
from declip_tpu.optim.schedulers import scheduler_entry  # noqa: F401

Schedule = Callable


def _decay_stages(params, default_wd: float, pconfig: Dict, *, coupled: bool):
    """Masked weight-decay transforms implementing pconfig overrides."""
    stages = []
    masks = weight_decay_masks(params, pconfig)
    for value, mask in masks.items():
        wd = default_wd if value is None else value
        if wd:
            stages.append(optax.masked(optax.add_decayed_weights(wd), mask))
    return stages


def _scale_by(kind: str, kwargs: Dict):
    if kind in ("SGD", "FusedFP16SGD", "FP16SGD"):
        return optax.trace(
            decay=kwargs.get("momentum", 0.0),
            nesterov=kwargs.get("nesterov", False),
        ), True
    if kind in ("AdamW", "FP16AdamW", "FusedFP16AdamW", "AdamWWithClip"):
        b1, b2 = kwargs.get("betas", (0.9, 0.999))
        return optax.scale_by_adam(b1=b1, b2=b2, eps=kwargs.get("eps", 1e-8)), False
    if kind in ("Adam", "AdamWithClip"):
        b1, b2 = kwargs.get("betas", (0.9, 0.999))
        return optax.scale_by_adam(b1=b1, b2=b2, eps=kwargs.get("eps", 1e-8)), True
    if kind in ("RMSprop", "FP16RMSprop"):
        return optax.scale_by_rms(
            decay=kwargs.get("alpha", 0.99), eps=kwargs.get("eps", 1e-8)
        ), True
    if kind == "Adadelta":
        return optax.scale_by_adadelta(
            rho=kwargs.get("rho", 0.9), eps=kwargs.get("eps", 1e-6)
        ), True
    if kind == "Adagrad":
        return optax.scale_by_rss(
            initial_accumulator_value=kwargs.get("initial_accumulator_value", 0.0),
            eps=kwargs.get("eps", 1e-10),
        ), True
    raise KeyError(f"unknown optimizer type {kind!r}")


def _single_optimizer(kind: str, kwargs: Dict, params, schedule, pconfig,
                      grad_clip: Optional[Dict]):
    kwargs = dict(kwargs or {})
    wd = kwargs.get("weight_decay", 0.0)
    stages = []

    # grad clipping before the update rule (clip_solver.py:524-535)
    if grad_clip:
        if grad_clip.get("type") == "norm":
            stages.append(optax.clip_by_global_norm(float(grad_clip["value"])))
        elif grad_clip.get("type") == "value":
            stages.append(optax.clip(float(grad_clip["value"])))
        elif grad_clip.get("type") == "logit_scale_grad":
            mask = group_mask(params, lambda g: g == "logit_scale")
            stages.append(
                optax.masked(optax.clip(float(grad_clip["value"])), mask)
            )
        elif grad_clip.get("type") == "constant":
            # logit_scale frozen (clip_solver.py:501-503)
            mask = group_mask(params, lambda g: g == "logit_scale")
            stages.append(optax.masked(optax.set_to_zero(), mask))
    # optimizer-integrated clip (adam_clip.py)
    if kind in ("AdamWithClip", "AdamWWithClip") and "max_norm" in kwargs:
        stages.append(optax.clip_by_global_norm(float(kwargs["max_norm"])))

    if kind == "LARS":
        return optax.chain(
            *stages,
            optax.lars(
                learning_rate=schedule,
                weight_decay=wd,
                momentum=kwargs.get("momentum", 0.9),
                eps=kwargs.get("eps", 1e-8),
                nesterov=kwargs.get("nesterov", False),
            ),
        )

    if kind == "Adafactor":
        # Beyond-reference, pod-scale: factored second moments store O(n+m)
        # per [n, m] matrix instead of Adam's O(n·m), roughly halving
        # optimizer-state HBM for billion-parameter towers (the SigLIP /
        # big-vision training recipe). Composed from optax's stages rather
        # than optax.adafactor (whose unconditional trailing scale(-1)
        # would double-flip with scale_by_learning_rate below); decoupled
        # wd via the same masked stages as AdamW so pconfig overrides work.
        stages.append(optax.scale_by_factored_rms(
            factored=kwargs.get("factored", True),
            decay_rate=kwargs.get("decay_rate", 0.8),
            min_dim_size_to_factor=int(
                kwargs.get("min_dim_size_to_factor", 128)),
            epsilon=kwargs.get("eps", 1e-30),
        ))
        if kwargs.get("clipping_threshold", 1.0) is not None:
            stages.append(optax.clip_by_block_rms(
                float(kwargs.get("clipping_threshold", 1.0))))
        if kwargs.get("multiply_by_parameter_scale", True):
            stages.append(optax.scale_by_param_block_rms())
        if kwargs.get("momentum") is not None:
            stages.append(optax.ema(
                kwargs["momentum"], debias=False,
                accumulator_dtype=jnp.dtype(
                    kwargs.get("dtype_momentum", "float32"))))
        stages += _decay_stages(params, wd, pconfig, coupled=False)
        stages.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*stages)

    rule, coupled = _scale_by(kind, kwargs)
    if coupled:
        stages += _decay_stages(params, wd, pconfig, coupled=True)
        stages.append(rule)
    else:
        stages.append(rule)
        stages += _decay_stages(params, wd, pconfig, coupled=False)
    stages.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*stages)


def optim_entry(
    cfg: Dict,
    params,
    schedule: Schedule,
    *,
    pconfig: Optional[Dict] = None,
    grad_clip: Optional[Dict] = None,
    frozen_mask=None,
) -> optax.GradientTransformation:
    """Build the full update rule from an optimizer `{type, kwargs}` node.

    frozen_mask: boolean pytree; True params get zero updates (the JAX
    analogue of ``requires_grad=False``, e.g. ViT's frozen conv1).
    """
    kind = cfg["type"]
    kwargs = dict(cfg.get("kwargs") or {})
    pconfig = pconfig if pconfig is not None else cfg.get("pconfig") or {}

    if kind in ("AdamW_SGD", "FP16AdamW_SGD"):
        # text tower: AdamW; visual tower: SGD (AdamW_SGD.py:38-138). The
        # text group includes the MLM head and FILIP text mapping like the
        # reference's text_modules() (declip.py:178-181, clip.py:75-85).
        text_kw = dict(kwargs.get("text_config") or {})
        visual_kw = dict(kwargs.get("visual_config") or {})
        text_lr = text_kw.pop("lr", kwargs.get("lr", 1e-4))
        visual_lr = visual_kw.pop("lr", kwargs.get("lr", 1e-4))
        base_lr = kwargs.get("lr", 1.0) or 1.0

        def scaled(lr):
            return lambda step: schedule(step) * (lr / base_lr)

        labels = jax.tree.map(lambda _: "visual", params)
        text_mask = path_prefix_mask(
            params, ("text", "text_label_predictor", "text_mapping"))
        labels = jax.tree.map(
            lambda is_text, lab: "text" if is_text else lab, text_mask, labels
        )
        # whole-model grad clipping must happen ONCE before the split (the
        # reference clips over all parameters, declip_solver.py:650);
        # per-branch clipping would use partition-local norms
        pre = []
        branch_clip = grad_clip
        if grad_clip and grad_clip.get("type") in ("norm", "value"):
            if grad_clip["type"] == "norm":
                pre.append(optax.clip_by_global_norm(
                    float(grad_clip["value"])))
            else:
                pre.append(optax.clip(float(grad_clip["value"])))
            branch_clip = None
        tx = optax.chain(
            *pre,
            optax.multi_transform(
                {
                    "text": _single_optimizer(
                        "AdamW", text_kw, params, scaled(text_lr), pconfig,
                        branch_clip
                    ),
                    "visual": _single_optimizer(
                        "SGD", visual_kw, params, scaled(visual_lr), pconfig,
                        branch_clip
                    ),
                },
                labels,
            ),
        )
    else:
        tx = _single_optimizer(kind, kwargs, params, schedule, pconfig, grad_clip)

    if frozen_mask is not None and any(jax.tree.leaves(frozen_mask)):
        # zero updates LAST so neither the update rule nor weight decay can
        # move frozen params (JAX analogue of requires_grad=False)
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))
    return tx


def fast_forward_schedule(opt_state, step):
    """Set every ``ScaleByScheduleState.count`` in ``opt_state`` to ``step``.

    Used by the reference-exact rollback mode (declip_solver.py:600-607):
    the reference rebuilds a FRESH optimizer after a crash (Adam moments
    zeroed, bias correction restarted) but keeps evaluating its rebuilt
    scheduler at the current step — in optax the schedule count lives
    inside the opt_state, so a fresh ``tx.init`` would silently replay the
    LR warmup from 0 unless fast-forwarded. Adam's own ``count`` (bias
    correction) is deliberately NOT touched: the reference restarts it."""
    is_sched = lambda s: isinstance(s, optax.ScaleByScheduleState)  # noqa: E731
    return jax.tree.map(
        lambda s: optax.ScaleByScheduleState(
            count=jnp.asarray(step, jnp.int32)) if is_sched(s) else s,
        opt_state,
        is_leaf=is_sched,
    )
