"""The pjit-compiled training step.

One pure function ``(state, batch) -> (state, metrics)`` per method,
replacing the reference's train-loop body (forward, criterion assembly,
backward with per-param allreduce hooks, clip/guard passes, optimizer step,
EMA — prototype/solver/declip_solver.py:380-820).

Distribution model: the step is compiled with ``jax.jit`` over a Mesh with
the batch sharded along the 'data' axis and state replicated. Losses are
means over the (logically global) batch, so gradients come out globally
averaged; the gathered-feature contrastive matmuls become sharded matmuls
for which XLA inserts all-gathers over ICI (the reference's hand-rolled
AllGather + allreduce hooks, clip.py:25-49 / dist.py:63-83, disappear).
BatchNorm statistics are likewise computed over the global batch (the
reference needed linklink SyncBN kernels for that).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from declip_tpu.models import CLIP, DECLIP, DEFILIP, FILIP, SLIP
from declip_tpu.models.clip_model import l2_normalize
from declip_tpu.models.memory_bank import enqueue, query_topk
from declip_tpu.train import method_losses
from declip_tpu.train.ema import EmaConfig, ema_step
from declip_tpu.train.state import TrainState


def method_of(model) -> str:
    from declip_tpu.models.ssl_builders import SSLModel

    if isinstance(model, SSLModel):
        return model.ssl_method  # moco | simclr | clsa
    # order matters: DEFILIP subclasses nothing but check most-specific first
    if isinstance(model, DEFILIP):
        return "defilip"
    if isinstance(model, DECLIP):
        return "declip"
    if isinstance(model, FILIP):
        return "filip"
    if isinstance(model, SLIP):
        return "slip"
    return "clip"


def _find_logit_scale(params):
    return params["logit_scale"]


def _set_logit_scale(params, value):
    new = dict(params)
    new["logit_scale"] = value
    return new


def logit_scale_guard(
    old_params, new_params, grad_clip: Dict, state: TrainState
) -> Tuple[Any, Optional[jax.Array], Optional[jax.Array]]:
    """Post-step logit-scale clamps (clip_solver.py:500-523,
    declip_solver.py:64-86,694-706). Returns (params, ema_buffer, clip_count)."""
    kind = (grad_clip or {}).get("type")
    buffer = state.logit_ema_buffer
    count = state.logit_clip_count
    if kind in (None, "norm", "value", "logit_scale_grad", "constant"):
        return new_params, buffer, count

    s_old = _find_logit_scale(old_params)
    s_new = _find_logit_scale(new_params)
    if kind == "logit_scale_param":
        v = float(grad_clip["value"])
        s = jnp.clip(s_new, s_old - v, s_old + v)
    elif kind == "logit_scale_param_abs_min":
        # the reference clamps BOTH before backward and after the step
        # (clip_solver.py:506,520), so the update applies to the clamped
        # value; s_new - s_old recovers the raw update
        v = float(grad_clip["value"])
        s = jnp.maximum(jnp.maximum(s_old, v) + (s_new - s_old), v)
    elif kind == "logit_scale_param_value":
        v = float(grad_clip["value"])
        mv = float(grad_clip["max_value"])
        s = jnp.clip(jnp.clip(s_old, v, mv) + (s_new - s_old), v, mv)
    elif kind == "logit_scale_param_ema":
        # reference passes config.grad_clip.value as the threshold
        # (declip_solver.py:387-388); 'threshold' kept as an alias
        thr = float(grad_clip.get("threshold",
                                  grad_clip.get("value", 0.2)))
        momentum = 0.9
        clipped = jnp.clip(s_new, buffer - thr, buffer + thr)
        count = count + jnp.any(clipped != s_new).astype(jnp.int32)
        s = clipped
        buffer = momentum * buffer + (1 - momentum) * jnp.mean(s)
    else:
        raise NotImplementedError(f"grad_clip type {kind!r}")
    return _set_logit_scale(new_params, s), buffer, count


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: Dict,
    schedule: Callable,
    *,
    method: Optional[str] = None,
    axis_name: Optional[str] = None,
    ema_cfg: Optional[EmaConfig] = None,
    total_steps: int = 1,
    device_aug: Optional[Dict] = None,
    seed: int = 0,
    mesh=None,
):
    """device_aug: when set (e.g. {'views': 2}), batch['images'] arrives as
    uint8 geometry-only crops and the MOCOV2 photometric augmentation runs
    fused on-device (declip_tpu/data/device_aug.py) before the model.

    mesh: required only for ``loss_impl: {type: ring}`` in SPMD mode (the
    ring loss runs under a shard_map over the mesh's first axis)."""
    from declip_tpu.ops.contrastive import make_pair_loss

    method = method or method_of(model)
    grad_clip = dict(cfg.get("grad_clip") or {})
    pair_loss = make_pair_loss(cfg, mesh=mesh, axis_name=axis_name)
    use_bank = bool(getattr(model, "return_nn_bank", False))
    nn_topk = int(getattr(model, "nn_topk", 1))
    use_nn_simsiam = bool(getattr(model, "return_simsiam_nn_text", False))
    aug_base_key = jax.random.PRNGKey(seed)

    ssl_methods = ("moco", "simclr", "clsa")

    def forward_out(params, state: TrainState, batch):
        """Tower forward only: per-sample outputs + mutated collections.
        Split from the loss assembly so the grad-cache path (grad_cache.py)
        can run it chunked without re-stating the method dispatch."""
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        # "moe": MoE towers sow their Switch load-balance aux loss there
        # (models/layers.py Transformer) — empty for dense towers
        out, mutated = model.apply(
            variables, batch, train=True, mutable=["batch_stats", "moe"]
        )
        return out, mutated

    def losses_from_out(params, out, state: TrainState, moe_aux):
        """Loss assembly over per-sample tower outputs. Differentiable in
        (params, out): params re-enter only through the nn-SimSiam bank
        projector (declip_model.project_nn_text), whose forward is [B, D]
        vectors — cheap enough to live in the loss pass."""
        nn_kwargs = {}
        if use_bank:
            nn = query_topk(state.bank_text, out["text_embed"], nn_topk)
            nn_aug = query_topk(
                state.bank_text, out["text_embed_aug"], nn_topk)
            nn = tuple(l2_normalize(t, eps=1e-10) for t in nn)
            nn_aug = tuple(l2_normalize(t, eps=1e-10) for t in nn_aug)
            nn_kwargs = {"nn_text": nn, "nn_text_aug": nn_aug}
            if use_nn_simsiam:
                # p_text comes from the main forward (params/BN stats created
                # there); the bank features go through the projector on
                # running statistics (declip_model.project_nn_text)
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                z_nn = [
                    model.apply(variables, t, method="project_nn_text")
                    for t in nn
                ]
                nn_kwargs["nn_simsiam"] = (out["nn_simsiam_p_text"], z_nn)

        if method == "clip":
            total, metrics = method_losses.clip_losses(
                out, cfg, axis_name, pair_loss)
        elif method == "slip":
            total, metrics = method_losses.slip_losses(
                out, cfg, axis_name, pair_loss)
        elif method == "filip":
            total, metrics = method_losses.filip_losses(
                out, cfg, axis_name, pair_loss)
        elif method == "declip":
            total, metrics = method_losses.declip_losses(
                out, cfg, axis_name, step=state.step,
                total_steps=total_steps, pair_loss=pair_loss, **nn_kwargs,
            )
        elif method == "defilip":
            total, metrics = method_losses.defilip_losses(
                out, cfg, axis_name, step=state.step,
                total_steps=total_steps, pair_loss=pair_loss, **nn_kwargs,
            )
        else:
            raise NotImplementedError(method)
        if moe_aux is not None:
            total = total + moe_aux
            metrics["moe_aux_loss"] = moe_aux
        return total, metrics

    def loss_fn(params, state: TrainState, batch, ssl_state=None):
        out, mutated = forward_out(params, state, batch)
        moe_aux = sum(jax.tree.leaves(mutated.get("moe", {})), 0.0)

        if method in ssl_methods:
            ssl_extra = None
            if method == "simclr":
                total, metrics = method_losses.simclr_losses(
                    out, axis_name, temperature=float(model.T))
            else:
                # key features through the momentum encoder (encoder_k,
                # moco_builder.py:118-131) — stop-gradient, own BN stats
                key_vars = {"params": ssl_state.key_params}
                if ssl_state.key_batch_stats:
                    key_vars["batch_stats"] = ssl_state.key_batch_stats
                x2 = batch["images"][..., 3:6]
                k, key_mut = model.apply(
                    key_vars, x2, train=True, mutable=["batch_stats"],
                    method="encode")
                k = jax.lax.stop_gradient(k)
                total, metrics = method_losses.moco_losses(
                    out, axis_name, k=k, queue=ssl_state.queue,
                    temperature=float(model.T),
                    clsa_ratio=float(model.clsa_ratio),
                    clsa_avg=bool(model.clsa_avg))
                ssl_extra = (k, key_mut.get("batch_stats"))
            if mutated.get("moe"):  # structure is trace-static
                total = total + moe_aux
                metrics["moe_aux_loss"] = moe_aux
            return total, (metrics, mutated.get("batch_stats"), out,
                           ssl_extra)

        total, metrics = losses_from_out(
            params, out, state,
            moe_aux if mutated.get("moe") else None)
        return total, (metrics, mutated.get("batch_stats"), out, None)

    gc_chunks = int((cfg.get("grad_cache") or {}).get("chunks", 0) or 0)
    if gc_chunks > 1:
        from declip_tpu.train.grad_cache import make_cached_value_and_grad

        if method in ssl_methods:
            raise NotImplementedError(
                "grad_cache does not support SSL methods (queue/momentum "
                "state couples steps)")
        for tower in ("visual", "text"):
            if getattr(getattr(model, tower, None), "moe_experts", 0):
                raise NotImplementedError(
                    "grad_cache + MoE towers: router capacity and aux loss "
                    "are batch-coupled in the forward")
        cached_value_and_grad = make_cached_value_and_grad(
            forward_out, losses_from_out, gc_chunks, mesh=mesh)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        if device_aug is not None:
            from declip_tpu.data.device_aug import augment_views

            rng = jax.random.fold_in(aug_base_key, state.step)
            batch = dict(batch)
            batch["images"] = augment_views(
                rng, batch["images"],
                views=int(device_aug.get("views", 2)),
                preset=str(device_aug.get("preset", "MOCOV2")),
                dtype=getattr(model, "dtype", jnp.float32),
            )
        ssl_state = state.ssl
        if method in ("moco", "clsa") and ssl_state is not None:
            # momentum-update the key encoder BEFORE computing keys
            # (moco_builder.py:50-53 + forward order)
            from declip_tpu.models.ssl_builders import momentum_update

            ssl_state = momentum_update(
                ssl_state, state.params, float(model.m))

        if gc_chunks > 1:
            if state.batch_stats:
                # trace-time check: BN statistics couple samples inside the
                # forward, which breaks GradCache's separability assumption
                raise NotImplementedError(
                    "grad_cache requires BatchNorm-free towers (ViT); this "
                    "model carries batch_stats")
            (total, (metrics, new_stats, out, ssl_extra)), grads = \
                cached_value_and_grad(state.params, state, batch)
        else:
            (total, (metrics, new_stats, out, ssl_extra)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, state, batch, ssl_state)

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params, buffer, count = logit_scale_guard(
            state.params, params, grad_clip, state
        )

        step = state.step + 1
        ema_params = state.ema_params
        if ema_params is not None and ema_cfg is not None:
            ema_params = ema_step(ema_params, params, step, ema_cfg)

        bank = state.bank_text
        if use_bank:
            # enqueue aug then orig (declip.py:288-291)
            bank = enqueue(bank, out["text_embed_aug"])
            bank = enqueue(bank, out["text_embed"])

        if ssl_extra is not None:
            # keys were gathered before enqueue in the reference
            # (concat_all_gather, moco_builder.py:57-68); under SPMD k is
            # already global
            from declip_tpu.models.ssl_builders import enqueue_keys
            from declip_tpu.ops.contrastive import gather_features

            k, key_stats = ssl_extra
            if key_stats:
                ssl_state = ssl_state._replace(key_batch_stats=key_stats)
            ssl_state = enqueue_keys(
                ssl_state, gather_features(k, axis_name))

        grad_norm = optax.global_norm(grads)
        # Per-step non-finite containment (the host only inspects loss on
        # print_freq boundaries; the reference checks EVERY iteration,
        # declip_solver.py:548-619). A NaN/inf loss or gradient skips the
        # param/opt/EMA/bank/BN updates entirely so the poisoned step is a
        # no-op; the host-side rollback then fires at the next print step.
        finite = jnp.isfinite(total) & jnp.isfinite(grad_norm)

        def _keep_if_finite(new, old):
            if new is None or old is None:
                return new
            return jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new, old)

        new_state = state.replace(
            step=step,
            params=_keep_if_finite(params, state.params),
            batch_stats=(
                _keep_if_finite(new_stats, state.batch_stats)
                if new_stats is not None and state.batch_stats
                # a state built without stats adopts the model's on step 1
                else (new_stats if new_stats is not None
                      else state.batch_stats)),
            opt_state=_keep_if_finite(opt_state, state.opt_state),
            ema_params=_keep_if_finite(ema_params, state.ema_params),
            bank_text=_keep_if_finite(bank, state.bank_text),
            ssl=_keep_if_finite(ssl_state, state.ssl),
            logit_ema_buffer=_keep_if_finite(buffer, state.logit_ema_buffer),
            logit_clip_count=_keep_if_finite(count, state.logit_clip_count),
        )
        metrics = dict(metrics)
        metrics["lr"] = schedule(state.step)
        metrics["grad_norm"] = grad_norm
        metrics["update_skipped"] = 1.0 - finite.astype(jnp.float32)
        if cfg.get("check_grad", False):
            # per-top-module grad norms (the reference's check_grad /
            # check_model_and_grad debug hooks, clip_solver.py:544-545)
            for name, sub in grads.items():
                metrics[f"grad_norm/{name}"] = optax.global_norm(sub)
        if count is not None:
            metrics["logit_clip_count"] = count
        return new_state, metrics

    return train_step
