"""Per-method training loss assembly.

Mirrors the criterion sections of the five reference solvers
(prototype/solver/{clip,slip,filip,declip,defilip}_solver.py). Each function
takes the model's feature dict and returns ``(total_loss, metrics)``.

Distribution note: the reference divides every loss term by ``world_size``
because its DDP *sums* gradients across ranks (prototype/utils/dist.py:63-83,
clip_solver.py:418). Here losses are per-row means and gradients are averaged
over the mesh (pjit psum-mean), which is the same effective objective — so no
world-size division appears.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from declip_tpu import losses as L
from declip_tpu.ops.contrastive import (
    chunked_cross_entropy,
    clip_infonce,
    gather_features,
    infonce_labels,
    loss_impl_kind,
    make_pair_loss,
    similarity_logits,
    topk_accuracy,
)
from declip_tpu.ops.filip_ops import dispatch_late_interaction

Metrics = Dict[str, jax.Array]


def _pair_scale(out: Dict[str, Any]):
    """Scale argument for the pair-loss protocol: models built with a SigLIP
    ``logit_bias`` param (clip: {logit_bias_init: ...}) emit it in the output
    dict; pack it as a (scale, bias) tuple for the sigmoid loss_impl kinds
    (ops/contrastive._split_scale unpacks; softmax kinds ignore the bias)."""
    if "logit_bias" in out:
        return (out["logit_scale"], out["logit_bias"])
    return out["logit_scale"]


def clip_losses(out: Dict[str, Any], cfg: Dict, axis_name: Optional[str],
                pair_loss=None) -> Tuple[jax.Array, Metrics]:
    """clip_solver.py:407-430: single symmetric InfoNCE.

    pair_loss: config-selected implementation (full/chunked/ring/sigmoid* —
    make_pair_loss); built from cfg when not supplied by the train step."""
    if pair_loss is None:
        pair_loss = make_pair_loss(cfg, axis_name=axis_name)
    loss, logits_i, labels = pair_loss(
        out["image_embed"], out["text_embed"], _pair_scale(out))
    top1, top5 = topk_accuracy(logits_i, labels)
    metrics = {"loss": loss, "clip_loss": loss, "top1": top1, "top5": top5,
               "logit_scale": out["logit_scale"]}
    if "logit_bias" in out:
        metrics["logit_bias"] = out["logit_bias"]
    return loss, metrics


def slip_losses(out, cfg, axis_name, pair_loss=None
                ) -> Tuple[jax.Array, Metrics]:
    """slip_solver.py:478-512: CLIP + gathered SimCLR on the two aug views."""
    w = cfg.get("loss_weight", {}) or {}
    clip_l, m = clip_losses(out, cfg, axis_name, pair_loss)
    sim1, sim2 = out["image_sim_1"], out["image_sim_2"]
    g_sim1 = gather_features(sim1, axis_name)
    g_sim2 = gather_features(sim2, axis_name)
    labels = infonce_labels(sim1.shape[0], axis_name)
    simclr = L.nt_xent_gather(sim1, g_sim1, sim2, g_sim2, labels,
                              temperature=0.1)
    total = clip_l * w.get("clip_loss", 1.0) + simclr * w.get("simclr_loss", 1.0)
    m.update({"loss": total, "simclr_loss": simclr})
    return total, m


def _declip_clip_terms(out, cfg, axis_name, pair_loss):
    """The 2x2 view x (text, text_aug) CLIP losses (declip_solver.py:442-452).

    Each term routes through the config-selected pair implementation
    (full gathered matmul, chunked logsumexp, or ring) — the gathers of the
    full path are CSE'd by XLA across the four terms."""
    scale = _pair_scale(out)
    i1, i2 = out["image_embed_1"], out["image_embed_2"]
    t, ta = out["text_embed"], out["text_embed_aug"]

    l1, logits_i1, labels_acc = pair_loss(i1, t, scale)
    l2, _, _ = pair_loss(i2, t, scale)
    l1a, _, _ = pair_loss(i1, ta, scale)
    l2a, _, _ = pair_loss(i2, ta, scale)

    data_cfg = cfg.get("data", {}).get("train", {}) if cfg else {}
    if data_cfg.get("only_image_two_view", False):
        clip_loss = (l1 + l2) / 2
    else:  # image_text_two_view (default for DeCLIP configs)
        clip_loss = (l1 + l2 + l1a + l2a) / 4
    return clip_loss, logits_i1, labels_acc


def declip_losses(out, cfg, axis_name, *, nn_text=None, nn_text_aug=None,
                  nn_simsiam=None, step=0, total_steps=1, pair_loss=None
                  ) -> Tuple[jax.Array, Metrics]:
    """declip_solver.py:442-533 assembly.

    nn_text / nn_text_aug: tuples of [B, D] NN-bank query results (normalized
    by the caller), or None when return_nn_bank is off.
    """
    w = dict(cfg.get("clip_simsiam_loss_weight", {}) or {})
    if pair_loss is None:
        pair_loss = make_pair_loss(cfg, axis_name=axis_name)
    clip_loss, logits_i1, labels_acc = _declip_clip_terms(
        out, cfg, axis_name, pair_loss)

    p1, z1, p2, z2 = out["simsiam"]
    simsiam = L.simsiam_loss(p1, z1, p2, z2)

    mlm = (
        L.mlm_loss(out["mlm_logits"], out["mlm_labels"])
        if "mlm_logits" in out
        else jnp.zeros(())
    )

    text_simsiam = jnp.zeros(())
    if "text_simsiam" in out:
        p1t, z1t, p2t, z2t = out["text_simsiam"]
        text_simsiam = L.simsiam_loss(p1t, z1t, p2t, z2t)

    nn_simsiam_loss = jnp.zeros(())
    if nn_simsiam is not None:
        p_text, z_nn = nn_simsiam
        nn_simsiam_loss = L.simsiam_loss(p_text, z_nn[0], p_text, z_nn[0])

    clip_nn_text = jnp.zeros(())
    if nn_text is not None:
        # image vs NN(text) and image vs NN(text_aug) gathered logits, fed
        # through symmetric InfoNCE (declip_solver.py:474-482)
        scale = out["logit_scale"]
        i1, i2 = out["image_embed_1"], out["image_embed_2"]
        labels = infonce_labels(i1.shape[0], axis_name)
        g_nn = jnp.concatenate(
            [gather_features(t, axis_name) for t in nn_text], axis=0
        )
        g_nn_aug = jnp.concatenate(
            [gather_features(t, axis_name) for t in nn_text_aug], axis=0
        )
        if loss_impl_kind(cfg) == "full":
            li1 = similarity_logits(i1, g_nn, scale)
            li1a = similarity_logits(i1, g_nn_aug, scale)
            li2 = similarity_logits(i2, g_nn, scale)
            li2a = similarity_logits(i2, g_nn_aug, scale)
            l_nn1 = clip_infonce(li1, li1a, labels)
            l_nn2 = clip_infonce(li2, li2a, labels)
        else:
            # [B, topk*GB] logits are the same memory hazard as the clip
            # terms — blockwise logsumexp for chunked AND ring (the bank
            # keys are query results, not batch-sharded rows, so the ring
            # rotation does not apply to them)
            def ce(a, b):
                return chunked_cross_entropy(a, b, scale, labels)

            l_nn1 = (ce(i1, g_nn) + ce(i1, g_nn_aug)) / 2
            l_nn2 = (ce(i2, g_nn) + ce(i2, g_nn_aug)) / 2
        clip_nn_text = (l_nn1 + l_nn2) / 2

    # weighted total (declip_solver.py:507-533)
    wtype = w.get("type")
    metrics: Metrics = {}
    if wtype is None:
        total = clip_loss * w.get("clip_loss", 1.0)
        total = total + simsiam * w.get("simsiam_loss", 0.0)
        total = total + mlm * w.get("masking_language", 0.0)
        total = total + text_simsiam * w.get("text_simsiam_loss", 0.0)
        total = total + clip_nn_text * w.get("nn_text", 0.0)
        total = total + nn_simsiam_loss * w.get("nn_simsiam_loss", 0.0)
    elif wtype == "convirt":
        ntx = (
            L.nt_xent_convirt(out["image_embed_1"], out["text_embed"])
            + L.nt_xent_convirt(out["image_embed_2"], out["text_embed"])
        )
        total = (clip_loss + ntx) / 2 * w.get("clip_loss", 1.0)
        total = total + simsiam * w.get("simsiam_loss", 0.0)
        metrics["nt_xent_loss"] = ntx
    elif wtype == "linear":
        frac = jnp.asarray(step, jnp.float32) / max(total_steps, 1)
        cw = 0.2 + 0.8 * frac
        total = clip_loss * cw + simsiam * (1.0 - cw)
    elif wtype == "shift":
        use_clip = (jnp.asarray(step) % 2) == 0
        total = jnp.where(use_clip, clip_loss, simsiam)
    else:
        raise NotImplementedError(f"loss weight type {wtype!r}")

    top1, top5 = topk_accuracy(logits_i1, labels_acc)
    metrics.update({
        "loss": total, "clip_loss": clip_loss, "simsiam_loss": simsiam,
        "text_mlm_loss": mlm, "clip_nn_text_loss": clip_nn_text,
        "text_simsiam_loss": text_simsiam, "top1": top1, "top5": top5,
        "logit_scale": out["logit_scale"],
    })
    return total, metrics


def filip_losses(out, cfg, axis_name, pair_loss=None
                 ) -> Tuple[jax.Array, Metrics]:
    """filip_solver.py:470-523: CLIP loss + dense late-interaction loss.

    The dense late-interaction term stays on the full gathered path (its
    token-wise max-sim logits don't decompose into a plain logsumexp)."""
    w = dict(cfg.get("clip_simsiam_loss_weight", {}) or {})
    if pair_loss is None:
        pair_loss = make_pair_loss(cfg, axis_name=axis_name)
    scale = out["logit_scale"]
    img, txt = out["image_embed"], out["text_embed"]
    labels = infonce_labels(img.shape[0], axis_name)
    clip_loss, logits_i, labels_acc = pair_loss(img, txt, _pair_scale(out))

    dense_loss = jnp.zeros(())
    if "dense_image" in out:
        # query side uses ALL own tokens; the gathered side is the top-k
        # selection (filip.py:92-105 gathers selected_feat only)
        late_interaction = dispatch_late_interaction(cfg)
        di, dt = out["dense_image"], out["dense_text"]
        ds = out["logit_scale_dense"]
        g_di = gather_features(out["dense_image_sel"], axis_name)
        g_dt = gather_features(out["dense_text_sel"], axis_name)
        logits_di = late_interaction(di, g_dt, ds)
        logits_dt = late_interaction(dt, g_di, ds)
        dense_loss = clip_infonce(logits_di, logits_dt, labels)

    mlm = (
        L.mlm_loss(out["mlm_logits"], out["mlm_labels"])
        if "mlm_logits" in out
        else jnp.zeros(())
    )

    # reference defaults (filip_solver.py:507-523): clip_loss is the
    # required base term; dense/mlm terms only when their weight is set
    total = clip_loss * w.get("clip_loss", 1.0)
    total = total + dense_loss * w.get("clip_dense_loss", 0.0)
    total = total + mlm * w.get("masking_language", 0.0)

    top1, top5 = topk_accuracy(logits_i, labels_acc)
    return total, {"loss": total, "clip_loss": clip_loss,
                   "clip_dense_loss": dense_loss, "text_mlm_loss": mlm,
                   "top1": top1, "top5": top5, "logit_scale": scale}


def defilip_losses(out, cfg, axis_name, *, nn_text=None, nn_text_aug=None,
                   nn_simsiam=None, step=0, total_steps=1, pair_loss=None
                   ) -> Tuple[jax.Array, Metrics]:
    """defilip_solver.py:462-480: DeCLIP assembly + `filip` dense term."""
    w = dict(cfg.get("clip_simsiam_loss_weight", {}) or {})
    total, metrics = declip_losses(
        out, cfg, axis_name, nn_text=nn_text, nn_text_aug=nn_text_aug,
        nn_simsiam=nn_simsiam, step=step, total_steps=total_steps,
        pair_loss=pair_loss,
    )
    labels = infonce_labels(out["image_embed_1"].shape[0], axis_name)

    filip_loss = jnp.zeros(())
    if "dense_image_1" in out:
        # full-token query x gathered top-k-selected key (filip.py:92-105)
        late_interaction = dispatch_late_interaction(cfg)
        ds = out["logit_scale_dense"]
        d_i1, d_t = out["dense_image_1"], out["dense_text"]
        g_dt = gather_features(out["dense_text_sel"], axis_name)
        g_di1 = gather_features(out["dense_image_1_sel"], axis_name)
        l_i = late_interaction(d_i1, g_dt, ds)
        l_t = late_interaction(d_t, g_di1, ds)
        filip_loss = clip_infonce(l_i, l_t, labels)
        if "dense_image_2" in out:  # dense_aug 4-way (defilip.py:336-339)
            # each pairing gathers ITS OWN per-pairing token selections
            # (the reference re-runs select_topk inside every
            # get_weighted_dense_logits call)
            d_i2, d_ta = out["dense_image_2"], out["dense_text_aug"]
            aug_terms = []
            for (dq_i, dq_t), key in (
                ((d_i2, d_t), "dense_sel_i2_t"),
                ((d_i1, d_ta), "dense_sel_i1_ta"),
                ((d_i2, d_ta), "dense_sel_i2_ta"),
            ):
                s_img, s_txt = out[key]
                aug_terms.append(clip_infonce(
                    late_interaction(
                        dq_i, gather_features(s_txt, axis_name), ds),
                    late_interaction(
                        dq_t, gather_features(s_img, axis_name), ds),
                    labels,
                ))
            filip_loss = (filip_loss + sum(aug_terms)) / 4

    # reference adds the filip term only in the weight-type-None branch
    # (defilip_solver.py:541-543)
    if w.get("type") is None:
        total = total + filip_loss * w.get("filip", 0.0)
    metrics.update({"loss": total, "filip_loss": filip_loss})
    return total, metrics


def simclr_losses(out, axis_name, *, temperature: float = 0.5
                  ) -> Tuple[jax.Array, Metrics]:
    """SimCLR NT-Xent over the two weak views (simclr_builder.py). Under
    SPMD the feature arrays are logically global, so the plain NT-Xent IS
    the gathered loss; under shard_map the gathered variant is used."""
    z1, z2 = out["q"], out["z2"]
    if axis_name is None:
        total = L.nt_xent(z1, z2, temperature)
    else:
        g1 = gather_features(z1, axis_name)
        g2 = gather_features(z2, axis_name)
        labels = infonce_labels(z1.shape[0], axis_name)
        total = L.nt_xent_gather(z1, g1, z2, g2, labels, temperature)
    return total, {"loss": total, "simclr_loss": total}


def moco_losses(out, axis_name, *, k, queue, temperature: float = 0.07,
                clsa_ratio: float = 1.0, clsa_avg: bool = True
                ) -> Tuple[jax.Array, Metrics]:
    """MoCo InfoNCE against the momentum-key + queue negatives, plus CLSA's
    DDM terms on the strong views when present (moco_builder.py:133-161,
    clsa_builder.py:110-180)."""
    q = out["q"]

    def logits_of(feats):
        l_pos = jnp.einsum("nd,nd->n", feats, k)[:, None]
        l_neg = jnp.einsum(
            "nd,kd->nk", feats, queue, preferred_element_type=jnp.float32)
        return jnp.concatenate([l_pos, l_neg], axis=1).astype(
            jnp.float32) / temperature

    logits_weak = logits_of(q)
    labels = jnp.zeros((q.shape[0],), jnp.int32)
    logp = jax.nn.log_softmax(logits_weak, axis=-1)
    contrastive = -logp[:, 0].mean()

    ddm = jnp.zeros(())
    strong = out.get("q_strong", ())
    if strong:
        # -P(weak) . log P(strong) per strong view (clsa_builder.py:158-172).
        # NOTE: the reference backpropagates through P(weak) too (p_weak is
        # softmax of the grad-carrying q logits, clsa_builder.py:157) — no
        # stop-gradient here on purpose.
        p_weak = jax.nn.softmax(logits_weak, axis=-1)
        for q_s in strong:
            logp_s = jax.nn.log_softmax(logits_of(q_s), axis=-1)
            ddm = ddm - jnp.einsum("nk,nk->n", p_weak, logp_s).mean()

    total = contrastive + clsa_ratio * ddm
    if strong and clsa_avg:  # clsa_builder.py:174-176
        total = total / (len(strong) + 1)
    top1 = 100.0 * (logits_weak.argmax(-1) == labels).mean()
    metrics = {"loss": total, "moco_loss": contrastive, "top1": top1}
    if strong:
        metrics["ddm_loss"] = ddm
    return total, metrics
