"""Training-dynamics parity for SLIP / FILIP / DeFILIP (VERDICT r3 item 2).

Same seed-matched N-step harness as tests/test_training_dynamics.py (CLIP +
DeCLIP): drive the reference torch loop body — model forward + the solver's
criterion assembly + param_group_all/AdamW + Cosine schedule + post-step
logit-scale clamp — and our jitted train step from identical initial weights
and identical batches, and assert the per-step loss trajectories (total AND
per-term) agree.

Reference loop bodies mirrored here:
- SLIP:    prototype/solver/slip_solver.py:440-512 (clip + NT_Xent_gather
           SimCLR on the two strong views)
- FILIP:   prototype/solver/filip_solver.py:440-523 (clip + dense
           late-interaction InfoNCE; main text forward on MASKED tokens with
           NO mlm loss — filip.py:117 never emits text_self_supervised)
- DeFILIP: prototype/solver/defilip_solver.py:440-545 (full DeCLIP assembly
           + the `filip` dense term, added only in the weight-type-None
           branch, defilip_solver.py:541-543)

Everything runs fp32 on CPU (conftest pins highest matmul precision).
"""

import copy

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ref_compat
from test_training_dynamics import (
    B,
    CAPTIONS,
    EMBED,
    GRAD_CLIP,
    N_STEPS,
    OPT_KW,
    PCONFIG,
    SCHED_KW,
    TINY,
    _det_mask_positions,
    _det_text_aug,
    _DetEda,
    _image_stream,
)

pytestmark = pytest.mark.skipif(
    not ref_compat.available(), reason="reference tree not mounted"
)

RES = 64  # SLIP (patch 32 -> 4 tokens; no dense head)
# FILIP/DeFILIP: get_weighted_dense_logits hardcodes top_k=16
# (filip.py:72, defilip.py:225), so the image side needs >16 tokens:
# 80/16 -> 5x5 = 25 patch tokens, top-16 selection is a real selection.
DENSE_RES = 80
DENSE_PATCH = 16
DENSE_DIM = 32


@pytest.fixture(scope="module")
def bpe_path(tmp_path_factory):
    return ref_compat.install_reference(tmp_path_factory.mktemp("bpe"))


class _Node(dict):
    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__


def _patch_link_world1(monkeypatch):
    """Single-process collectives for the vendored linklink (the reference
    forwards require use_allgather=True — slip.py:276, filip.py:130)."""
    import linklink as link

    monkeypatch.setattr(
        link, "allgather", lambda ys, t: [y.copy_(t) for y in ys] and None)
    monkeypatch.setattr(link, "allreduce", lambda t, *a, **k: t)


def _patch_det_mlm(monkeypatch):
    """Deterministic MaskTokens (same rule as the DeCLIP dynamics test)."""
    import torch
    import prototype.model.text_encoder.text_transformer as ref_tt

    def det_mask_tokens(tokens, mask_type, mask_token, special_tokens=None,
                        tokenizer_length=None, **kw):
        assert mask_type == "MLM"
        labels = tokens.clone()
        inputs = tokens.clone()
        pos = _det_mask_positions(tokens.tolist(), set(special_tokens))
        masked = torch.zeros_like(tokens, dtype=torch.bool)
        masked[pos] = True
        labels[~masked] = -100
        inputs[masked] = mask_token
        return inputs, labels

    monkeypatch.setattr(ref_tt, "MaskTokens", det_mask_tokens)


def _ref_towers(bpe_path, *, res=RES, patch=32):
    from prototype.model.image_encoder.visual_transformer import (
        visual_transformer_B32,
    )
    from prototype.model.text_encoder.text_transformer import text_transformers

    image_encode = visual_transformer_B32(
        embed_dim=EMBED, input_resolution=res, patch_size=patch, **TINY)
    text_encode = text_transformers(
        embed_dim=EMBED, transformer_width=64, transformer_heads=2,
        transformer_layers=2, text_encode_type="Transformer",
        bpe_path=bpe_path, text_model_utils={"random": False, "freeze": False})
    return image_encode, text_encode


def _ref_optim(model, pconfig):
    import torch
    from prototype.lr_scheduler import scheduler_entry as ref_sched_entry
    from prototype.optimizer import optim_entry as ref_optim_entry
    from prototype.utils.misc import param_group_all

    param_group, _ = param_group_all(model, pconfig)
    opt = ref_optim_entry(
        {"type": "AdamW",
         "kwargs": {"params": param_group, "amsgrad": False, **OPT_KW}})
    sched = ref_sched_entry(_Node(
        type="Cosine",
        kwargs=_Node(optimizer=opt, last_iter=0, max_iter=N_STEPS, **SCHED_KW),
    ))
    return opt, sched


def _ref_post_step(model, opt, loss):
    import torch

    opt.zero_grad()
    loss.backward()
    opt.step()
    with torch.no_grad():
        model.logit_scale.data.clamp_(
            min=GRAD_CLIP["value"], max=GRAD_CLIP["max_value"])


def _our_optim(model, params, pconfig, max_iter=N_STEPS):
    from declip_tpu.optim import optim_entry, scheduler_entry
    from declip_tpu.optim.param_groups import path_prefix_mask

    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": dict(SCHED_KW)}, max_iter=max_iter)
    frozen_paths = model.visual.frozen_param_paths()
    frozen = (path_prefix_mask(params, tuple(frozen_paths))
              if frozen_paths else None)
    tx = optim_entry(
        {"type": "AdamW", "kwargs": dict(OPT_KW)},
        params, sched, pconfig=pconfig, grad_clip=GRAD_CLIP,
        frozen_mask=frozen,
    )
    return tx, sched


def _tokens(bpe_path, caps, *, masked=False):
    """Token (+ MLM label) arrays exactly as our pipeline feeds them."""
    from declip_tpu.tokenizer.bpe import BpeTokenizer

    tok = BpeTokenizer(bpe_path)
    special = {tok.sot_id, tok.eot_id, tok.mask_id}
    toks = np.zeros((len(caps), 77), np.int32)
    labels = np.full((len(caps), 77), -100, np.int32)
    for r, c in enumerate(caps):
        raw = [tok.sot_id] + tok.encode(c) + [tok.eot_id]
        if len(raw) > 77:
            raw = [raw[0]] + raw[1:76] + [raw[-1]]
        if masked:
            for p in _det_mask_positions(raw, special):
                labels[r, p] = raw[p]
                raw[p] = tok.mask_id
        toks[r, :len(raw)] = raw
    return toks, labels


# ------------------------------------------------------------------- SLIP

SLIP_W = {"clip_loss": 1.0, "simclr_loss": 1.0}


def _slip_streams():
    rng = np.random.default_rng(7)
    mk = lambda: [  # noqa: E731
        rng.normal(size=(B, RES, RES, 3)).astype(np.float32) * 0.5
        for _ in range(N_STEPS)
    ]
    return mk(), mk(), mk()  # base, view1, view2


def _run_reference_slip(bpe_path, streams):
    import torch
    from prototype.loss_functions import ClipInfoCELoss, NT_Xent_gather
    from prototype.model.slip import SLIP as RefSLIP

    torch.manual_seed(0)
    image_encode, text_encode = _ref_towers(bpe_path)
    # mirrors slip_vitb32 (slip.py:299-306) with explicit tiny dims:
    # feature_dim = the ViT pre-projection width feature the sim head eats
    model = RefSLIP(image_encode, text_encode, use_allgather=True,
                    feature_dim=TINY["width"], sim_dim=DENSE_DIM,
                    return_sim=True).train()
    init_state = copy.deepcopy(model.state_dict())

    pconfig = dict(PCONFIG, bn_w={"weight_decay": 0}, bn_b={"weight_decay": 0})
    opt, sched = _ref_optim(model, pconfig)
    criterion = ClipInfoCELoss()
    simclr_criterion = NT_Xent_gather(B)  # temperature 0.1 (nt_xent.py:52)

    losses, simclr_losses = [], []
    base, v1, v2 = streams
    for i in range(N_STEPS):
        sched.step(1 + i)
        batch = {
            "images": torch.tensor(
                np.concatenate([base[i], v1[i], v2[i]], axis=-1)
                .transpose(0, 3, 1, 2)),
            "captions": [[c] for c in CAPTIONS],
        }
        od = model(batch, return_dict=True)
        li, lt = od["logits"]
        clip_loss, _ = criterion(li, lt)
        s1, gs1, s2, gs2 = od["sim_features"]
        simclr_loss = simclr_criterion(s1, gs1, s2, gs2)
        loss = (clip_loss * SLIP_W["clip_loss"]
                + simclr_loss * SLIP_W["simclr_loss"])
        losses.append(float(loss.detach()))
        simclr_losses.append(float(simclr_loss.detach()))
        _ref_post_step(model, opt, loss)
    return init_state, np.array(losses), np.array(simclr_losses)


def _run_ours_slip(bpe_path, init_state, streams):
    from declip_tpu.config import parse_config
    from declip_tpu.convert_pth import torch_state_to_variables
    from declip_tpu.models import model_entry
    from declip_tpu.train import make_train_step, new_train_state

    model = model_entry({
        "type": "slip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": EMBED, "input_resolution": RES,
                             "patch_size": 32, **TINY},
            "text_encode": {"embed_dim": EMBED, "transformer_width": 64,
                            "transformer_heads": 2, "transformer_layers": 2,
                            "bpe_path": bpe_path},
            "clip": {"use_allgather": False, "return_sim": True,
                     "feature_dim": TINY["width"], "sim_dim": DENSE_DIM},
        },
    })
    # predictor_sim.bn3 is dead reference machinery: registered even with
    # out_bn=False (slip.py:76-78, on hidden_dim not out_dim — it would
    # crash if ever applied), so it has no flax counterpart
    init_state = {k: v for k, v in init_state.items()
                  if not k.startswith("predictor_sim.bn3")}
    variables = torch_state_to_variables(init_state)
    params = variables["params"]
    pconfig = dict(PCONFIG, bn_w={"weight_decay": 0}, bn_b={"weight_decay": 0})
    tx, sched = _our_optim(model, params, pconfig)
    cfg = parse_config("""
grad_clip: {type: %s, value: %s, max_value: %s}
loss_weight: {clip_loss: %s, simclr_loss: %s}
""" % (GRAD_CLIP["type"], GRAD_CLIP["value"], GRAD_CLIP["max_value"],
       SLIP_W["clip_loss"], SLIP_W["simclr_loss"]))
    state = new_train_state(
        params=params, batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params))
    step = jax.jit(make_train_step(model, tx, cfg, sched))

    tokens, _ = _tokens(bpe_path, CAPTIONS)
    losses, simclr_losses = [], []
    base, v1, v2 = streams
    for i in range(N_STEPS):
        batch = {
            "images": jnp.asarray(
                np.concatenate([base[i], v1[i], v2[i]], axis=-1)),
            "tokens": jnp.asarray(tokens),
        }
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        simclr_losses.append(float(metrics["simclr_loss"]))
    return state, np.array(losses), np.array(simclr_losses)


def test_slip_training_dynamics_match_reference(bpe_path, monkeypatch):
    """CLIP base-view InfoNCE + NT_Xent_gather SimCLR on the two strong
    views (rank masks, sum-reduction/2B), composed with AdamW groups and
    the cosine schedule, must track the reference for N_STEPS steps."""
    _patch_link_world1(monkeypatch)
    streams = _slip_streams()
    init_state, ref_losses, ref_simclr = _run_reference_slip(bpe_path, streams)
    _, our_losses, our_simclr = _run_ours_slip(bpe_path, init_state, streams)

    np.testing.assert_allclose(our_simclr, ref_simclr, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(our_losses[:3], ref_losses[:3], rtol=5e-4)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3, atol=5e-4)


# ------------------------------------------------------------------ FILIP

FILIP_W = {"clip_loss": 0.5, "clip_dense_loss": 1.0, "masking_language": 0.0}


def _filip_images():
    rng = np.random.default_rng(11)
    return [
        rng.normal(size=(B, DENSE_RES, DENSE_RES, 3)).astype(np.float32) * 0.5
        for _ in range(N_STEPS)
    ]


def _run_reference_filip(bpe_path, images):
    import torch
    from prototype.loss_functions import ClipInfoCELoss
    from prototype.model.filip import FILIP as RefFILIP

    torch.manual_seed(0)
    image_encode, text_encode = _ref_towers(
        bpe_path, res=DENSE_RES, patch=DENSE_PATCH)
    # mirrors filip_vitb32 (filip.py:158-165) with tiny dense dims; the
    # factory hardcodes dense_mapping_image=768 so build FILIP directly
    model = RefFILIP(
        image_encode, text_encode, use_allgather=True, return_dense=True,
        select_topk=True, text_mask_type="MLM", feature_dim=EMBED,
        dense_mapping_image=TINY["width"], dense_mapping_language=64,
        dense_embed_dim=DENSE_DIM).train()
    init_state = copy.deepcopy(model.state_dict())

    opt, sched = _ref_optim(model, dict(PCONFIG))
    criterion = ClipInfoCELoss()

    losses, dense_losses = [], []
    for i, img in enumerate(images):
        sched.step(1 + i)
        batch = {
            # filip forward splits [3,3] and uses view 1 (filip.py:111-112)
            "images": torch.tensor(
                np.concatenate([img, img], axis=-1).transpose(0, 3, 1, 2)),
            "captions": [[c] for c in CAPTIONS],
        }
        od = model(batch, return_dict=True)
        li, lt = od["logits"]
        clip_loss, _ = criterion(li, lt)
        ldi, ldt = od["dense_logits"]
        dense_loss, _ = criterion(ldi, ldt)
        # filip_solver.py:507-523; text_self_supervised is never emitted by
        # filip.py's forward, so the masking_language term is exactly 0
        assert "text_self_supervised" not in od
        loss = (clip_loss * FILIP_W["clip_loss"]
                + dense_loss * FILIP_W["clip_dense_loss"])
        losses.append(float(loss.detach()))
        dense_losses.append(float(dense_loss.detach()))
        _ref_post_step(model, opt, loss)
    return init_state, model, np.array(losses), np.array(dense_losses)


def _run_ours_filip(bpe_path, init_state, images):
    from declip_tpu.config import parse_config
    from declip_tpu.convert_pth import torch_state_to_variables
    from declip_tpu.models import model_entry
    from declip_tpu.train import make_train_step, new_train_state

    model = model_entry({
        "type": "filip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": EMBED,
                             "input_resolution": DENSE_RES,
                             "patch_size": DENSE_PATCH, **TINY},
            "text_encode": {"embed_dim": EMBED, "transformer_width": 64,
                            "transformer_heads": 2, "transformer_layers": 2,
                            "bpe_path": bpe_path},
            "clip": {"use_allgather": False, "return_dense": True,
                     "select_topk": True, "top_k": 16,
                     "text_mask_type": "MLM", "feature_dim": EMBED,
                     "dense_embed_dim": DENSE_DIM, "mlm_max_positions": 0},
        },
    })
    variables = torch_state_to_variables(init_state)
    params = variables["params"]
    tx, sched = _our_optim(model, params, dict(PCONFIG))
    cfg = parse_config("""
grad_clip: {type: %s, value: %s, max_value: %s}
clip_simsiam_loss_weight: {clip_loss: %s, clip_dense_loss: %s, masking_language: 0.0}
""" % (GRAD_CLIP["type"], GRAD_CLIP["value"], GRAD_CLIP["max_value"],
       FILIP_W["clip_loss"], FILIP_W["clip_dense_loss"]))
    state = new_train_state(
        params=params, batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params))
    step = jax.jit(make_train_step(model, tx, cfg, sched))

    mlm_tokens, mlm_labels = _tokens(bpe_path, CAPTIONS, masked=True)
    losses, dense_losses = [], []
    for img in images:
        batch = {
            "images": jnp.asarray(np.concatenate([img, img], axis=-1)),
            "mlm_tokens": jnp.asarray(mlm_tokens),
            "mlm_labels": jnp.asarray(mlm_labels),
        }
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        dense_losses.append(float(metrics["clip_dense_loss"]))
    return state, np.array(losses), np.array(dense_losses)


def test_filip_training_dynamics_match_reference(bpe_path, monkeypatch):
    """CLIP + dense late-interaction InfoNCE (full-token query x gathered
    top-16-selected key, separate logit_scale_dense) on a MASKED main text
    forward must track the reference for N_STEPS steps.

    Known reference delta, excluded from any param comparison: the torch
    model registers text_label_predictor but never runs it (no grads ->
    torch AdamW skips those params entirely); our forward computes the MLM
    head with weight 0, so AdamW's decoupled weight decay shrinks the dead
    head. Loss trajectories are unaffected (the head feeds nothing)."""
    _patch_link_world1(monkeypatch)
    _patch_det_mlm(monkeypatch)
    images = _filip_images()
    init_state, _, ref_losses, ref_dense = _run_reference_filip(
        bpe_path, images)
    _, our_losses, our_dense = _run_ours_filip(bpe_path, init_state, images)

    np.testing.assert_allclose(our_dense, ref_dense, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(our_losses[:3], ref_losses[:3], rtol=5e-4)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------- DeFILIP

DEFILIP_W = {"clip_loss": 0.4, "nn_text": 0.2, "simsiam_loss": 0.2,
             "masking_language": 0.2, "filip": 0.2}
BANK_SIZE = 64


def _patch_defilip_determinism(monkeypatch):
    import prototype.model.defilip as ref_defilip

    monkeypatch.setattr(ref_defilip, "choice", lambda ops: ops[0])


def _run_reference_defilip(bpe_path, images, dense_aug=False):
    import torch
    from prototype.loss_functions import ClipInfoCELoss, SimsiamLoss
    from prototype.model.defilip import DEFILIP as RefDEFILIP

    torch.manual_seed(0)
    image_encode, text_encode = _ref_towers(
        bpe_path, res=DENSE_RES, patch=DENSE_PATCH)
    # mirrors defilip_vitb32 with tiny dims (the yfcc15m recipe:
    # return_filip + return_nn_bank + MLM; dense_aug parametrized — the
    # 4-way dense terms re-select tokens per pairing, defilip.py:336-339)
    model = RefDEFILIP(
        image_encode, text_encode, use_allgather=True, nn_size=BANK_SIZE,
        nn_topk=1, return_nn_bank=True, text_mask_type="MLM",
        feature_dim=EMBED, return_filip=True, dense_aug=dense_aug,
        dense_embed_dim=DENSE_DIM, dense_mapping_image=TINY["width"],
        dense_mapping_language=64)
    model.emd = _DetEda()
    model.nn_replacer_text._init_memory_bank(EMBED)
    model.nn_replacer_img._init_memory_bank(EMBED)
    model = model.train()
    init_state = copy.deepcopy(model.state_dict())
    init_bank = model.nn_replacer_text.bank.clone()

    pconfig = dict(PCONFIG, bn_w={"weight_decay": 0}, bn_b={"weight_decay": 0})
    opt, sched = _ref_optim(model, pconfig)
    criterion = ClipInfoCELoss()
    simsiam_criterion = SimsiamLoss()

    losses, filip_losses = [], []
    for i, img in enumerate(images):
        sched.step(1 + i)
        batch = {
            "images": torch.tensor(
                np.concatenate([img, images[(i + 1) % N_STEPS]], axis=-1)
                .transpose(0, 3, 1, 2)),
            "captions": [[c] for c in CAPTIONS],
        }
        od = model(batch, return_dict=True)
        li1, li2, lt1, lt2 = od["logits"]
        li1a, li2a, lt1a, lt2a = od["logits_aug"]
        p1, p2, z1, z2 = od["simsiam_features"]
        clip_loss = (criterion(li1, lt1)[0] + criterion(li2, lt2)[0]
                     + criterion(li1a, lt1a)[0]
                     + criterion(li2a, lt2a)[0]) / 4
        mlm_loss = od["text_self_supervised"]
        lnn1, lnn2, lnn1a, lnn2a = od["nn_text_logits"]
        nn_loss = (criterion(lnn1, lnn1a)[0] + criterion(lnn2, lnn2a)[0]) / 2
        simsiam_loss = simsiam_criterion(p1, z1, p2, z2)
        ldi, ldt = od["filip"]
        filip_loss, _ = criterion(ldi, ldt)
        if dense_aug:
            # defilip_solver.py:468-480 4-way average
            l2i, l2t, l3i, l3t, l4i, l4t = od["filip_aug"]
            filip_loss = (filip_loss + criterion(l2i, l2t)[0]
                          + criterion(l3i, l3t)[0]
                          + criterion(l4i, l4t)[0]) / 4
        else:
            assert "filip_aug" not in od
        # defilip_solver.py:529-545 weight-type-None branch
        loss = (clip_loss * DEFILIP_W["clip_loss"]
                + simsiam_loss * DEFILIP_W["simsiam_loss"]
                + mlm_loss * DEFILIP_W["masking_language"]
                + nn_loss * DEFILIP_W["nn_text"]
                + filip_loss * DEFILIP_W["filip"])
        losses.append(float(loss.detach()))
        filip_losses.append(float(filip_loss.detach()))
        _ref_post_step(model, opt, loss)
    return (init_state, init_bank, model, np.array(losses),
            np.array(filip_losses))


def _run_ours_defilip(bpe_path, init_state, init_bank, images,
                      dense_aug=False):
    from declip_tpu.config import parse_config
    from declip_tpu.convert_pth import torch_state_to_variables
    from declip_tpu.models import model_entry
    from declip_tpu.models.memory_bank import BankState
    from declip_tpu.train import make_train_step, new_train_state

    model = model_entry({
        "type": "defilip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": EMBED,
                             "input_resolution": DENSE_RES,
                             "patch_size": DENSE_PATCH, **TINY},
            "text_encode": {"embed_dim": EMBED, "transformer_width": 64,
                            "transformer_heads": 2, "transformer_layers": 2,
                            "bpe_path": bpe_path},
            "clip": {"use_allgather": False, "text_mask_type": "MLM",
                     "return_nn_bank": True, "feature_dim": EMBED,
                     "nn_size": BANK_SIZE, "nn_topk": 1,
                     "return_filip": True, "select_topk": True, "top_k": 16,
                     "dense_embed_dim": DENSE_DIM, "dense_aug": dense_aug,
                     "mlm_max_positions": 0},
        },
    })
    variables = torch_state_to_variables(init_state)
    params = variables["params"]
    pconfig = dict(PCONFIG, bn_w={"weight_decay": 0}, bn_b={"weight_decay": 0})
    tx, sched = _our_optim(model, params, pconfig)
    cfg = parse_config("""
grad_clip: {type: %s, value: %s, max_value: %s}
clip_simsiam_loss_weight: {clip_loss: %s, nn_text: %s, simsiam_loss: %s, masking_language: %s, filip: %s}
data: {train: {image_text_two_view: True}}
""" % (GRAD_CLIP["type"], GRAD_CLIP["value"], GRAD_CLIP["max_value"],
       DEFILIP_W["clip_loss"], DEFILIP_W["nn_text"],
       DEFILIP_W["simsiam_loss"], DEFILIP_W["masking_language"],
       DEFILIP_W["filip"]))
    bank = BankState(
        jnp.asarray(init_bank.numpy().T), jnp.zeros((), jnp.int32))
    state = new_train_state(
        params=params, batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params), bank_text=bank)
    step = jax.jit(make_train_step(
        model, tx, cfg, sched, total_steps=N_STEPS))

    tokens, _ = _tokens(bpe_path, CAPTIONS)
    mlm_tokens, mlm_labels = _tokens(bpe_path, CAPTIONS, masked=True)
    tokens_aug, _ = _tokens(bpe_path, [_det_text_aug(c) for c in CAPTIONS])
    losses, filip_losses = [], []
    for i, img in enumerate(images):
        batch = {
            "images": jnp.asarray(
                np.concatenate([img, images[(i + 1) % N_STEPS]], axis=-1)),
            "tokens": jnp.asarray(tokens),
            "tokens_aug": jnp.asarray(tokens_aug),
            "mlm_tokens": jnp.asarray(mlm_tokens),
            "mlm_labels": jnp.asarray(mlm_labels),
        }
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        filip_losses.append(float(metrics["filip_loss"]))
    return state, np.array(losses), np.array(filip_losses)


@pytest.mark.parametrize("dense_aug", [False, True])
def test_defilip_training_dynamics_match_reference(bpe_path, monkeypatch,
                                                   dense_aug):
    """The full DeFILIP composition — DeCLIP's 2x2 CLIP terms + SimSiam +
    MLM + NN-bank, PLUS the dense late-interaction `filip` term gated by
    the weight-type-None branch (defilip_solver.py:541-543) — must track
    the reference over N_STEPS steps, including the word-features quirk
    (dense text = MASKED main pass; dense text_aug = unmasked aug pass,
    defilip.py:290-292,330-333). dense_aug=True additionally exercises the
    4-way dense terms with FRESH per-pairing top-k selection
    (defilip.py:336-339)."""
    _patch_link_world1(monkeypatch)
    _patch_det_mlm(monkeypatch)
    _patch_defilip_determinism(monkeypatch)
    images = _filip_images()
    init_state, init_bank, ref_model, ref_losses, ref_filip = \
        _run_reference_defilip(bpe_path, images, dense_aug)
    state, our_losses, our_filip = _run_ours_defilip(
        bpe_path, init_state, init_bank, images, dense_aug)

    np.testing.assert_allclose(our_filip, ref_filip, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(our_losses[:3], ref_losses[:3], rtol=5e-4)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3, atol=5e-4)

    # bank contents after N steps must match (enqueue order + wrap)
    ours_bank = np.asarray(state.bank_text.bank)
    ref_bank = ref_model.nn_replacer_text.bank.detach().numpy().T
    np.testing.assert_allclose(ours_bank, ref_bank, rtol=5e-2, atol=5e-3)
