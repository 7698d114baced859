"""Seed-matched multi-step training-dynamics parity vs the reference.

The reference's product is its training behavior; piecewise parity (forward
goldens, loss/optim/scheduler unit goldens) does not prove the COMPOSED loop
matches. Here we drive the reference torch training math — model forward +
ClipInfoCELoss + param_group_all/optim_entry AdamW + Cosine scheduler +
post-step logit-scale clamp, i.e. the loop body of
prototype/solver/clip_solver.py:380-620 — and our jitted train step, from
identical initial weights (convert_pth) and an identical batch stream, and
assert per-step loss/lr trajectories and the final parameters agree.

Everything runs fp32 on CPU (conftest pins highest matmul precision);
tolerances cover fp32 op-order noise only.
"""

import copy

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ref_compat

pytestmark = pytest.mark.skipif(
    not ref_compat.available(), reason="reference tree not mounted"
)

TINY = dict(width=64, layers=2, heads=2)
EMBED = 32
RES = 64
B = 8
N_STEPS = 12

# lr large enough that 12 steps move params visibly; cosine decays fast so
# the schedule trajectory is exercised too. The optimizer lr MUST equal the
# scheduler base_lr — the reference scheduler scales groups by
# target/base_lr and the solver enforces it (clip_solver.py:242).
SCHED_KW = dict(base_lr=1e-3, warmup_lr=2e-3, warmup_steps=4, min_lr=1e-5)
OPT_KW = dict(lr=SCHED_KW["base_lr"], weight_decay=0.1, betas=(0.9, 0.98),
              eps=1e-8)
PCONFIG = {
    "ln_w": {"weight_decay": 0},
    "ln_b": {"weight_decay": 0},
    "bias": {"weight_decay": 0},
    "logit_scale": {"weight_decay": 0},
}
# brackets the ln(1/0.07)=2.659 init so the reference's pre-backward clamp
# (clip_solver.py:507-508) is a no-op on step 1; the guard's boundary math
# itself is covered by test_train_step
GRAD_CLIP = {"type": "logit_scale_param_value", "value": 2.0, "max_value": 6.0}

CAPTIONS = [
    "the cat and the dog",
    "a photo of the cat",
    "the dog in the thing",
    "a cat of a dog",
    "the thing and a cat",
    "a dog and the thing",
    "the cat in a photo",
    "a thing of the dog",
]


@pytest.fixture(scope="module")
def bpe_path(tmp_path_factory):
    return ref_compat.install_reference(tmp_path_factory.mktemp("bpe"))


def _image_stream():
    rng = np.random.default_rng(42)
    return [
        rng.normal(size=(B, RES, RES, 3)).astype(np.float32) * 0.5
        for _ in range(N_STEPS)
    ]


def _ref_model(bpe_path):
    import torch
    from prototype.model.clip import clip_vitb32

    torch.manual_seed(0)
    return clip_vitb32(
        image_encode=dict(embed_dim=EMBED, input_resolution=RES,
                          patch_size=32, **TINY),
        text_encode=dict(embed_dim=EMBED, transformer_width=64,
                         transformer_heads=2, transformer_layers=2,
                         text_encode_type="Transformer", bpe_path=bpe_path,
                         text_model_utils={"random": False, "freeze": False}),
        clip=dict(use_allgather=False),
    )


def _run_reference(bpe_path, images):
    """The clip_solver loop body, single process (world_size 1)."""
    import torch
    from prototype.loss_functions import ClipInfoCELoss
    from prototype.lr_scheduler import scheduler_entry as ref_sched_entry
    from prototype.optimizer import optim_entry as ref_optim_entry
    from prototype.utils.misc import param_group_all

    class _Node(dict):
        __getattr__ = dict.__getitem__
        __setattr__ = dict.__setitem__

    model = _ref_model(bpe_path).train()
    init_state = copy.deepcopy(model.state_dict())

    param_group, _ = param_group_all(model, PCONFIG)
    opt = ref_optim_entry(
        {"type": "AdamW",
         "kwargs": {"params": param_group, "amsgrad": False, **OPT_KW}})
    sched = ref_sched_entry(_Node(
        type="Cosine",
        kwargs=_Node(optimizer=opt, last_iter=0, max_iter=N_STEPS, **SCHED_KW),
    ))
    criterion = ClipInfoCELoss()

    losses, lrs = [], []
    for i, img in enumerate(images):
        curr_step = 1 + i  # start_step = last_iter + 1 (clip_solver.py:374)
        sched.step(curr_step)
        lrs.append(sched.get_lr()[0])
        batch = {
            "images": torch.tensor(img.transpose(0, 3, 1, 2)),
            "captions": [[c] for c in CAPTIONS],
        }
        logits_i, logits_t = model(batch)
        loss, _ = criterion(logits_i, logits_t)
        losses.append(float(loss))
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():  # param_clip_after (clip_solver.py:521-522)
            model.logit_scale.data.clamp_(
                min=GRAD_CLIP["value"], max=GRAD_CLIP["max_value"])
    return init_state, model.state_dict(), np.array(losses), np.array(lrs)


def _our_model(bpe_path):
    from declip_tpu.models import model_entry

    return model_entry({
        "type": "clip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": EMBED, "input_resolution": RES,
                             "patch_size": 32, **TINY},
            "text_encode": {"embed_dim": EMBED, "transformer_width": 64,
                            "transformer_heads": 2, "transformer_layers": 2,
                            "bpe_path": bpe_path},
            "clip": {"use_allgather": False},
        },
    })


def _run_ours(bpe_path, init_state, images):
    from declip_tpu.config import parse_config
    from declip_tpu.convert_pth import torch_state_to_variables
    from declip_tpu.optim import optim_entry, scheduler_entry
    from declip_tpu.tokenizer.bpe import BpeTokenizer
    from declip_tpu.train import make_train_step, new_train_state

    model = _our_model(bpe_path)
    variables = torch_state_to_variables(init_state)
    params = variables["params"]

    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": dict(SCHED_KW)}, max_iter=N_STEPS)
    # the reference ViT freezes conv1 (visual_transformer.py prints
    # "set conv1.requires_grad to False"); mirror the Solver's frozen mask
    from declip_tpu.optim.param_groups import path_prefix_mask

    frozen_paths = model.visual.frozen_param_paths()
    frozen = (path_prefix_mask(params, tuple(frozen_paths))
              if frozen_paths else None)
    tx = optim_entry(
        {"type": "AdamW", "kwargs": dict(OPT_KW)},
        params, sched, pconfig=PCONFIG, grad_clip=GRAD_CLIP,
        frozen_mask=frozen,
    )
    cfg = parse_config("grad_clip: {type: %s, value: %s, max_value: %s}" % (
        GRAD_CLIP["type"], GRAD_CLIP["value"], GRAD_CLIP["max_value"]))
    state = new_train_state(
        params=params, batch_stats={}, opt_state=tx.init(params))
    step = jax.jit(make_train_step(model, tx, cfg, sched))

    tok = BpeTokenizer(bpe_path)
    tokens = jnp.asarray(tok.tokenize(CAPTIONS))
    losses, lrs = [], []
    for img in images:
        batch = {"images": jnp.asarray(img), "tokens": tokens}
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        lrs.append(float(metrics["lr"]))
    return state, np.array(losses), np.array(lrs)


def test_scheduler_trajectory_matches_reference(bpe_path):
    """Our schedule(s) must equal the reference scheduler at curr_step=s+1
    for every step of a fresh run, through warmup AND decay."""
    import torch
    from prototype.lr_scheduler import scheduler_entry as ref_sched_entry

    from declip_tpu.optim import scheduler_entry

    class _Node(dict):
        __getattr__ = dict.__getitem__
        __setattr__ = dict.__setitem__

    for kind, kw in [
        ("Cosine", dict(base_lr=0.1, warmup_lr=0.4, warmup_steps=5,
                        min_lr=0.01)),
        ("Step", dict(base_lr=0.1, warmup_lr=0.4, warmup_steps=5,
                      lr_steps=[10, 20], lr_mults=[0.5, 0.1])),
        ("Poly", dict(base_lr=0.1, warmup_lr=0.4, warmup_steps=5, power=2.0)),
        ("StepDecay", dict(base_lr=0.1, warmup_lr=0.4, warmup_steps=5,
                           step_size=7, decay=0.9)),
    ]:
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=kw["base_lr"])
        ref = ref_sched_entry(_Node(
            type=kind,
            kwargs=_Node(optimizer=opt, last_iter=0, max_iter=30, **kw)))
        ours = scheduler_entry({"type": kind, "kwargs": dict(kw)}, max_iter=30)
        ref_lrs, our_lrs = [], []
        for s in range(28):
            ref.step(s + 1)
            ref_lrs.append(ref.get_lr()[0])
            our_lrs.append(float(ours(s)))
        np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-6, err_msg=kind)


def test_clip_training_dynamics_match_reference(bpe_path):
    images = _image_stream()
    init_state, ref_final, ref_losses, ref_lrs = _run_reference(
        bpe_path, images)
    state, our_losses, our_lrs = _run_ours(bpe_path, init_state, images)

    # our schedule evaluates in fp32 on-device, torch's in float64
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-5)
    # fp32 op-order noise compounds over 12 steps; tolerances measured
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-4)
    # early steps must be tight — the trajectories start identical
    np.testing.assert_allclose(our_losses[:3], ref_losses[:3], rtol=2e-4)

    # final params: export ours to a torch state_dict and diff every leaf
    from declip_tpu.tools.convert import variables_to_torch_state

    ours_torch = variables_to_torch_state(
        {"params": jax.device_get(state.params)})
    for key, ref_v in ref_final.items():
        ref_np = ref_v.detach().cpu().numpy()
        assert key in ours_torch, f"missing exported key {key}"
        ours_np = np.asarray(ours_torch[key])
        assert ours_np.shape == ref_np.shape, key
        if key.endswith("attn.in_proj_bias"):
            # the key-bias third has EXACTLY zero theoretical gradient
            # (a constant added to every key cancels in softmax), so Adam
            # normalizes fp32 roundoff into full-size random-direction
            # steps — it drifts equally in two torch runs with different
            # op order. Functionally irrelevant; compare q and v thirds.
            w = ref_np.shape[0] // 3
            ref_np = np.concatenate([ref_np[:w], ref_np[2 * w:]])
            ours_np = np.concatenate([ours_np[:w], ours_np[2 * w:]])
        scale = max(np.abs(ref_np).max(), 1e-3)
        err = np.abs(ours_np - ref_np).max() / scale
        assert err < 5e-3, f"{key}: rel err {err:.2e} after {N_STEPS} steps"
    # at least one param must have actually moved appreciably from init
    moved = max(
        np.abs(v.detach().cpu().numpy()
               - init_state[k].detach().cpu().numpy()).max()
        for k, v in ref_final.items())
    assert moved > 1e-3, "reference run did not move params — test is vacuous"

    # functional check (invariant-respecting): both trained models must map
    # a probe batch to near-identical logits
    import torch

    ref_model = _ref_model(bpe_path)
    ref_model.load_state_dict(ref_final)
    ref_model.eval()
    probe = images[0]
    with torch.no_grad():
        ref_logits, _ = ref_model(
            {"images": torch.tensor(probe.transpose(0, 3, 1, 2)),
             "captions": [[c] for c in CAPTIONS]})
    from declip_tpu.models import model_entry
    from declip_tpu.tokenizer.bpe import BpeTokenizer

    tok = BpeTokenizer(bpe_path)
    model = _our_model(bpe_path)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        {"params": state.params},
        {"images": jnp.asarray(probe),
         "tokens": jnp.asarray(tok.tokenize(CAPTIONS))})
    our_logits = np.asarray(
        out["logit_scale"] * out["image_embed"] @ out["text_embed"].T)
    np.testing.assert_allclose(
        our_logits, ref_logits.numpy(), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------- DeCLIP

DECLIP_W = {"clip_loss": 0.4, "nn_text": 0.2, "simsiam_loss": 0.2,
            "masking_language": 0.2}
BANK_SIZE = 64  # multiple of B so ref/our ring-wrap semantics coincide


def _det_text_aug(caption):
    """Deterministic stand-in for the reference's EDA ops (word reverse)."""
    return " ".join(caption.split()[::-1])


def _det_mask_positions(raw_tokens, special):
    """Deterministic MLM mask: every 3rd non-special position (i % 3 == 1)."""
    return [i for i, t in enumerate(raw_tokens)
            if t not in special and i % 3 == 1]


def _patch_reference_determinism(monkeypatch):
    """Replace the reference's EDA + MLM randomness with the deterministic
    rules above so both frameworks see identical text streams."""
    import torch
    import prototype.model.declip as ref_declip
    import prototype.model.text_encoder.text_transformer as ref_tt

    monkeypatch.setattr(ref_declip, "choice", lambda ops: ops[0])

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

    # single-process collectives for the vendored linklink (use_allgather
    # must be True — DECLIP's non-gather branch raises, declip.py:300-302)
    import linklink as link

    monkeypatch.setattr(
        link, "allgather",
        lambda ys, t: [y.copy_(t) for y in ys] and None)
    monkeypatch.setattr(link, "allreduce", lambda t, *a, **k: t)


class _DetEda:
    def __getattr__(self, name):  # synonym_replacement / random_swap / ...
        return _det_text_aug


def _ref_declip_model(bpe_path):
    import torch
    from prototype.model.declip import declip_vitb32

    torch.manual_seed(0)
    model = declip_vitb32(
        image_encode=dict(embed_dim=EMBED, input_resolution=RES,
                          patch_size=32, **TINY),
        text_encode=dict(embed_dim=EMBED, transformer_width=64,
                         transformer_heads=2, transformer_layers=2,
                         text_encode_type="Transformer", bpe_path=bpe_path,
                         text_model_utils={"random": False, "freeze": False}),
        clip=dict(use_allgather=True, text_mask_type="MLM",
                  return_nn_bank=True, feature_dim=EMBED,
                  nn_size=BANK_SIZE, nn_topk=1),
    )
    model.emd = _DetEda()
    # bank init is lazy (memory_bank.py:53-68); force it under the seed so
    # the same buffer can be copied into our BankState
    model.nn_replacer_text._init_memory_bank(EMBED)
    model.nn_replacer_img._init_memory_bank(EMBED)
    return model


def _run_reference_declip(bpe_path, images):
    """declip_solver.py:415-533 loop body, single process."""
    import torch
    from prototype.loss_functions import ClipInfoCELoss, SimsiamLoss
    from prototype.lr_scheduler import scheduler_entry as ref_sched_entry
    from prototype.optimizer import optim_entry as ref_optim_entry
    from prototype.utils.misc import param_group_all

    class _Node(dict):
        __getattr__ = dict.__getitem__
        __setattr__ = dict.__setitem__

    model = _ref_declip_model(bpe_path).train()
    init_state = copy.deepcopy(model.state_dict())
    init_bank = model.nn_replacer_text.bank.clone()

    pconfig = dict(PCONFIG, bn_w={"weight_decay": 0}, bn_b={"weight_decay": 0})
    param_group, _ = param_group_all(model, pconfig)
    opt = ref_optim_entry(
        {"type": "AdamW",
         "kwargs": {"params": param_group, "amsgrad": False, **OPT_KW}})
    sched = ref_sched_entry(_Node(
        type="Cosine",
        kwargs=_Node(optimizer=opt, last_iter=0, max_iter=N_STEPS, **SCHED_KW),
    ))
    criterion = ClipInfoCELoss()
    simsiam_criterion = SimsiamLoss()

    losses = []
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
                     + criterion(li1a, lt1a)[0] + criterion(li2a, lt2a)[0]) / 4
        mlm_loss = od["text_self_supervised"]
        lnn1, lnn2, lnn1a, lnn2a = od["nn_text_logits"]
        nn_loss = (criterion(lnn1, lnn1a)[0] + criterion(lnn2, lnn2a)[0]) / 2
        simsiam_loss = simsiam_criterion(p1, z1, p2, z2)
        loss = (clip_loss * DECLIP_W["clip_loss"]
                + simsiam_loss * DECLIP_W["simsiam_loss"]
                + mlm_loss * DECLIP_W["masking_language"]
                + nn_loss * DECLIP_W["nn_text"])
        losses.append(float(loss.detach()))
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            model.logit_scale.data.clamp_(
                min=GRAD_CLIP["value"], max=GRAD_CLIP["max_value"])
    return init_state, init_bank, model, np.array(losses)


def _declip_batches(bpe_path, images):
    """Pre-compute the identical token streams our pipeline would feed."""
    from declip_tpu.tokenizer.bpe import BpeTokenizer

    tok = BpeTokenizer(bpe_path)
    sot, eot, mask_id = tok.sot_id, tok.eot_id, tok.mask_id
    special = {sot, eot, mask_id}

    def encode_all(caps, masked):
        toks = np.zeros((len(caps), 77), np.int32)
        labels = np.full((len(caps), 77), -100, np.int32)
        for r, c in enumerate(caps):
            raw = [sot] + tok.encode(c) + [eot]
            if len(raw) > 77:
                raw = [raw[0]] + raw[1:76] + [raw[-1]]
            if masked:
                for p in _det_mask_positions(raw, special):
                    labels[r, p] = raw[p]
                    raw[p] = mask_id
            toks[r, :len(raw)] = raw
        return toks, labels

    tokens, _ = encode_all(CAPTIONS, masked=False)
    mlm_tokens, mlm_labels = encode_all(CAPTIONS, masked=True)
    tokens_aug, _ = encode_all([_det_text_aug(c) for c in CAPTIONS],
                               masked=False)
    batches = []
    for i, img in enumerate(images):
        batches.append({
            "images": jnp.asarray(
                np.concatenate([img, images[(i + 1) % N_STEPS]], axis=-1)),
            "tokens": jnp.asarray(tokens),
            "tokens_aug": jnp.asarray(tokens_aug),
            "mlm_tokens": jnp.asarray(mlm_tokens),
            "mlm_labels": jnp.asarray(mlm_labels),
        })
    return batches


def _run_ours_declip(bpe_path, init_state, init_bank, images):
    from declip_tpu.config import parse_config
    from declip_tpu.convert_pth import torch_state_to_variables
    from declip_tpu.models import model_entry
    from declip_tpu.models.memory_bank import BankState
    from declip_tpu.optim import optim_entry, scheduler_entry
    from declip_tpu.optim.param_groups import path_prefix_mask
    from declip_tpu.train import make_train_step, new_train_state

    model = model_entry({
        "type": "declip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": EMBED, "input_resolution": RES,
                             "patch_size": 32, **TINY},
            "text_encode": {"embed_dim": EMBED, "transformer_width": 64,
                            "transformer_heads": 2, "transformer_layers": 2,
                            "bpe_path": bpe_path},
            "clip": {"use_allgather": False, "text_mask_type": "MLM",
                     "return_nn_bank": True, "feature_dim": EMBED,
                     "nn_size": BANK_SIZE, "nn_topk": 1,
                     "mlm_max_positions": 0},
        },
    })
    variables = torch_state_to_variables(init_state)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": dict(SCHED_KW)}, max_iter=N_STEPS)
    pconfig = dict(PCONFIG, bn_w={"weight_decay": 0}, bn_b={"weight_decay": 0})
    frozen_paths = model.visual.frozen_param_paths()
    frozen = (path_prefix_mask(params, tuple(frozen_paths))
              if frozen_paths else None)
    tx = optim_entry(
        {"type": "AdamW", "kwargs": dict(OPT_KW)},
        params, sched, pconfig=pconfig, grad_clip=GRAD_CLIP,
        frozen_mask=frozen,
    )
    cfg = parse_config("""
grad_clip: {type: %s, value: %s, max_value: %s}
clip_simsiam_loss_weight: {clip_loss: %s, nn_text: %s, simsiam_loss: %s, masking_language: %s}
data: {train: {image_text_two_view: True}}
""" % (GRAD_CLIP["type"], GRAD_CLIP["value"], GRAD_CLIP["max_value"],
       DECLIP_W["clip_loss"], DECLIP_W["nn_text"], DECLIP_W["simsiam_loss"],
       DECLIP_W["masking_language"]))
    bank = BankState(
        jnp.asarray(init_bank.numpy().T), jnp.zeros((), jnp.int32))
    state = new_train_state(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params),
        bank_text=bank)
    step = jax.jit(make_train_step(
        model, tx, cfg, sched, total_steps=N_STEPS))

    losses = []
    for batch in _declip_batches(bpe_path, images):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    return state, np.array(losses)


def test_declip_training_dynamics_match_reference(bpe_path, monkeypatch):
    """The full DeCLIP composition — 2x2 CLIP terms x EDA text aug, MLM on
    masked main forward, SimSiam heads with BatchNorm, NN-bank query +
    aug-then-orig enqueue, AdamW param groups, cosine schedule, logit
    clamp — must track the reference over N_STEPS steps."""
    _patch_reference_determinism(monkeypatch)
    images = _image_stream()
    init_state, init_bank, ref_model, ref_losses = _run_reference_declip(
        bpe_path, images)
    state, our_losses = _run_ours_declip(
        bpe_path, init_state, init_bank, images)

    np.testing.assert_allclose(our_losses[:3], ref_losses[:3], rtol=5e-4)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3, atol=5e-4)

    # bank contents after N steps must match (exercises enqueue order+wrap)
    ours_bank = np.asarray(state.bank_text.bank)
    ref_bank = ref_model.nn_replacer_text.bank.detach().numpy().T
    np.testing.assert_allclose(ours_bank, ref_bank, rtol=5e-2, atol=5e-3)
