"""The framework must LEARN, not just run (VERDICT r2 missing #2).

A procedural dataset whose captions describe generable image attributes —
colored shapes on a dark background, caption "a {color} {shape}" — trained
with the real model_entry CLIP + optim_entry AdamW + make_train_step for a
few hundred steps, then evaluated zero-shot CLIP-style (encode the 16
class prompts, classify HELD-OUT renderings by cosine similarity). Chance
is 1/16 = 6.25%; the run must reach far above it.

Position/size/shade jitter makes memorization of exact pixels impossible,
so above-chance zero-shot requires genuinely aligned image/text features —
the reference's operational QC ("the run converges",
clip_solver.py:675-737) distilled into a deterministic test.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from declip_tpu.data.synthetic_shapes import CLASSES, render

RES = 32


def _render(rng: np.random.Generator, color: str, shape: str) -> np.ndarray:
    return render(rng, color, shape, res=RES)


def _batch(rng, tok, n):
    idx = rng.integers(0, len(CLASSES), n)
    imgs = np.stack([_render(rng, *CLASSES[i]) for i in idx])
    caps = [f"a {c} {s}" for c, s in (CLASSES[i] for i in idx)]
    return {
        "images": jnp.asarray(imgs),
        "tokens": jnp.asarray(tok.tokenize(caps)),
    }, idx


def test_clip_learns_colored_shapes():
    from declip_tpu.config import parse_config
    from declip_tpu.models import model_entry
    from declip_tpu.optim import optim_entry, scheduler_entry
    from declip_tpu.tokenizer import get_tokenizer
    from declip_tpu.train import make_train_step, new_train_state

    tok = get_tokenizer(None)  # byte-fallback vocab, hermetic
    model = model_entry({
        "type": "clip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 32, "input_resolution": RES,
                             "patch_size": 8, "width": 64, "layers": 2,
                             "heads": 2, "freeze_conv1": False},
            "text_encode": {"embed_dim": 32, "transformer_width": 64,
                            "transformer_heads": 2, "transformer_layers": 2,
                            "vocab_size": tok.vocab_size},
            "clip": {"use_allgather": False},
        },
    })
    steps, bsz = 220, 64
    rng = np.random.default_rng(0)
    probe, _ = _batch(rng, tok, bsz)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), probe, train=True))()
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 5e-4, "warmup_lr": 2e-3,
                                      "warmup_steps": 20}}, max_iter=steps)
    tx = optim_entry(
        {"type": "AdamW", "kwargs": {"lr": 5e-4, "weight_decay": 0.02}},
        variables["params"], sched,
        pconfig={"ln_w": {"weight_decay": 0}, "ln_b": {"weight_decay": 0},
                 "bias": {"weight_decay": 0},
                 "logit_scale": {"weight_decay": 0}})
    cfg = parse_config(
        "grad_clip: {type: logit_scale_param_value, value: 2, max_value: 5}")
    state = new_train_state(
        params=variables["params"], batch_stats={},
        opt_state=tx.init(variables["params"]))
    step = jax.jit(make_train_step(model, tx, cfg, sched),
                   donate_argnums=(0,))

    first_loss = None
    for i in range(steps):
        batch, _ = _batch(rng, tok, bsz)
        state, metrics = step(state, batch)
        if i == 0:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert np.isfinite(last_loss)
    assert last_loss < first_loss - 1.0, (first_loss, last_loss)

    # zero-shot on held-out renderings: encode the 16 prompts once,
    # classify by cosine sim (clip_solver.py:675-737 protocol, distilled)
    prompts = [f"a {c} {s}" for c, s in CLASSES]
    v = {"params": state.params}
    t_feat = jax.jit(
        lambda p, t: model.apply(p, t, method="encode_text"))(
            v, jnp.asarray(tok.tokenize(prompts)))
    t_feat = t_feat / (jnp.linalg.norm(t_feat, axis=-1, keepdims=True)
                       + 1e-10)
    eval_rng = np.random.default_rng(999)  # held-out stream
    n_eval = 256
    idx = eval_rng.integers(0, len(CLASSES), n_eval)
    imgs = np.stack([_render(eval_rng, *CLASSES[i]) for i in idx])
    i_feat = jax.jit(
        lambda p, x: model.apply(p, x, train=False, method="encode_image"))(
            v, jnp.asarray(imgs))
    i_feat = i_feat / jnp.linalg.norm(i_feat, axis=-1, keepdims=True)
    pred = np.asarray(jnp.argmax(i_feat @ t_feat.T, axis=-1))
    top1 = float((pred == idx).mean())
    # chance = 6.25%; a learning run lands far above
    assert top1 > 0.40, f"zero-shot top-1 {top1:.1%} — not learning"
