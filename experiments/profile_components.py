"""Component-level throughput decomposition on the real chip.

Times the CLIP ViT-B/32 train step's pieces in isolation (image fwd, text
fwd, loss, full fwd, fwd+bwd, optimizer apply) at a given batch size, so
regressions/anomalies (e.g. the B=256-slower-than-B=128 question) can be
localized without a trace viewer.

Usage: python experiments/profile_components.py [--batch 128] [--remat]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from declip_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # force a readback — block_until_ready can no-op through remote tunnels
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--model", default="clip_vitb32",
                    choices=["clip_vitb32", "declip_res50"])
    args = ap.parse_args()

    from declip_tpu.config import parse_config
    from declip_tpu.models import model_entry
    from declip_tpu.models.memory_bank import init_bank, query_topk
    from declip_tpu.optim import optim_entry, scheduler_entry
    from declip_tpu.train import make_train_step, new_train_state

    b = args.batch
    rng = np.random.default_rng(0)
    declip = args.model == "declip_res50"
    if declip:
        model = model_entry({
            "type": "declip_res50",
            "kwargs": {
                "image_encode": {"embed_dim": 1024},
                "text_encode": {"embed_dim": 1024,
                                "checkpoint": args.remat},
                "clip": {"use_allgather": True, "text_mask_type": "MLM",
                         "return_nn_bank": True, "feature_dim": 1024},
                "dtype": "bfloat16",
            },
        })
        labels = np.full((b, 77), -100, np.int32)
        labels[:, 1:12] = 7
        batch = {
            "images": jnp.asarray(
                rng.normal(size=(b, 224, 224, 6)).astype(np.float32)),
            "tokens": jnp.asarray(rng.integers(1, 500, (b, 77)), jnp.int32),
            "tokens_aug": jnp.asarray(
                rng.integers(1, 500, (b, 77)), jnp.int32),
            "mlm_tokens": jnp.asarray(
                rng.integers(1, 500, (b, 77)), jnp.int32),
            "mlm_labels": jnp.asarray(labels),
        }
        cfg = parse_config(
            "clip_simsiam_loss_weight: {clip_loss: 0.4, nn_text: 0.2, "
            "simsiam_loss: 0.2, masking_language: 0.2}\n"
            "data: {train: {image_text_two_view: True}}")
        bank = init_bank(jax.random.PRNGKey(1), 2 ** 16, 1024)
    else:
        model = model_entry({
            "type": "clip_vitb32",
            "kwargs": {
                "image_encode": {"embed_dim": 512, "input_resolution": 224,
                                 "checkpoint": args.remat},
                "text_encode": {"embed_dim": 512, "checkpoint": args.remat},
                "clip": {"use_allgather": True},
                "dtype": "bfloat16",
            },
        })
        batch = {
            "images": jnp.asarray(
                rng.normal(size=(b, 224, 224, 3)).astype(np.float32)),
            "tokens": jnp.asarray(rng.integers(1, 40000, (b, 77)), jnp.int32),
        }
        cfg = {}
        bank = None
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True))()
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                      "warmup_steps": 100}}, max_iter=10000)
    tx = optim_entry({"type": "AdamW", "kwargs": {"lr": 1e-3,
                                                  "weight_decay": 0.1}},
                     params, sched)
    state = new_train_state(params=params, batch_stats=stats,
                            opt_state=tx.init(params), bank_text=bank)

    def vars_of(p):
        return {"params": p, **({"batch_stats": stats} if stats else {})}

    img_fwd = jax.jit(lambda p, x: model.apply(
        vars_of(p), x, train=False, method="encode_image"))
    txt_fwd = jax.jit(lambda p, t: model.apply(
        vars_of(p), t, method="encode_text"))

    def full_loss(p, batch, bank):
        # bank is an ARGUMENT, not a closure: baked in as a constant, the
        # 2^16x1024 fp32 bank inflates the uploaded program past the remote
        # compile tunnel's request limit (HTTP 413)
        from declip_tpu.train import method_losses

        out, _ = model.apply(vars_of(p), batch, train=True,
                             mutable=["batch_stats"])
        if declip:
            nn = tuple(jax.lax.stop_gradient(t)
                       for t in query_topk(bank, out["text_embed"], 1))
            nna = tuple(jax.lax.stop_gradient(t)
                        for t in query_topk(bank, out["text_embed_aug"], 1))
            return method_losses.declip_losses(
                out, cfg, None, nn_text=nn, nn_text_aug=nna)[0]
        return method_losses.clip_losses(out, cfg, None)[0]

    fwd = jax.jit(full_loss)
    fwd_bwd = jax.jit(lambda p, batch, bank:
                      jax.grad(full_loss)(p, batch, bank))
    opt = jax.jit(lambda g, s, p: tx.update(g, s, p))
    step = jax.jit(make_train_step(model, tx, cfg, sched, total_steps=10000))

    print(f"model={args.model} B={b} remat={args.remat}", flush=True)

    def row(name, fn, *a):
        # each component prints as it lands; a component whose program is
        # too big for the remote-compile tunnel (HTTP 413 on the un-rematted
        # fwd+bwd) is reported and skipped instead of killing the run
        try:
            dt = timeit(fn, *a)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:20s} SKIPPED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]})", flush=True)
            return
        print(f"  {name:20s} {dt * 1e3:8.2f} ms   "
              f"{b / dt:10.1f} pairs/s", flush=True)

    # DeCLIP batches carry two stacked views in the channel axis; the tower
    # sees one 3-channel view per call (the train step calls it twice)
    row("image fwd (eval)", img_fwd, params,
        batch["images"][..., : batch["images"].shape[-1] // (2 if declip
                                                             else 1)])
    row("text fwd", txt_fwd, params, batch["tokens"])
    if declip:
        bq = jax.jit(lambda bank, x: query_topk(bank, x, 1))
        emb = jnp.asarray(rng.normal(size=(b, 1024)), jnp.float32)
        row("bank query_topk", bq, bank, emb)
    # per-tower backward decomposition: grad of a pseudo-loss through one
    # tower in TRAIN mode (BN stats mutable), isolating where the step's
    # bwd/fwd ratio comes from (R50 measured ~3.3x overall — theoretical
    # conv bwd is ~2x fwd, so the excess needs localizing)
    one_view = batch["images"][
        ..., : batch["images"].shape[-1] // (2 if declip else 1)]

    def img_loss(p, x):
        out = model.apply(vars_of(p), x, train=True,
                          mutable=["batch_stats"], method="encode_image")[0]
        return (out.astype(jnp.float32) ** 2).mean()

    def txt_loss(p, t):
        out = model.apply(vars_of(p), t, method="encode_text")
        emb = out[0] if isinstance(out, tuple) else out
        return (emb.astype(jnp.float32) ** 2).mean()

    def img_loss_eval(p, x):
        out = model.apply(vars_of(p), x, train=False, method="encode_image")
        return (out.astype(jnp.float32) ** 2).mean()

    img_fwd_train = jax.jit(lambda p, x: model.apply(
        vars_of(p), x, train=True, mutable=["batch_stats"],
        method="encode_image")[0])

    # three-way split of the image-tower backward excess (R50 measured
    # bwd/fwd ~3.1x vs the ~2x conv dgrad+wgrad ideal):
    #   fwd(train) - fwd(eval)      = BN batch-stats forward reductions
    #   f+b(train) - f+b(eval)      = BN-stats path in fwd AND bwd
    #   f+b(eval)  - 3x fwd(eval)   = conv wgrad/dgrad MXU inefficiency
    row("image fwd (train)", img_fwd_train, params, one_view)
    row("image fwd+bwd", jax.jit(jax.grad(img_loss)), params, one_view)
    row("image f+b (eval-BN)", jax.jit(jax.grad(img_loss_eval)), params,
        one_view)
    row("text fwd+bwd", jax.jit(jax.grad(txt_loss)), params,
        batch["tokens"])
    row("full fwd+loss", fwd, params, batch, bank)
    row("fwd+bwd", fwd_bwd, params, batch, bank)
    try:
        grads = fwd_bwd(params, batch, bank)
        row("optimizer update", opt, grads, state.opt_state, params)
    except Exception as e:  # noqa: BLE001
        print(f"  optimizer update     SKIPPED ({type(e).__name__})",
              flush=True)
    row("full train step", step, state, batch)


if __name__ == "__main__":
    main()
