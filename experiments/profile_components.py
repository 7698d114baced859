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

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


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
    args = ap.parse_args()

    from declip_tpu.models import model_entry
    from declip_tpu.optim import optim_entry, scheduler_entry
    from declip_tpu.train import make_train_step, new_train_state

    b = args.batch
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
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(
            rng.normal(size=(b, 224, 224, 3)).astype(np.float32)),
        "tokens": jnp.asarray(rng.integers(1, 40000, (b, 77)), jnp.int32),
    }
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True))()
    params = variables["params"]
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                      "warmup_steps": 100}}, max_iter=10000)
    tx = optim_entry({"type": "AdamW", "kwargs": {"lr": 1e-3,
                                                  "weight_decay": 0.1}},
                     params, sched)
    state = new_train_state(params=params, batch_stats={},
                            opt_state=tx.init(params))

    img_fwd = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, train=False, method="encode_image"))
    txt_fwd = jax.jit(lambda p, t: model.apply(
        {"params": p}, t, method="encode_text"))

    def full_loss(p, batch):
        from declip_tpu.train.method_losses import clip_losses

        out = model.apply({"params": p}, batch, train=True)
        return clip_losses(out, {}, None)[0]

    fwd = jax.jit(full_loss)
    fwd_bwd = jax.jit(lambda p, batch: jax.grad(full_loss)(p, batch))
    grads = fwd_bwd(params, batch)
    opt = jax.jit(lambda g, s, p: tx.update(g, s, p))
    step = jax.jit(make_train_step(model, tx, {}, sched))

    rows = [
        ("image fwd (eval)", timeit(img_fwd, params, batch["images"])),
        ("text fwd", timeit(txt_fwd, params, batch["tokens"])),
        ("full fwd+loss", timeit(fwd, params, batch)),
        ("fwd+bwd", timeit(fwd_bwd, params, batch)),
        ("optimizer update", timeit(opt, grads, state.opt_state, params)),
        ("full train step", timeit(step, state, batch)),
    ]
    print(f"B={b} remat={args.remat}")
    for name, dt in rows:
        print(f"  {name:20s} {dt * 1e3:8.2f} ms   "
              f"{b / dt:10.1f} pairs/s")


if __name__ == "__main__":
    main()
