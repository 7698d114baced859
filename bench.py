"""Throughput benchmark — runs on the real TPU chip.

Headline metric (BASELINE.json): image-text pairs/sec/chip for CLIP ViT-B/32
training (full fwd+bwd+optimizer step, bf16 compute / fp32 params, global
InfoNCE). ``vs_baseline`` normalizes against an A100 open_clip-class
reference throughput for the same model/recipe (~1000 pairs/sec/GPU at
batch 128 fp16 — the reference publishes no throughput numbers, SURVEY.md §6,
so this is the standard public A100 number for CLIP ViT-B/32 training).

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_PAIRS_PER_SEC = 1000.0

PER_CHIP_BATCH = 128
WARMUP_STEPS = 3
BENCH_STEPS = 20


def main():
    from declip_tpu.models import model_entry
    from declip_tpu.optim import optim_entry, scheduler_entry
    from declip_tpu.train import make_train_step, new_train_state

    n_chips = jax.device_count()
    b = PER_CHIP_BATCH * n_chips

    model = model_entry({
        "type": "clip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 512, "input_resolution": 224},
            "text_encode": {"embed_dim": 512},
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
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True)
    )()
    params = variables["params"]
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                      "warmup_steps": 100}},
        max_iter=10000,
    )
    tx = optim_entry(
        {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 0.1,
                                     "betas": [0.9, 0.98]}},
        params, sched,
        pconfig={"ln_w": {"weight_decay": 0}, "ln_b": {"weight_decay": 0},
                 "linear_b": {"weight_decay": 0},
                 "logit_scale": {"weight_decay": 0}},
    )
    state = new_train_state(
        params=params, batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )
    step = jax.jit(
        make_train_step(model, tx, {}, sched, total_steps=10000),
        donate_argnums=(0,),
    )

    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, batch)
    # force a full device round-trip (block_until_ready can be a no-op
    # through remote-execution tunnels)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(BENCH_STEPS):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    pairs_per_sec_chip = b * BENCH_STEPS / dt / n_chips
    print(json.dumps({
        "metric": "image-text pairs/sec/chip (CLIP ViT-B/32 train, bf16)",
        "value": round(pairs_per_sec_chip, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec_chip / A100_BASELINE_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
