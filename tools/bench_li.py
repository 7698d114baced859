"""A/B bench: FILIP late-interaction — chunked XLA vs fused Pallas.

VERDICT r3 item 5: measure at production dense shapes (B=128, GB 4k-32k,
top-16-selected keys, D=256) on the chip, fwd+bwd (the training cost), and
keep the winner as the default. Run on the real TPU:

    python tools/bench_li.py            # full sweep
    python tools/bench_li.py --quick    # one shape

Timing forces a float readback (jax.block_until_ready can be a no-op
through the axon tunnel — CLAUDE.md)."""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _unit(rng, shape, dtype):
    x = rng.normal(size=shape).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.asarray(x, dtype)


def bench_one(fn, d1, d2, scale, iters=20):
    w = jnp.ones((d1.shape[0], d2.shape[0]), jnp.float32)

    @jax.jit
    def fwdbwd(d1_, d2_, s_):
        def loss(a, b, s):
            return (fn(a, b, s) * w).sum()

        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(d1_, d2_, s_)
        return l, grads

    l, _ = fwdbwd(d1, d2, scale)
    float(l)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        l, _ = fwdbwd(d1, d2, scale)
    float(l)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from declip_tpu.ops.filip_ops import late_interaction_logits
    from declip_tpu.ops.filip_pallas import late_interaction_logits_pallas

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    shapes = [(128, 77, 4096, 16, 256)] if args.quick else [
        # (B, N1, GB, N2, D): text-query x selected-image-key and
        # image-query x selected-text-key directions, GB = pod-scale
        # gathered batches
        (128, 77, 4096, 16, 256),
        (128, 50, 4096, 16, 256),
        (128, 77, 8192, 16, 256),
        (128, 77, 16384, 16, 256),
        (128, 77, 32768, 16, 256),
    ]
    rows = []
    for b, n1, gb, n2, d in shapes:
        d1 = _unit(rng, (b, n1, d), dtype)
        d2 = _unit(rng, (gb, n2, d), dtype)
        scale = jnp.asarray(2.5, jnp.float32)
        t_xla = bench_one(late_interaction_logits, d1, d2, scale, args.iters)
        t_pal = bench_one(late_interaction_logits_pallas, d1, d2, scale,
                          args.iters)
        tflops = 2 * 3 * b * n1 * gb * n2 * d / 1e12  # fwd + ~2x recompute
        row = {"shape": f"B{b} N1={n1} GB={gb} N2={n2} D={d}",
               "xla_ms": round(t_xla, 2), "pallas_ms": round(t_pal, 2),
               "speedup": round(t_xla / t_pal, 2),
               "pallas_tflops_s": round(tflops / (t_pal / 1e3), 1)}
        rows.append(row)
        print(json.dumps(row))
    best = min(r["speedup"] for r in rows)
    print(json.dumps({"min_speedup": best,
                      "winner": "pallas" if best > 1.0 else "xla"}))


if __name__ == "__main__":
    main()
