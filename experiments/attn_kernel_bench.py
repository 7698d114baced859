"""Flash-attention kernel micro-bench at ViT-L/14 shapes (round 5).

Times fwd and fwd+bwd of declip_tpu.ops.flash_attention vs the XLA
attention path on chip, device-resident (scan-loop timing — the axon
tunnel RTT swamps single dispatches). Used to A/B the bf16-operand-matmul
kernel variant (operands stay bf16 + fp32 accumulate vs upcasting operands
to fp32 first). MEASURED RESULT (v5e, L=257 B=32 H=16 Dh=64): a wash —
bf16 ops 0.719/1.634 ms fwd/fwd+bwd vs fp32 ops 0.715/1.622; the kernel
is softmax/VPU-bound at these shapes. XLA unfused: 0.624/1.819 (the
kernel's +11%% fwd+bwd win is the HBM round-trip of the probs, not MXU
rate). bf16 operands kept for dtype parity with XLA.

Usage: python experiments/attn_kernel_bench.py [--b 32] [--l 257]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from declip_tpu.ops.attention import _xla_attention
from declip_tpu.ops.flash_attention import flash_attention
from declip_tpu.utils.compile_cache import enable_compile_cache


def _time(fn, *args, iters=30):
    def make(n):
        @jax.jit
        def loop(q, k, v):
            def body(c, _):
                o = fn(c, k, v)
                return o.astype(c.dtype), None
            c, _ = jax.lax.scan(body, q, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        return loop

    short, long = make(iters), make(2 * iters)
    float(short(*args)), float(long(*args))
    ts = tl = 1e30
    for _ in range(3):
        t0 = time.perf_counter(); float(short(*args))
        ts = min(ts, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(long(*args))
        tl = min(tl, time.perf_counter() - t0)
    return max(tl - ts, 1e-9) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--l", type=int, default=257)
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    enable_compile_cache()
    rng = np.random.default_rng(0)
    shape = (args.b, args.h, args.l, args.dh)
    q, k, v = (jnp.asarray(rng.normal(size=shape) * 0.1, jnp.bfloat16)
               for _ in range(3))
    scale = args.dh ** -0.5

    def flash_f(q, k, v):
        return flash_attention(q, k, v, causal=False)

    def xla_f(q, k, v):
        return _xla_attention(q, k, v, False, scale)

    def grad_of(f):
        g = jax.grad(lambda q, k, v: jnp.sum(f(q, k, v).astype(jnp.float32)
                                             ** 2) * 1e-6, argnums=0)
        return lambda q, k, v: g(q, k, v)

    out = {"shape": list(shape)}
    for name, f in [("flash", flash_f), ("xla", xla_f)]:
        out[f"{name}_fwd_ms"] = round(_time(f, q, k, v, iters=args.iters), 3)
        out[f"{name}_fwdbwd_ms"] = round(
            _time(grad_of(f), q, k, v, iters=args.iters), 3)
    # parity while we're here (bf16 tolerance)
    d = np.abs(np.asarray(flash_f(q, k, v), np.float32)
               - np.asarray(xla_f(q, k, v), np.float32))
    out["max_abs_diff_vs_xla"] = round(float(d.max()), 5)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
