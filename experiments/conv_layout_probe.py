"""Conv wgrad/dgrad layout probe (VERDICT r4 #8 — close the R50 MFU question).

Round 3 isolated R50's backward gap to XLA's conv-backward emitter: 3x3
bottleneck convs run ~23% over the 2x dgrad+wgrad ideal (README
speed-of-light section). This probe re-tests that attribution one more
time with the only framework-side levers that exist: the logical data
layout handed to XLA (NHWC vs NCHW dimension_numbers — XLA:TPU picks its
own physical layout, but the logical spec changes which transposes the
emitter folds) and the filter layout (HWIO vs OIHW).

Times fwd / dgrad / wgrad separately for each bottleneck-stage 3x3 conv of
ModifiedResNet-50 at B=128 bf16 (the shapes that dominate the north-star
step), on the real chip. Prints one JSON line per (shape, layout).

Reference context: prototype/model/modified_resnet.py (the tower whose
backward this decomposes).
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from declip_tpu.utils.compile_cache import enable_compile_cache

# (spatial, C_in, C_out): the four bottleneck 3x3 stages of R50 at 224px
SHAPES = [
    (56, 64, 64),
    (28, 128, 128),
    (14, 256, 256),
    (7, 512, 512),
]

LAYOUTS = {
    "NHWC+HWIO": ("NHWC", "HWIO", "NHWC"),
    "NCHW+OIHW": ("NCHW", "OIHW", "NCHW"),
}


def _conv(x, w, dn):
    # plain bf16 conv — what flax nn.Conv(dtype=bf16) emits in the real
    # tower (XLA:TPU accumulates fp32 on the MXU for bf16 operands; an
    # explicit preferred_element_type=f32 breaks the vjp dtype contract).
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=dn)


def _time(op, carry0, other, iters=30):
    """Device-resident timing: the axon tunnel costs ~30ms per dispatch,
    swamping sub-ms convs — so run `iters` applications inside ONE jitted
    lax.scan (op's output feeds back as its input: a real data dependence,
    so XLA cannot CSE/DCE the repeats) and read back a scalar once."""

    def make(n):
        @jax.jit
        def loop(c, o):
            c, _ = jax.lax.scan(
                lambda c, _: (op(c, o).astype(c.dtype), None),
                c, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        return loop

    # two lengths; the difference cancels the fixed dispatch+readback RTT
    short, long = make(iters), make(2 * iters)
    float(short(carry0, other)), float(long(carry0, other))  # compile+warm
    ts = tl = 1e30
    for _ in range(3):  # best-of-3 against tunnel jitter
        t0 = time.perf_counter(); float(short(carry0, other))
        ts = min(ts, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(long(carry0, other))
        tl = min(tl, time.perf_counter() - t0)
    return max(tl - ts, 1e-9) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    enable_compile_cache()
    rng = np.random.default_rng(0)

    for (s, cin, cout) in SHAPES:
        flops = 2 * args.batch * s * s * 9 * cin * cout  # fwd MACs*2
        rows = {}
        for name, (lx, lw, lo) in LAYOUTS.items():
            xs = ((args.batch, s, s, cin) if lx == "NHWC"
                  else (args.batch, cin, s, s))
            ws = ((3, 3, cin, cout) if lw == "HWIO"
                  else (cout, cin, 3, 3))
            x = jnp.asarray(rng.normal(size=xs), jnp.bfloat16)
            w = jnp.asarray(rng.normal(size=ws) * 0.05, jnp.bfloat16)
            dn = jax.lax.conv_dimension_numbers(xs, ws, (lx, lw, lo))
            conv = functools.partial(_conv, dn=dn)

            # conv is LINEAR: grad-of-sum has a constant cotangent, so a
            # naive grad-in-a-loop is loop-invariant and XLA hoists it out
            # of the scan (measured: 0.0ms). Instead transpose the conv and
            # pump the carried tensor through as the COTANGENT — each
            # backward conv then depends on the previous iteration.
            x_st = jax.ShapeDtypeStruct(x.shape, x.dtype)
            w_st = jax.ShapeDtypeStruct(w.shape, w.dtype)

            def dgrad(cot, w):  # dx = conv_transpose(cot, w), cot-shaped
                (dx,) = jax.linear_transpose(
                    lambda xx: _conv(xx, w, dn), x_st)(cot)
                return dx

            def wgrad(cot, xx):  # dw is w-shaped: mix a scalar of it back
                (dw,) = jax.linear_transpose(
                    lambda ww: _conv(xx, ww, dn), w_st)(cot)
                return cot + jnp.sum(dw).astype(cot.dtype) * 1e-12

            # carry the tensor the op outputs (cin==cout keeps shapes closed)
            cot = jax.jit(conv)(x, w)  # eager dispatch is ~seconds here
            t_f = _time(conv, x, w, iters=args.iters)
            t_d = _time(dgrad, cot, w, iters=args.iters)
            t_w = _time(wgrad, cot, x, iters=args.iters)
            rows[name] = {
                "fwd_ms": round(t_f, 3), "dgrad_ms": round(t_d, 3),
                "wgrad_ms": round(t_w, 3),
                "fwd_tflops": round(flops / t_f / 1e9, 1),
                "bwd_over_2x_ideal": round((t_d + t_w) / (2 * t_f), 3),
            }
        print(json.dumps({"shape": f"{s}x{s}x{cin}->{cout}",
                          "batch": args.batch, **rows}))


if __name__ == "__main__":
    main()
