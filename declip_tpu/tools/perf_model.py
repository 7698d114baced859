"""Roofline projection: measured single-chip step -> pod-slice step time.

The reference scaled by renting more 8-GPU nodes and hoping NCCL kept up;
there was no cost model in the repo. On TPU the projection IS computable:
one jitted SPMD program whose compute leg is measured on one chip and whose
communication legs ride ICI with known topology/bandwidth — the
"How to Scale Your Model" recipe (pick mesh -> count collective bytes ->
take the max roofline). This tool makes the SCALING.md axis table
quantitative:

    python -m declip_tpu.tools.perf_model --params-m 114 \
        --step-ms 176.3 --batch 128 --chip v5e --chips 1,4,16,32,64

For each slice size it reports the DP gradient all-reduce time, the
FSDP weight all-gather + grad reduce-scatter time, the projected step
time under XLA's overlap (comms hide under compute until they don't),
pairs/s, and which roofline binds. Numbers are ONE-SIDED BOUNDS, not
simulations: compute time is the measured single-chip step (exact), comms
time assumes the documented per-link bandwidth on a ring (bidirectional)
with no congestion — the projection is the best the hardware allows and
the SPMD partitioner demonstrably approaches (its collectives are the
same ring algorithms).

Chip constants are the public figures from the scaling book / TPU specs
tables; override any of them with --peak-tf/--hbm-gbs/--ici-gbs.
"""

from __future__ import annotations

import argparse
import json
from dataclasses import dataclass
from typing import Dict, List, Optional

__all__ = ["CHIPS", "ChipSpec", "Plan", "project", "project_table"]


@dataclass(frozen=True)
class ChipSpec:
    """Public per-chip constants (bf16 peak, HBM, one ICI link one-way)."""
    name: str
    peak_tflops_bf16: float
    hbm_gb: float
    hbm_gbs: float
    ici_gbs_per_link: float   # one-way, per link
    ici_links: int            # torus degree (2D -> 4, 3D -> 6)


CHIPS: Dict[str, ChipSpec] = {
    # scaling-book / public spec figures
    "v5e": ChipSpec("v5e", 197.0, 16.0, 819.0, 45.0, 4),
    "v5p": ChipSpec("v5p", 459.0, 95.0, 2765.0, 90.0, 6),
    "v4": ChipSpec("v4", 275.0, 32.0, 1228.0, 45.0, 6),
}


@dataclass(frozen=True)
class Plan:
    """A data-parallel slice plan (the regime every reference recipe uses;
    TP/PP change the compute leg itself and are measured, not projected).

    ``slices > 1`` models multi-slice DP (``parallelism: {slices: N}``):
    ``chips`` is the per-slice count, gradients reduce hierarchically —
    reduce-scatter in-slice over ICI, the cross-slice exchange of the
    1/chips shard over DCN, then the in-slice all-gather. ``dcn_gbs`` is
    the per-chip DCN bandwidth (public figure: ~25 GB/s per v5e host of 8
    chips ≈ 3.1 GB/s per chip; override for your fabric)."""
    chips: int
    fsdp: bool = False
    slices: int = 1
    dcn_gbs: float = 3.1


def _ring_allreduce_s(bytes_per_chip: float, n: int, spec: ChipSpec,
                      axes: int = 1) -> float:
    """Ring all-reduce wall time: 2*(n-1)/n of the buffer crosses each
    chip's ICI boundary; a DP axis laid on ``axes`` torus dimensions uses
    both directions of each (GSPMD splits ring traffic across the axis
    links)."""
    if n <= 1:
        return 0.0
    wire = 2.0 * bytes_per_chip * (n - 1) / n
    bw = spec.ici_gbs_per_link * 1e9 * 2 * axes  # both directions per dim
    return wire / bw


def _ring_allgather_s(bytes_per_chip_shard: float, n: int, spec: ChipSpec,
                      axes: int = 1) -> float:
    """All-gather (or reduce-scatter) of an n-sharded buffer: (n-1) shards
    cross each boundary."""
    if n <= 1:
        return 0.0
    wire = bytes_per_chip_shard * (n - 1)
    bw = spec.ici_gbs_per_link * 1e9 * 2 * axes
    return wire / bw


def project(params_m: float, step_ms: float, batch_per_chip: int,
            spec: ChipSpec, plan: Plan, grad_bytes: int = 4,
            param_bytes: int = 4, overlap: float = 1.0,
            flops_per_step: Optional[float] = None) -> Dict:
    """One slice-size projection.

    overlap=1.0 models XLA hiding collectives under the backward pass
    (comms cost = max(0, t_comm - t_compute_available)); overlap=0.0 is
    the fully-serial upper bound. Reality sits between; on ICI with the
    default scheduler it sits near 1.0 until comms dominate.
    """
    n = plan.chips
    s = max(1, plan.slices)
    p_bytes = params_m * 1e6 * param_bytes
    g_bytes = params_m * 1e6 * grad_bytes

    if plan.fsdp:
        shard = p_bytes / n
        # fwd all-gather + bwd all-gather + grad reduce-scatter — all
        # in-slice (the framework shards FSDP over 'data' only, keeping
        # weight traffic on ICI; parallel/fsdp.py)
        t_comm = (2 * _ring_allgather_s(shard, n, spec)
                  + _ring_allgather_s(shard * grad_bytes / param_bytes,
                                      n, spec))
    else:
        t_comm = _ring_allreduce_s(g_bytes, n, spec)

    # multi-slice: after the in-slice reduce-scatter each chip holds a
    # 1/n grad shard; the cross-slice all-reduce of that shard rides DCN
    # (2*(s-1)/s of the shard crosses each chip's DCN boundary), then the
    # in-slice all-gather completes the hierarchical all-reduce. The ICI
    # wire total is unchanged (RS + AG = one flat in-slice all-reduce).
    t_dcn = 0.0
    if s > 1:
        dcn_wire = 2.0 * (g_bytes / n) * (s - 1) / s
        t_dcn = dcn_wire / (plan.dcn_gbs * 1e9)
        t_comm += t_dcn

    t_compute = step_ms / 1e3
    t_exposed = max(0.0, t_comm - overlap * t_compute)
    t_step = t_compute + t_exposed
    serial = t_compute + t_comm

    total_chips = n * s
    out = {
        "chips": total_chips,
        "fsdp": plan.fsdp,
        "global_batch": batch_per_chip * total_chips,
        "t_compute_ms": round(t_compute * 1e3, 2),
        "t_comm_ms": round(t_comm * 1e3, 2),
        "t_step_ms": round(t_step * 1e3, 2),
        "t_step_serial_ms": round(serial * 1e3, 2),
        "pairs_per_s": round(batch_per_chip * total_chips / t_step, 1),
        "pairs_per_s_per_chip": round(batch_per_chip / t_step, 1),
        "scaling_efficiency": round((step_ms / 1e3) / t_step, 4),
        "bound": ("compute" if t_exposed == 0.0
                  else "dcn" if t_dcn > t_comm - t_dcn else "ici"),
    }
    if s > 1:
        out["slices"] = s
        out["t_dcn_ms"] = round(t_dcn * 1e3, 2)
    if flops_per_step:
        out["mfu"] = round(
            flops_per_step / t_step / (spec.peak_tflops_bf16 * 1e12), 4)
    return out


def project_table(params_m: float, step_ms: float, batch_per_chip: int,
                  spec: ChipSpec, chip_counts: List[int],
                  fsdp: bool = False, slices: int = 1,
                  dcn_gbs: float = 3.1, **kw) -> List[Dict]:
    """chip_counts are PER-SLICE counts when slices > 1 (the reported
    'chips' field is the total = per-slice x slices)."""
    return [project(params_m, step_ms, batch_per_chip, spec,
                    Plan(n, fsdp=fsdp, slices=slices, dcn_gbs=dcn_gbs),
                    **kw) for n in chip_counts]


def _measured_from_config(config_path: str, batch: int):
    """Calibrate params/step FLOPs from the live model (no chip needed:
    FLOPs are backend-independent; step time still comes from bench.py)."""
    import jax
    import jax.numpy as jnp

    from declip_tpu.tools._common import load_eval_model
    from declip_tpu.utils.flops import count_params, estimate_flops

    model, variables = load_eval_model(config_path)
    params_m = count_params(variables["params"])["total_M"]
    res = getattr(model.visual, "input_resolution", 224)

    def fwd(v, img, tok):
        return model.apply(v, {"images": img, "tokens": tok}, train=False)

    flops = estimate_flops(
        fwd, variables,
        jnp.zeros((batch, res, res, 3), jnp.bfloat16),
        jnp.ones((batch, 77), jnp.int32))
    # train step ~ fwd + 2x fwd (bwd) + optimizer; report fwd-based floor
    return params_m, (3.0 * flops if flops else None)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", help="calibrate params/FLOPs from a config")
    ap.add_argument("--params-m", type=float,
                    help="parameter count in millions (skips --config)")
    ap.add_argument("--step-ms", type=float, required=True,
                    help="measured single-chip step time (bench.py)")
    ap.add_argument("--batch", type=int, default=128, help="per-chip batch")
    ap.add_argument("--chip", default="v5e", choices=sorted(CHIPS))
    ap.add_argument("--chips", default="1,4,8,16,32,64",
                    help="comma-separated slice sizes")
    ap.add_argument("--fsdp", action="store_true")
    ap.add_argument("--slices", type=int, default=1,
                    help="multi-slice DP: --chips become per-slice counts; "
                         "adds the cross-slice DCN all-reduce leg")
    ap.add_argument("--dcn-gbs", type=float, default=3.1,
                    help="per-chip DCN bandwidth GB/s (default: 25 GB/s "
                         "per 8-chip v5e host)")
    ap.add_argument("--overlap", type=float, default=1.0)
    ap.add_argument("--peak-tf", type=float)
    ap.add_argument("--hbm-gbs", type=float)
    ap.add_argument("--ici-gbs", type=float,
                    help="override one-way per-link ICI GB/s")
    args = ap.parse_args(argv)

    spec = CHIPS[args.chip]
    if args.peak_tf or args.hbm_gbs or args.ici_gbs:
        spec = ChipSpec(spec.name,
                        args.peak_tf or spec.peak_tflops_bf16,
                        spec.hbm_gb,
                        args.hbm_gbs or spec.hbm_gbs,
                        args.ici_gbs or spec.ici_gbs_per_link,
                        spec.ici_links)

    flops = None
    if args.params_m:
        params_m = args.params_m
    elif args.config:
        params_m, flops = _measured_from_config(args.config, args.batch)
    else:
        ap.error("need --params-m or --config")

    rows = project_table(params_m, args.step_ms, args.batch, spec,
                         [int(c) for c in args.chips.split(",")],
                         fsdp=args.fsdp, slices=args.slices,
                         dcn_gbs=args.dcn_gbs, overlap=args.overlap,
                         flops_per_step=flops)
    for row in rows:
        print(json.dumps({"params_m": round(params_m, 1),
                          "chip": spec.name, **row}))


if __name__ == "__main__":
    main()
