"""Bounded XLA-flag sweep on the DeCLIP-R50 north-star bench (VERDICT r3 #7).

Before accepting the 40%-MFU "compiler territory" conclusion (BN-stats math
+ conv wgrad emitter), try the public single-chip scheduling/memory levers.
Each config runs `bench.py --model declip_res50` in a FRESH subprocess with
the flag set in XLA_FLAGS (the axon remote compiler snapshots env at init;
new flags also re-key the persistent compile cache, so each leg pays one
remote compile).

    python tools/xla_flag_sweep.py [--quick]

Results print as one JSON line per leg + a summary."""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CONFIGS = {
    "baseline": "",
    # scheduler: overlap HBM loads with MXU work more aggressively
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    # scoped vmem: more on-chip scratch for fused loops (default ~64M kib
    # class on v5e; both directions tried)
    "scoped_vmem_hi": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "scoped_vmem_lo": "--xla_tpu_scoped_vmem_limit_kib=32768",
    # flash-range matmul/reduce fusion aggressiveness
    "aggressive_fusion": "--xla_tpu_rwb_fusion=false",
}


def run_leg(name: str, flags: str, batch: int) -> dict:
    env = dict(os.environ)
    # --xla_tpu_* flags are unknown to the LOCAL (CPU) XLA flag parser and
    # abort the process if put in XLA_FLAGS; the axon remote compiler
    # forwards proto-backed xla_* flags from the client's LIBTPU_INIT_ARGS
    # per-compile, so that's the carrier. A per-leg compile-cache dir forces
    # a real recompile (these flags are not part of the cache key).
    base = env.get("LIBTPU_INIT_ARGS", "")
    env["LIBTPU_INIT_ARGS"] = (base + " " + flags).strip()
    env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/xla_sweep_cache_{name}"
    cmd = [sys.executable, "bench.py", "--model", "declip_res50",
           "--batch", str(batch)]
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                      timeout=3600, cwd=os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__))))
    line = None
    for ln in p.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = json.loads(ln)
    if line is None:
        return {"leg": name, "error": (p.stdout + p.stderr)[-400:]}
    return {"leg": name, "flags": flags, "pairs_s": line["value"],
            "mfu": line.get("mfu")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="baseline + latency_hiding only")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    configs = (dict(list(CONFIGS.items())[:2]) if args.quick else CONFIGS)
    results = []
    for name, flags in configs.items():
        r = run_leg(name, flags, args.batch)
        results.append(r)
        print(json.dumps(r), flush=True)
    ok = [r for r in results if "pairs_s" in r]
    if ok:
        base = next((r for r in ok if r["leg"] == "baseline"), ok[0])
        best = max(ok, key=lambda r: r["pairs_s"])
        print(json.dumps({
            "best": best["leg"], "best_pairs_s": best["pairs_s"],
            "baseline_pairs_s": base["pairs_s"],
            "gain_pct": round(100 * (best["pairs_s"] / base["pairs_s"] - 1),
                              2),
        }))


if __name__ == "__main__":
    main()
