"""Standalone re-verification of tests/test_reference_configs_run.py.

On 1-vCPU hosts the 8-replica XLA:CPU programs hang nondeterministically
UNDER PYTEST (see CLAUDE.md "Environment gotchas") while the identical
program passes as a standalone script — so round-N "all 11 reference
configs still run under current defaults" re-verification uses this
runner: each config executes in a FRESH subprocess (isolating XLA:CPU
rendezvous aborts) with the exact same hermetic overrides and assertions
as the pytest case.

Usage:
    python tests/standalone_reference_configs.py            # all 11
    python tests/standalone_reference_configs.py --one PATH # one config

Writes per-config PASS/FAIL + wall time to stdout; exit 0 iff all pass.
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import time


def _setup_env():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "collective_call_terminate_timeout" not in flags:
        flags += (
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
            " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
    os.environ["XLA_FLAGS"] = flags
    os.environ.setdefault("DECLIP_TB", "0")


def run_one(path):
    _setup_env()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from declip_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    jax.config.update("jax_default_matmul_precision", "highest")

    import shutil

    import numpy as np

    from declip_tpu.config import parse_config
    from declip_tpu.solver import Solver
    from tests.test_reference_configs_run import _hermetic_overrides

    tmp_path = tempfile.mkdtemp(prefix="refcfg_")
    shutil.copy(path, os.path.join(tmp_path, "config.yaml"))

    import pathlib

    cfg = _hermetic_overrides(parse_config(path), pathlib.Path(tmp_path))
    solver = Solver(cfg)
    assert solver.max_iter == 2
    solver.train()
    assert int(solver.state.step) == 2
    scalars = open(os.path.join(tmp_path, "events", "scalars.jsonl")).read()
    by_tag = {}
    for line in scalars.splitlines():
        rec = json.loads(line)
        by_tag.setdefault(rec["tag"], []).append(rec["value"])
    assert np.isfinite(by_tag["loss"]).all(), by_tag["loss"]
    assert "eval0/top1" in by_tag
    print(f"OK {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None)
    ap.add_argument("--timeout", type=float, default=3600.0,
                    help="per-config subprocess timeout (s)")
    args = ap.parse_args()

    if args.one:
        run_one(args.one)
        return

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    configs = sorted(glob.glob("/root/reference/experiments/*/*/*/config.yaml"))
    if not configs:
        print("reference tree not mounted"); sys.exit(2)

    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    failures = []
    for path in configs:
        name = path.split("/")[-2]
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", path],
                env=env, cwd=repo, timeout=args.timeout,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            ok = proc.returncode == 0
            tail = proc.stdout.decode(errors="replace")[-2000:]
        except subprocess.TimeoutExpired:
            ok, tail = False, "TIMEOUT"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name} ({dt:.0f}s)", flush=True)
        if not ok:
            failures.append(name)
            print(tail, flush=True)
    print(f"\n{len(configs) - len(failures)}/{len(configs)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
