"""Crash-time diagnostics.

Replaces the reference's ipdb-on-exception hook (prototype/solver/
crash_on_ipy.py:1-13) with a non-interactive equivalent suited to headless
TPU jobs: faulthandler tracebacks for hard crashes + a structured excepthook
dump (env, devices, last steps) to a crash file.
"""

from __future__ import annotations

import faulthandler
import json
import os
import sys
import time
import traceback
from typing import Optional


def install_crash_handler(dump_dir: Optional[str] = None) -> None:
    faulthandler.enable()
    dump_dir = dump_dir or os.getcwd()

    prev_hook = sys.excepthook

    def hook(exc_type, exc, tb):
        try:
            os.makedirs(dump_dir, exist_ok=True)
            path = os.path.join(dump_dir, "crash_report.json")
            info = {
                "time": time.strftime("%Y-%m-%d %H:%M:%S"),
                "type": exc_type.__name__,
                "message": str(exc),
                "traceback": traceback.format_exception(exc_type, exc, tb),
                "argv": sys.argv,
            }
            try:
                import jax

                info["devices"] = [str(d) for d in jax.devices()]
                info["process_index"] = jax.process_index()
            except Exception:
                pass
            with open(path, "w") as f:
                json.dump(info, f, indent=2)
            sys.stderr.write(f"[declip_tpu] crash report: {path}\n")
        finally:
            prev_hook(exc_type, exc, tb)

    sys.excepthook = hook
