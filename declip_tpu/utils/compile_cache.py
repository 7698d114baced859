"""Persistent XLA compile-cache setup, safe across machine types.

XLA:CPU persists ahead-of-time executables whose generated code embeds host
CPU features that are NOT part of the persistent-cache key. Loading another
machine's entries logs ``Target machine feature +prefer-no-scatter is not
supported ... could lead to execution errors such as SIGILL`` and can kill
the process with a fatal signal mid-test (observed on this repo's
reference-config run tests after the cache directory migrated hosts).
Accelerator (TPU) executables are serialized portably.

Therefore: CPU backends use a machine-fingerprinted subdirectory (stale
same-machine entries still hit; foreign entries never load), while
accelerator backends share the stable directory so remote 5-15 min TPU
compiles stay warm.
"""

from __future__ import annotations

import hashlib
import os
import platform
from typing import Optional


def machine_fingerprint() -> str:
    """Stable per-CPU-type fingerprint.

    Hashes vendor/family/model/stepping AND the flags line of /proc/cpuinfo:
    virtualized hosts here report an identical generic ``model name``
    (\"Intel(R) Xeon(R) Processor @ 2.70GHz\") and identical flags across
    different physical CPU generations, while XLA's LLVM target derives
    per-model tuning features (+prefer-no-gather/+prefer-no-scatter on
    some steppings) that make AOT entries non-portable — observed
    foreign-entry loads surviving a flags-only fingerprint."""
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # NOT microcode: a routine microcode update would orphan
                # the same machine's whole cache; LLVM's target features
                # derive from family/model/stepping + flags only
                if line.startswith(("flags", "Features", "model", "stepping",
                                    "cpu family", "vendor_id")):
                    parts.append(line.strip())
                if line.strip() == "" and parts:
                    break  # first core only — all cores are identical
    except OSError:
        pass
    if not parts:
        parts = [f"{platform.machine()}-{platform.processor()}"]
    # core count too: these VMs get RESHAPED (64 vCPU -> 1 vCPU) keeping
    # identical cpuinfo model/stepping/flags, yet LLVM's tuning features
    # (+prefer-no-gather/+prefer-no-scatter) differ with detected topology —
    # observed foreign AOT loads surviving the cpuinfo-only fingerprint
    parts.append(f"ncpu={os.cpu_count()}")
    # ... and the boot id: a stop/start VM resize can land on a different
    # physical CPU while reporting byte-identical cpuinfo AND core count
    # (observed: a foreign +prefer-no-scatter AOT entry loading from a dir
    # keyed by everything above). Any reboot re-keys the CPU cache — cheap
    # insurance against the mid-test SIGILL, at worst a cold cache per boot.
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append(f"boot={f.read().strip()}")
    except OSError:
        pass
    return hashlib.sha1("\n".join(parts).encode()).hexdigest()[:10]


def enable_compile_cache(base: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at a backend-appropriate
    directory and return it. Respects $JAX_COMPILATION_CACHE_DIR as the
    base. Initializes the default backend (to know whether we're on CPU)."""
    import jax

    base = base or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"),
    )
    if jax.default_backend() == "cpu":
        base = f"{base}_cpu_{machine_fingerprint()}"
    jax.config.update("jax_compilation_cache_dir", base)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return base
