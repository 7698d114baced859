"""Test env: force an 8-device virtual CPU platform before JAX initializes.

This is the standard way to exercise pjit/shard_map multi-device semantics
without a pod (SURVEY.md §4). bench.py does NOT import this — benches run on
the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU cross-replica collectives CHECK-abort the whole process when
# replica threads skew past the default 40s rendezvous timeout — big
# full-size-model programs on a loaded host hit this nondeterministically
# (observed: 'Termination timeout for all reduce ... Exiting to ensure a
# consistent program state', rc=134, on the reference-config run tests).
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags

# keep the optional tensorboard sink out of the suite by default (writer
# threads + a ~10s tensorboardX import tax on the 1-vCPU hosts); the sink
# has its own opt-in test (test_aux_components.test_scalar_writer_tb_sink)
os.environ.setdefault("DECLIP_TB", "0")

import jax  # noqa: E402

# The axon sitecustomize pre-registers the TPU backend in every process and
# overrides JAX_PLATFORMS; forcing the config AFTER import (but before any
# backend is instantiated) reliably selects the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")

# eager per-op dispatch is very slow in this environment; persist compiled
# executables across test processes. CPU entries are machine-fingerprinted:
# foreign-host XLA:CPU AOT entries can SIGILL/abort mid-test
# (declip_tpu/utils/compile_cache.py)
from declip_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
# fp32 matmuls in parity tests must be true fp32 (JAX's default matmul
# precision downcasts inputs)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---- per-test hang watchdog -------------------------------------------------
# XLA:CPU multi-replica collective programs can (rarely) hang in their
# rendezvous on starved hosts (observed on a 1-vCPU machine: a single
# 8-replica step freezes with ~0 CPU; the raised collective terminate
# timeout above then masks it for an hour). A hung test is unrecoverable
# in-process — dump every thread's traceback and hard-exit so the run
# fails loudly in minutes instead of silently eating the CI budget.
# DECLIP_TEST_TIMEOUT overrides (seconds; 0 disables). The default is far
# above any legitimate test, including cold compiles on one core.
_TEST_TIMEOUT = float(os.environ.get("DECLIP_TEST_TIMEOUT", "2400") or 0)


@pytest.hookimpl(wrapper=True)
def pytest_runtest_protocol(item, nextitem):
    if not _TEST_TIMEOUT:
        return (yield)
    import faulthandler
    import sys
    import threading

    def _expire():
        # pytest's fd-level capture owns fd 2 and its buffers die with
        # os._exit — dump to a side file AND the (captured) stderr
        msg = (f"\n[conftest watchdog] test {item.nodeid} exceeded "
               f"{_TEST_TIMEOUT:.0f}s — dumping threads and aborting run\n")
        try:
            with open("/tmp/declip_watchdog_dump.txt", "w") as f:
                f.write(msg)
                faulthandler.dump_traceback(file=f)
        except OSError:
            pass
        os.write(2, msg.encode())
        faulthandler.dump_traceback(file=sys.__stderr__)
        os._exit(86)

    timer = threading.Timer(_TEST_TIMEOUT, _expire)
    timer.daemon = True
    timer.start()
    try:
        return (yield)
    finally:
        timer.cancel()
