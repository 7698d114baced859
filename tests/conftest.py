"""Test env: force an 8-device virtual CPU platform before JAX initializes.

This is the standard way to exercise pjit/shard_map multi-device semantics
without a pod (SURVEY.md §4). bench.py does NOT import this — benches run on
the real chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
