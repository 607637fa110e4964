"""Test harness config: force an 8-device virtual CPU platform before JAX init.

This is the JAX-standard mechanism for testing multi-device sharding without
hardware (SURVEY.md §4): tests exercise real ``jax.sharding.Mesh`` programs on
8 virtual devices.
"""

import os
import sys

# VANGAN_TPU_TESTS=1 leaves the real TPU platform active so
# tests/test_pallas_tpu.py can run on hardware (bench.py --selftest).
if not os.environ.get("VANGAN_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"  # the session may default to a TPU platform
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not os.environ.get("VANGAN_TPU_TESTS"):
    # A sitecustomize may have pre-registered a TPU platform with JAX_PLATFORMS
    # already read; force the CPU platform explicitly before backend init.
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compile cache (platform-keyed): cuts CPU suite re-runs massively
# (XLA conv compiles dominate, docs/ROADMAP.md) and is essential on the
# remote-compile TPU platform.
from vangan_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_collection_modifyitems(config, items):
    """Tier the suite: everything not marked ``slow`` is ``quick``
    (pytest -m quick ~5 min on CPU; -m slow is the heavy DP/e2e tier)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
