"""Test harness config: force an 8-device virtual CPU platform before JAX init.

This is the JAX-standard mechanism for testing multi-device sharding without
hardware (SURVEY.md §4): tests exercise real ``jax.sharding.Mesh`` programs on
8 virtual devices.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session may default to a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize may have pre-registered a TPU platform with JAX_PLATFORMS
# already read; force the CPU platform explicitly before backend init.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
