"""Test harness: force the CPU backend with 8 virtual devices.

The dev box tunnels a single real TPU chip (platform 'axon'); tests must be
hermetic and exercise multi-device sharding, so we emulate an 8-device mesh on CPU
(the TPU-world substitute for a multi-chip testbed, see SURVEY.md section 4).
Must run before any JAX backend initialization.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "yolov6"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="torch reference repo not mounted")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
