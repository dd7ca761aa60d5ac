"""Test harness config: CPU backend with 8 virtual devices.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (SURVEY.md §4: the reference has no multi-node
test story; we add one via XLA's host-platform device splitting).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
