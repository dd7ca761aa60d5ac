"""Test harness config: CPU backend with 8 virtual devices.

This image's sitecustomize force-registers the `axon` TPU backend and sets
jax_platforms="axon,cpu" in every process, overriding the JAX_PLATFORMS env
var — so tests must switch the config back AFTER jax import. Tests run on
CPU both for speed (the TPU is behind a single-client tunnel) and to get an
8-device virtual mesh for sharding tests (SURVEY.md §4: the reference has no
multi-node test story; we add one via XLA host-platform device splitting).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
