"""Backend selection helpers.

The deployment image routes JAX to a TPU through a single-client tunnel and
force-selects it via sitecustomize (jax_platforms="axon,cpu"). `force_cpu()`
flips a process back to host CPU — used by tests and CPU-oracle tooling.
Call it before the first JAX computation.
"""

from __future__ import annotations

import os


def force_cpu(virtual_devices: int | None = None) -> None:
    if virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
