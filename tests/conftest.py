"""Test configuration: force the CPU backend with 8 virtual devices.

The multi-chip sharding path is validated on a fake 8-device CPU mesh
(``xla_force_host_platform_device_count``), the strategy SURVEY.md §4 calls for
in place of the reference's (absent) distributed tests. The axon sitecustomize
registers the TPU plugin and pins ``jax_platforms`` at import time, so we
override via ``jax.config`` (the env var alone is not honored).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
