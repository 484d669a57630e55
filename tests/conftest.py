"""Test configuration: force an 8-virtual-device CPU platform.

Tests never touch the real TPU; multi-device sharding tests run on the
virtual CPU mesh (the TPU-world substitute for multi-node testing, see
SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
