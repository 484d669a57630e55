"""Test configuration: force an 8-virtual-device CPU platform.

Tests never touch the real TPU; multi-device sharding tests run on the
virtual CPU mesh (the TPU-world substitute for multi-node testing, see
SURVEY.md §4).

NOTE: this environment's sitecustomize imports jax at interpreter startup
(axon PJRT plugin registration), so JAX_PLATFORMS set via os.environ here is
too late — jax.config.update is the reliable switch. XLA_FLAGS is still
read at first backend initialization, which hasn't happened yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
