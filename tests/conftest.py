"""Test configuration: force the XLA CPU backend with 8 virtual devices so
multi-device sharding tests run without TPU hardware (SURVEY.md §4)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
