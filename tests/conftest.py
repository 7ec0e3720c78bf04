"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (the TPU-world 'fake backend').

Note: this environment may pre-import jax with a TPU platform via
sitecustomize, so plain env vars are not enough — we must also update the jax
config after import (before any backend is instantiated by tests)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
