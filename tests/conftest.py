"""Test harness: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (SURVEY.md §4).

The axon environment registers its TPU PJRT plugin from sitecustomize and
pins ``JAX_PLATFORMS=axon`` — jax is already imported before this conftest
runs, so env vars are too late; ``jax.config.update`` is the override that
works.  XLA_FLAGS is still read lazily at first CPU-backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) >= 8, (
    "conftest failed to create the virtual 8-device CPU mesh: "
    f"{jax.devices()}")
