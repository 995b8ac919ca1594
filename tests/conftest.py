"""Test harness: run everything on a virtual 8-device CPU mesh.

The attached TPU (axon plugin) pre-sets JAX_PLATFORMS=axon, so plain env vars
are not enough — we must also update jax.config after import. Multi-chip
sharding is validated with xla_force_host_platform_device_count since only one
real TPU chip is attached.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.device_count() >= 8, "expected 8 virtual CPU devices for mesh tests"
