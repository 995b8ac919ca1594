"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env BEFORE jax import (see repo guidance: multi-chip sharding is
validated with xla_force_host_platform_device_count since only one real TPU
chip is attached).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("RTV_DISABLE_PALLAS", "0")  # pallas runs interpreted on CPU

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
