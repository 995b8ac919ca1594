"""Device-memory utilities.

The reference offloads weights CPU<->GPU with __getattr__-hook streaming
(demo_utils/memory.py DynamicSwapInstaller). On TPU, XLA owns HBM: the
equivalents are buffer donation (already used on every cache), rematerialisation
(jax.checkpoint in the training step), and explicit device_put for staging.
This module keeps the reference's introspection API alive.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax

log = logging.getLogger(__name__)


def get_hbm_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Per-device HBM usage in GB (replacement for get_cuda_free_memory_gb,
    demo_utils/memory.py:72)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        limit = stats.get("bytes_limit", 0) / 1e9
        used = stats.get("bytes_in_use", 0) / 1e9
        return {"limit_gb": limit, "in_use_gb": used, "free_gb": limit - used}
    except Exception:  # noqa: BLE001 — CPU devices have no memory_stats
        return {"limit_gb": 0.0, "in_use_gb": 0.0, "free_gb": 0.0}


def get_free_memory_gb(device: Optional[jax.Device] = None) -> float:
    return get_hbm_stats(device)["free_gb"]


def move_to_device(pytree: Any, device: Optional[jax.Device] = None) -> Any:
    """Stage a param pytree onto a device (replacement for
    move_model_to_device_with_memory_preservation, memory.py:85-98 — XLA
    handles preservation; this is an explicit placement)."""
    device = device or jax.devices()[0]
    return jax.device_put(pytree, device)


def offload_to_host(pytree: Any) -> Any:
    """Pull a pytree to host RAM (frees HBM after the next GC)."""
    return jax.device_get(pytree)
