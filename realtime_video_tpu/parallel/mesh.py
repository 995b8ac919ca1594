"""Device mesh construction.

The reference scales with NCCL/FSDP/xDiT wrappers
(utils/distributed.py, wan/distributed/fsdp.py, xdit_context_parallel.py).
On TPU all of that collapses to: declare a Mesh once, annotate shardings,
let pjit/GSPMD emit the ICI collectives.

Axes:
  * "tp" — tensor parallel over ICI: attention heads + FFN columns of the 14B
    DiT; this is the serving-time strategy (latency-bound, 4 sequential
    forwards per block);
  * "dp" — data parallel over DCN for batch sampling / training.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh. shape e.g. {"dp": 1, "tp": 4}; {} or None -> all devices
    on a single "tp" axis."""
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = {"dp": 1, "tp": len(devices)}
    names = tuple(shape.keys())
    sizes = tuple(shape.values())
    n = math.prod(sizes)
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(sizes)
    return Mesh(arr, names)


def single_device_mesh() -> Mesh:
    return make_mesh({"dp": 1, "tp": 1}, devices=jax.devices()[:1])
