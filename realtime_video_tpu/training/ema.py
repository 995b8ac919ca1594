"""EMA shadow weights for distillation training.

Reference: utils/distributed.py:91-125 (`EMA_FSDP`) keeps a per-rank fp32
shadow copy of the FSDP-sharded generator, updates it in-place after every
optimizer step (shadow = decay*shadow + (1-decay)*param), and exposes a
state-dict for eval/checkpointing.

TPU-native: the shadow is just a pytree with the same NamedShardings as the
live params (sharding follows data in JAX — no wrapper class needed). The
update is one fused elementwise kernel under jit with the shadow donated, so
it costs one HBM read-modify-write and no extra live copy.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp


def init_ema(params: Any, dtype=jnp.float32) -> Any:
    """Shadow copy (fp32 by default, matching EMA_FSDP's fp32 shadow).

    Always materialises fresh buffers — `astype` to the same dtype aliases,
    and an aliased shadow breaks donation (same buffer donated twice)."""
    return jax.tree_util.tree_map(
        lambda p: jnp.array(p, dtype=dtype, copy=True), params
    )


@partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
def ema_update(shadow: Any, params: Any, decay: float = 0.999) -> Any:
    """shadow <- decay*shadow + (1-decay)*params (donated, in-place)."""
    return jax.tree_util.tree_map(
        lambda s, p: s * decay + p.astype(s.dtype) * (1.0 - decay),
        shadow,
        params,
    )


def ema_params(shadow: Any, like: Any) -> Any:
    """Cast the shadow back to the live params' dtypes for eval
    (EMA_FSDP.copy_to analog, utils/distributed.py:117-121)."""
    return jax.tree_util.tree_map(lambda s, p: s.astype(p.dtype), shadow, like)
