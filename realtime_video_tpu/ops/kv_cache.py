"""Explicit KV-cache state for the block-causal DiT.

The reference keeps one python dict per transformer layer with mutable "k"/"v"
buffers plus (global_end_index, local_end_index) ints
(pipeline/causal_inference.py:279-339, causal_model.py:349-392). Here the cache
is a single pytree of layer-stacked arrays threaded functionally through the
jitted step functions, with donated buffers so updates compile to in-place
dynamic-update-slices:

    kv = {
      "k": [L, B, S, N, Dh] bf16,   "v": [L, B, S, N, Dh] bf16,
      "global_end": int32 scalar,    "local_end": int32 scalar,
    }

All layers share one pair of end indices (in the reference they are per-layer
but always identical).

Eviction semantics mirror causal_model.py:358-392: when local attention is on
and appending `num_new` tokens would overflow the buffer, the cache contents
(minus `sink_tokens` pinned at the front) shift left by the evicted amount.
A re-denoise of the same block (current_end == global_end) never evicts.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def init_kv_cache(
    num_layers: int,
    batch_size: int,
    cache_size: int,
    num_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Zeroed cache (reference _initialize_kv_cache, causal_inference.py:279-314)."""
    shape = (num_layers, batch_size, cache_size, num_heads, head_dim)
    return {
        "k": jnp.zeros(shape, dtype=dtype),
        "v": jnp.zeros(shape, dtype=dtype),
        "global_end": jnp.zeros((), jnp.int32),
        "local_end": jnp.zeros((), jnp.int32),
    }


def reset_kv_cache(kv: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Zero-reinitialisation fast path (causal_inference.py:296-302)."""
    return {
        "k": jnp.zeros_like(kv["k"]),
        "v": jnp.zeros_like(kv["v"]),
        "global_end": jnp.zeros((), jnp.int32),
        "local_end": jnp.zeros((), jnp.int32),
    }


def init_crossattn_cache(
    num_layers: int,
    batch_size: int,
    text_len: int,
    num_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Cross-attention K/V cache over the 512 text tokens
    (causal_inference.py:316-339). `is_init` lives host-side in the pipeline."""
    shape = (num_layers, batch_size, text_len, num_heads, head_dim)
    return {"k": jnp.zeros(shape, dtype=dtype), "v": jnp.zeros(shape, dtype=dtype)}


def plan_kv_update(
    kv: Dict[str, jnp.ndarray],
    current_start: jnp.ndarray,
    num_new: int,
    cache_size: int,
    sink_tokens: int,
    rolling: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute (shift, write_start, new_global_end, new_local_end).

    `shift` is the left-shift applied to the non-sink region before writing
    (0 unless rolling eviction triggers). All outputs are traced int32 scalars.
    """
    current_end = current_start + num_new
    appended = current_end - kv["global_end"]  # 0 on re-denoise of same block
    if rolling:
        # Reference math (causal_model.py:363-368): the evicted amount is
        # num_new + local_end - cache_size — based on the full write length,
        # NOT the net appended amount. The two differ when a write partially
        # overlaps already-cached positions (current_start < global_end <
        # current_end). sink_tokens only affects WHERE the shift applies
        # (shift_layer_cache pins the sink region), not the amount.
        overflow = (current_end > kv["global_end"]) & (
            num_new + kv["local_end"] > cache_size
        )
        shift = jnp.where(overflow, num_new + kv["local_end"] - cache_size, 0)
    else:
        shift = jnp.zeros((), jnp.int32)
    del sink_tokens  # shift application handles the sink region
    new_local_end = kv["local_end"] + appended - shift
    write_start = new_local_end - num_new
    return shift, write_start, current_end, new_local_end


def shift_layer_cache(
    buf: jnp.ndarray, shift: jnp.ndarray, sink_tokens: int
) -> jnp.ndarray:
    """Shift [B,S,N,D] left by `shift` beyond the sink region (dynamic gather).

    Mirrors the roll at causal_model.py:368-373; positions that shift past the
    end keep stale values — they are immediately overwritten or masked out.
    """
    S = buf.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0).squeeze(-1)
    src = jnp.where(idx >= sink_tokens, jnp.minimum(idx + shift, S - 1), idx)
    return jnp.take(buf, src, axis=1)
