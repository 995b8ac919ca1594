"""Attention kernels & mask builders.

One dispatcher replaces the reference's four backends (FlashAttention-2/3,
SageAttention, FlexAttention, SDPA — wan/modules/attention.py:150-212 and
causal_model.py:108-141):

  * `attention(...)` — dense attention with optional additive/boolean mask;
    XLA path (fused by the TPU compiler) or the Pallas flash kernel
    (ops/pallas_attention.py) for long-KV decode.
  * `blockwise_causal_mask(...)` — the block-causal structure used for
    prefill / training (mirrors get_block_mask / get_sdpa_mask semantics:
    kv < ends[q] | q == kv, with optional local window).

Masks here are built from broadcasted iota at trace time — no host-side
mask tensors, no padding to 128 (XLA handles ragged tiles natively).
"""
from __future__ import annotations


import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: avoids NaNs for all-masked rows

# Which path each entry point last took ("pallas" | "xla"), recorded at trace
# time. bench.py asserts the hot entries traced onto the Pallas path so a
# kernel regression fails loudly instead of silently costing ~1.7x.
KERNEL_PATHS: dict = {}


def _strict() -> bool:
    return os.getenv("RTV_STRICT_KERNELS", "0") in ("1", "true")


def _use_pallas() -> bool:
    if os.getenv("RTV_DISABLE_PALLAS", "0") in ("1", "true"):
        return False
    return jax.default_backend() == "tpu"


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Dense attention. q [B,Lq,N,D], k/v [B,Lk,N,D], mask broadcastable to
    [B,1|N,Lq,Lk] (bool: True = attend). Returns [B,Lq,N,D] in q.dtype.

    Softmax runs in float32 (parity with the reference backends).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if _use_pallas() and mask is None:
        try:
            from realtime_video_tpu.ops.pallas_attention import flash_attention

            out = flash_attention(q, k, v, mask=mask, scale=scale)
            KERNEL_PATHS["attention"] = "pallas"
            return out
        except Exception:  # pragma: no cover — fall back to XLA on failure
            if _strict():
                raise
    KERNEL_PATHS["attention"] = "xla"
    return xla_attention(q, k, v, mask=mask, scale=scale)


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, NEG_INF)
        else:
            logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bnqk,bknd->bqnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# mask builders (trace-time, iota-based)
# ---------------------------------------------------------------------------


def frame_block_ends(
    num_tokens: int, frame_seqlen: int, num_frame_per_block: int
) -> jnp.ndarray:
    """ends[i] = end token index (exclusive) of the block containing token i.

    Mirrors the `ends` array of get_block_mask (causal_model.py:119-132).
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, (num_tokens, 1), 0).squeeze(-1)
    block = frame_seqlen * num_frame_per_block
    return (idx // block + 1) * block


def blockwise_causal_mask(
    num_frames: int,
    frame_seqlen: int,
    num_frame_per_block: int,
    local_attn_size: int = -1,
    independent_first_frame: bool = False,
) -> jnp.ndarray:
    """[Lq, Lk] bool mask: kv < ends[q] | q == kv (+ local window).

    Mirrors get_block_mask / get_sdpa_mask (causal_model.py:41-141) and the
    i2v variant with the first frame as its own block (causal_model.py:764-823).
    """
    n = num_frames * frame_seqlen
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    block = frame_seqlen * num_frame_per_block
    if independent_first_frame:
        # first frame is its own block; later blocks start at frame 1
        shifted = jnp.maximum(q_idx - frame_seqlen, 0)
        ends = jnp.where(
            q_idx < frame_seqlen,
            frame_seqlen,
            frame_seqlen + (shifted // block + 1) * block,
        )
    else:
        ends = (q_idx // block + 1) * block
    mask = kv_idx < ends
    if local_attn_size != -1:
        mask = mask & (kv_idx >= ends - local_attn_size * frame_seqlen)
    return mask | (q_idx == kv_idx)


def teacher_forcing_mask(
    num_frames: int, frame_seqlen: int, num_frame_per_block: int
) -> jnp.ndarray:
    """[2L, 2L] mask for teacher-forcing training: sequence = [clean | noisy].

    clean tokens: blockwise-causal over clean; noisy tokens: own noisy block +
    clean tokens of strictly earlier blocks (+ diagonal).
    Mirrors _prepare_teacher_forcing_mask (causal_model.py:676-762).
    """
    L = num_frames * frame_seqlen
    n = 2 * L
    block = frame_seqlen * num_frame_per_block
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    clean_q = q_idx < L
    context_ends = (q_idx // block + 1) * block  # valid where clean_q
    clean_mask = clean_q & (kv_idx < context_ends)

    nq = q_idx - L  # noisy-local index, valid where ~clean_q
    noise_block = nq // block
    nn_start = L + noise_block * block
    nn_end = nn_start + block
    c1 = (kv_idx >= nn_start) & (kv_idx < nn_end)  # own noisy block
    c2 = kv_idx < noise_block * block  # earlier clean blocks
    noise_mask = (~clean_q) & (c1 | c2)
    return clean_mask | noise_mask | (q_idx == kv_idx)


def block_causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_tokens: int,
    local_window: Optional[int] = None,
) -> jnp.ndarray:
    """Blockwise-causal self attention (kv < ends[q], get_block_mask
    semantics) — Pallas flash kernel on TPU (no dense mask materialised),
    masked XLA fallback elsewhere."""
    if _use_pallas():
        try:
            from realtime_video_tpu.ops import pallas_attention

            out = pallas_attention.prefill_attention(
                q, k, v, block_tokens, local_window
            )
            KERNEL_PATHS["prefill"] = "pallas"
            return out
        except Exception:  # pragma: no cover
            if _strict():
                raise
    KERNEL_PATHS["prefill"] = "xla"
    L = q.shape[1]
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    ends = (q_idx // block_tokens + 1) * block_tokens
    mask = kv_idx < ends
    if local_window is not None:
        mask = mask & (kv_idx >= ends - local_window)
    mask = mask | (q_idx == kv_idx)
    return xla_attention(q, k, v, mask=mask[None, None])


def decode_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
) -> jnp.ndarray:
    """Cache-window decode attention: q attends to k/v positions in [lo, hi)
    (causal_model.py:386-390). Pallas flash kernel on TPU, masked XLA fallback
    elsewhere."""
    if _use_pallas():
        try:
            from realtime_video_tpu.ops import pallas_attention

            out = pallas_attention.decode_attention(q, k, v, lo, hi)
            KERNEL_PATHS["decode"] = "pallas"
            return out
        except Exception:  # pragma: no cover
            if _strict():
                raise
    KERNEL_PATHS["decode"] = "xla"
    num_kv = k.shape[1]
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, num_kv), 1)
    valid = (kv_pos >= lo) & (kv_pos < hi)
    return xla_attention(q, k, v, mask=valid[None, None, :, :])


def decode_window_mask(
    num_q: int,
    num_kv: int,
    kv_abs_start: jnp.ndarray,
    local_end: jnp.ndarray,
    max_attention_size: int,
) -> jnp.ndarray:
    """[1,1,num_q,num_kv] bool mask for cache-window decode attention.

    The KV buffer slice holds positions [kv_abs_start, kv_abs_start+num_kv);
    queries attend to positions in [local_end - max_attention_size, local_end)
    (causal_model.py:386-390).
    """
    kv_pos = (
        jax.lax.broadcasted_iota(jnp.int32, (1, num_kv), 1) + kv_abs_start
    )
    lo = jnp.maximum(local_end - max_attention_size, 0)
    valid = (kv_pos >= lo) & (kv_pos < local_end)
    return valid[None, None, :, :]  # broadcast over q
