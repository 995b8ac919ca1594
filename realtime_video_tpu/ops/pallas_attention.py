"""Pallas TPU flash attention for the block-causal decode/prefill hot paths.

One kernel replaces the reference's four attention backends (FlashAttention-2/3,
SageAttention, FlexAttention — wan/modules/attention.py, sage.py,
causal_model.py:298-392): an online-softmax flash kernel whose mask is
computed in-kernel from scalar bounds instead of dense mask tensors:

  * decode mode: queries attend to KV-buffer positions in [lo, hi)
    (the rolling-cache window, causal_model.py:386-390);
  * prefill mode: blockwise-causal — kv < ends[q] with
    ends[q] = (q // block_tokens + 1) * block_tokens, optional local window
    (get_block_mask semantics, causal_model.py:108-141).

Grid is (B, N, Q_blocks, KV_blocks) with KV innermost; running max/sum/acc
live in VMEM scratch across the KV sweep; fully-masked KV tiles are skipped.
Inputs are padded to tile multiples by the wrappers; scalar bounds keep the
pad out of the softmax.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
import os as _os

BQ = int(_os.getenv("RTV_ATTN_BQ", "512"))  # measured: 512/1024 beats 256/512 by 14%
BK = int(_os.getenv("RTV_ATTN_BK", "1024"))
# int8 QK^T tier (SageAttention analog) — opt-in until measured end-to-end
INT8_QK = _os.getenv("RTV_ATTN_INT8", "0") in ("1", "true")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(
    # scalar prefetch: [lo, hi, block_tokens, local_window] int32
    bounds_ref,
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BK, D]
    v_ref,  # [1, 1, BK, D]
    o_ref,  # [1, 1, BQ, D]
    m_scr,  # [BQ, 1] f32
    l_scr,  # [BQ, 1] f32
    acc_scr,  # [BQ, D] f32
    *,
    scale: float,
    mode: str,  # "window" | "block_causal"
    kv_len: int,
    int8_qk: bool = False,
):
    ki = pl.program_id(3)
    qi = pl.program_id(2)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    lo = bounds_ref[0]
    hi = bounds_ref[1]
    block_tokens = bounds_ref[2]
    local_window = bounds_ref[3]

    kv_base = ki * BK
    q_base = qi * BQ

    if mode == "window":
        # any overlap between [kv_base, kv_base+BK) and [lo, hi)?
        live = (kv_base < hi) & (kv_base + BK > lo)
    else:
        # block-causal: max end over this q tile is
        # ((q_base+BQ-1)//bt + 1) * bt; min start is max(0, end_min - window)
        q_last = q_base + BQ - 1
        end_max = (q_last // block_tokens + 1) * block_tokens
        end_min = (q_base // block_tokens + 1) * block_tokens
        lo_min = jnp.maximum(end_min - local_window, 0)
        live = (kv_base < end_max) & (kv_base + BK > lo_min)

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        if int8_qk:
            # SageAttention analog (sage.py / install_sage.sh tier): dynamic
            # per-row int8 QK^T on the MXU at 2x bf16 throughput. Softmax is
            # invariant to a per-q-row constant, so K is mean-smoothed first
            # (q·mean(k) shifts every logit in a row equally).
            km = jnp.mean(k.astype(jnp.float32), axis=0, keepdims=True)
            kf = k.astype(jnp.float32) - km
            qf = q.astype(jnp.float32)
            sq = jnp.max(jnp.abs(qf), axis=1, keepdims=True) / 127.0 + 1e-8
            sk = jnp.max(jnp.abs(kf), axis=1, keepdims=True) / 127.0 + 1e-8
            qi = jnp.round(qf / sq).astype(jnp.int8)
            ki8 = jnp.round(kf / sk).astype(jnp.int8)
            s32 = jax.lax.dot_general(
                qi, ki8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = s32.astype(jnp.float32) * (sq * sk.T) * scale  # [BQ, BK]
        else:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [BQ, BK]

        kv_pos = kv_base + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        if mode == "window":
            valid = (kv_pos >= lo) & (kv_pos < hi)
        else:
            q_pos = q_base + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
            ends = (q_pos // block_tokens + 1) * block_tokens
            valid = (kv_pos < ends) & (kv_pos >= ends - local_window)
            valid = valid | (q_pos == kv_pos)
        valid = valid & (kv_pos < kv_len)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_scr[...] = l_scr[...] * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        l = jnp.maximum(l_scr[...], 1e-20)
        o_ref[0, 0, :, :] = (acc_scr[...] / l).astype(o_ref.dtype)


def _flash_call(
    q: jnp.ndarray,  # [B, N, Lq, D] (Lq padded to BQ) — BNLD so block tiles
    k: jnp.ndarray,  # [B, N, Lk, D]   satisfy the (8,128) lowering constraint
    v: jnp.ndarray,
    bounds: jnp.ndarray,  # [4] int32
    scale: float,
    mode: str,
    kv_len: int,
) -> jnp.ndarray:
    b, n, lq, d = q.shape
    lk = k.shape[2]
    grid = (b, n, lq // BQ, lk // BK)
    kernel = functools.partial(
        _flash_kernel, scale=scale, mode=mode, kv_len=kv_len, int8_qk=INT8_QK
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, BQ, d), lambda b_, n_, qi, ki, bounds: (b_, n_, qi, 0)),
                pl.BlockSpec((1, 1, BK, d), lambda b_, n_, qi, ki, bounds: (b_, n_, ki, 0)),
                pl.BlockSpec((1, 1, BK, d), lambda b_, n_, qi, ki, bounds: (b_, n_, ki, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, BQ, d), lambda b_, n_, qi, ki, bounds: (b_, n_, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((BQ, 1), jnp.float32),
                pltpu.VMEM((BQ, 1), jnp.float32),
                pltpu.VMEM((BQ, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(bounds, q, k, v)


def _pad_seq(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    """Pad the L axis of [B, N, L, D] to a multiple of `mult`."""
    L = x.shape[2]
    pad = _round_up(L, mult) - L
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


def decode_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Window attention over a KV buffer slice: attend to positions [lo, hi).

    q [B,Lq,N,D], k/v [B,Lk,N,D]; lo/hi are traced int32 scalars relative to
    the k/v buffer indexing.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    Lq, Lk = q.shape[1], k.shape[1]
    qp = _pad_seq(q.transpose(0, 2, 1, 3), BQ)
    kp = _pad_seq(k.transpose(0, 2, 1, 3), BK)
    vp = _pad_seq(v.transpose(0, 2, 1, 3), BK)
    bounds = jnp.stack(
        [jnp.asarray(lo, jnp.int32), jnp.asarray(hi, jnp.int32),
         jnp.ones((), jnp.int32), jnp.zeros((), jnp.int32)]
    )
    out = _flash_call(qp, kp, vp, bounds, scale, "window", Lk)
    return out[:, :, :Lq].transpose(0, 2, 1, 3)


def prefill_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_tokens: int,
    local_window: Optional[int] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Blockwise-causal self attention: kv < ends[q], optional local window."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    Lq, Lk = q.shape[1], k.shape[1]
    if local_window is None:
        local_window = 1 << 30
    qp = _pad_seq(q.transpose(0, 2, 1, 3), BQ)
    kp = _pad_seq(k.transpose(0, 2, 1, 3), BK)
    vp = _pad_seq(v.transpose(0, 2, 1, 3), BK)
    bounds = jnp.stack(
        [jnp.zeros((), jnp.int32), jnp.asarray(Lk, jnp.int32),
         jnp.asarray(block_tokens, jnp.int32), jnp.asarray(local_window, jnp.int32)]
    )
    out = _flash_call(qp, kp, vp, bounds, scale, "block_causal", Lk)
    return out[:, :, :Lq].transpose(0, 2, 1, 3)


def flash_attention(q, k, v, mask=None, scale=None):
    """Generic entry used by ops.attention.attention() — only takes the fast
    path when no dense mask is given (cross-attention); masked variants go
    through the specialised entries above."""
    if mask is not None:
        raise NotImplementedError("dense-mask path stays on XLA")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    Lk = k.shape[1]
    return decode_attention(
        q, k, v, jnp.zeros((), jnp.int32), jnp.asarray(Lk, jnp.int32), scale
    )
