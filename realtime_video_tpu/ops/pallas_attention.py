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

Perf structure (v2 — the VPU was the round-1 bottleneck at 29% MXU):
  * two-level KV tiling: a BKM-wide DMA (major) tile, processed as unrolled
    BK-wide compute sub-tiles, so Mosaic can overlap sub-tile i+1's QK^T
    (MXU) with sub-tile i's softmax update (VPU);
  * softmax scale and log2(e) are folded into q by the wrappers and the
    kernel exponentiates with exp2 — no per-element scale multiply;
  * decode-window masking is column-only, so it is applied as a [1, BK]
    additive bias broadcast over rows (1 VPU op/element instead of ~7);
  * prefill masking builds ends[q] as a [BQ, 1] column against a [1, BK]
    row (2 compares + select), with block_tokens/local_window static.

Grid is (B, N, Q_blocks, KV_major_blocks) with KV innermost; running
max/sum/acc live in VMEM scratch across the KV sweep; fully-masked major
tiles are skipped. Inputs are padded to tile multiples by the wrappers;
masking keeps the pad out of the softmax (an all-masked sub-tile is
self-healing: its unit contributions are cancelled by the exp2(m_prev -
m_new) = 0 correction once a live tile arrives, and rows that never see a
live column are sliced away by the wrappers).
"""
from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634

# measured on one v5e at decode shapes (4680 q / 9360 kv / 12 heads):
# 1024/2048/1024 -> 2.81 ms/layer vs round-1's 4.78 ms (512/1024 single-level)
BQ = int(_os.getenv("RTV_ATTN_BQ", "1024"))
BKM = int(_os.getenv("RTV_ATTN_BKM", "2048"))  # major (DMA) KV tile
BK = int(_os.getenv("RTV_ATTN_BK", "1024"))  # inner (compute) KV sub-tile
# int8 QK^T tier (SageAttention analog) — opt-in; measured slower end-to-end
# at serving shapes (6.89 vs 7.67 fps) because the dynamic per-row
# quantization VPU work outweighs the int8 MXU gain.
INT8_QK = _os.getenv("RTV_ATTN_INT8", "0") in ("1", "true")
# skewed software pipeline for decode-window attention: V lags K by one grid
# step and scores spill to a double-buffered VMEM scratch, so tile k+1's
# QK^T (MXU) is data-independent of tile k's softmax (VPU) within one step.
# Measured SLOWER (3.59 vs 2.81 ms/layer): the scratch spill traffic beats
# any overlap Mosaic finds. Kept opt-in for re-testing on other chips.
SKEW = _os.getenv("RTV_ATTN_SKEW", "0") in ("1", "true")
# staticmax + skew hybrid (round-3 retry of the skew idea): the static-max
# form has NO cross-tile alpha/rescale chain, so tile contributions are fully
# independent — the only coupling the skew must carry across grid steps is
# the score spill itself. V lags K by one grid step; phase B is just
# exp2 + rowsum + PV with no running-max serialization. Opt-in for on-chip
# A/B (the plain skew measured 3.59 ms/layer vs 2.35 staticmax).
# STATUS (r4 ratified): UNCOMPILABLE in this env — the remote compile helper
# hangs >30 min on the double-buffered score spill. Measured-parked.
SKEW2 = _os.getenv("RTV_ATTN_SKEW2", "0") in ("1", "true")
BK2 = int(_os.getenv("RTV_ATTN_SKEW2_BK", "512"))  # skew2 KV tile (spill size)
# pad-free KV sweep: run the KV grid as ceil(Lk/tile) over the UNPADDED
# window instead of jnp.pad-ing K/V to a tile multiple (the pads copy the
# full 28.7 MB window twice per layer per step — ~0.13 ms/layer in traces).
# The tail tile's out-of-bounds columns are discarded by select-masking (not
# additive bias, so garbage/NaN loads cannot leak through exp2) and the tail
# V rows are zeroed so 0-probability columns cannot poison the PV matmul.
# STATUS (r4 ratified): measured 2.444 ms/layer vs 2.376 staticmax default
# (-2.9% — the pads were cheaper than the tail bookkeeping). Measured-parked.
NOPAD = _os.getenv("RTV_ATTN_NOPAD", "0") in ("1", "true")
# static-max softmax: qk-normed logits are bounded, so a per-call upper bound
# M (from the MEASURED max row norms of q and k) replaces the running max —
# no rowmax pass, no alpha corrections, no serial m-chain across KV tiles.
# M cancels exactly in acc/l, so the result is bit-comparable to the
# running-max kernel; the only hazard is f32 underflow of 2^(s_max - M),
# which needs s_max - M < -149 — i.e. ALL keys anti-aligned with a query AND
# row norms above ~4500 (rms-normed rows sit near sqrt(128)) — jointly
# impossible at these shapes. Measured 2.35 vs 2.81 ms/layer (60% MXU):
# default ON for decode; RTV_ATTN_STATICMAX=0 restores the running max.
STATIC_MAX = _os.getenv("RTV_ATTN_STATICMAX", "1") in ("1", "true")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(
    # scalar prefetch: [lo, hi] int32 (window mode; prefill bounds are static)
    bounds_ref,
    q_ref,  # [1, 1, BQ, D] — pre-scaled by softmax_scale * log2(e)
    k_ref,  # [1, 1, BKM, D]
    v_ref,  # [1, 1, BKM, D]
    o_ref,  # [1, 1, BQ, D]
    m_scr,  # [BQ, 1] f32 (log2 domain)
    l_scr,  # [BQ, 1] f32
    acc_scr,  # [BQ, D] f32
    *,
    mode: str,  # "window" | "block_causal"
    kv_len: int,
    block_tokens: int,
    local_window: Optional[int],
    bq: int,
    bkm: int,
    bk: int,
    int8_qk: bool,
    lk_arr: int,  # K/V array length; the ceil grid may overshoot it (NOPAD)
):
    ki = pl.program_id(3)
    qi = pl.program_id(2)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    kvm_base = ki * bkm
    q_base = qi * bq

    if mode == "window":
        lo = bounds_ref[0]
        hi = bounds_ref[1]
        live = (kvm_base < hi) & (kvm_base + bkm > lo)
    else:
        # block-causal: max end over this q tile; min start given the window
        q_last = q_base + bq - 1
        end_max = (q_last // block_tokens + 1) * block_tokens
        if local_window is None:
            lo_min = 0
        else:
            end_min = (q_base // block_tokens + 1) * block_tokens
            lo_min = jnp.maximum(end_min - local_window, 0)
        live = (kvm_base < end_max) & (kvm_base + bkm > lo_min)

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0, :, :]
        # unrolled sub-tile sweep: sub-tile i+1's QK^T has no dependency on
        # sub-tile i's softmax chain, so the scheduler can overlap MXU & VPU
        for si in range(bkm // bk):
            kv_base = kvm_base + si * bk
            k = k_ref[0, 0, si * bk : (si + 1) * bk, :]
            v = v_ref[0, 0, si * bk : (si + 1) * bk, :]
            if int8_qk:
                # SageAttention analog: dynamic per-row int8 QK^T at 2x bf16
                # MXU throughput. Softmax is invariant to a per-q-row
                # constant, so K is mean-smoothed first. (q is pre-scaled, so
                # the sq scale already carries softmax_scale * log2e.)
                km = jnp.mean(k.astype(jnp.float32), axis=0, keepdims=True)
                kf = k.astype(jnp.float32) - km
                qf = q.astype(jnp.float32)
                sq = jnp.max(jnp.abs(qf), axis=1, keepdims=True) / 127.0 + 1e-8
                sk = jnp.max(jnp.abs(kf), axis=1, keepdims=True) / 127.0 + 1e-8
                qi8 = jnp.round(qf / sq).astype(jnp.int8)
                ki8 = jnp.round(kf / sk).astype(jnp.int8)
                s32 = jax.lax.dot_general(
                    qi8, ki8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                s = s32.astype(jnp.float32) * (sq * sk.T)  # [bq, bk]
            else:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bq, bk], already in log2 units

            col = kv_base + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
            nk_static = (lk_arr + bkm - 1) // bkm
            if (nk_static - 1) * bkm + (si + 1) * bk > lk_arr:
                # statically-tail sub-tile (NOPAD ceil grid): zero undefined
                # V rows so 0-probability columns cannot poison the PV matmul
                colv = kv_base + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
                v = jnp.where((ki != nk_static - 1) | (colv < lk_arr), v, 0)
            if mode == "window":
                # column-only validity; select (not additive bias) so an
                # undefined tail load cannot leak NaN/Inf through the max
                valid = (col >= lo) & (col < hi)
                s = jnp.where(valid, s, NEG_INF)
            else:
                q_pos = q_base + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
                # kv_len clamps only the UPPER bound; the local-window start
                # uses the unclamped block end so a trailing partial block
                # does not slide the window down and admit evicted keys
                # (reference get_block_mask, causal_model.py:108-141)
                ends = (q_pos // block_tokens + 1) * block_tokens
                valid = col < jnp.minimum(ends, kv_len)
                if local_window is not None:
                    valid = valid & (col >= ends - local_window)
                    valid = valid | (q_pos == col)
                s = jnp.where(valid, s, NEG_INF)

            m_prev = m_scr[...]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2(m_prev - m_new)
            p = jnp.exp2(s - m_new)
            l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[...] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        l = jnp.maximum(l_scr[...], 1e-20)
        o_ref[0, 0, :, :] = (acc_scr[...] / l).astype(o_ref.dtype)


def _staticmax_kernel(
    bounds_ref,  # [lo, hi] int32
    m_ref,  # [1] f32 — upper bound on the (pre-scaled, log2-domain) logits
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BKM, D]
    v_ref,  # [1, 1, BKM, D]
    o_ref,  # [1, 1, BQ, D]
    l_scr,  # [BQ, 1] f32
    acc_scr,  # [BQ, D] f32
    *,
    bq: int,
    bkm: int,
    bk: int,
    lk_arr: int,  # K/V array length; the ceil grid may overshoot it (NOPAD)
):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    nk_static = (lk_arr + bkm - 1) // bkm
    lo = bounds_ref[0]
    hi = bounds_ref[1]
    M = m_ref[0]

    @pl.when(ki == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    kvm_base = ki * bkm
    live = (kvm_base < hi) & (kvm_base + bkm > lo)

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0, :, :]
        for si in range(bkm // bk):
            kv_base = kvm_base + si * bk
            k = k_ref[0, 0, si * bk : (si + 1) * bk, :]
            v = v_ref[0, 0, si * bk : (si + 1) * bk, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            col = kv_base + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
            # select (not additive bias): out-of-bounds tail loads are
            # undefined and a NaN/Inf score must not survive the masking
            p = jnp.where((col >= lo) & (col < hi),
                          jnp.exp2(s - M), 0.0)  # p <= 1 by construction of M
            if (nk_static - 1) * bkm + (si + 1) * bk > lk_arr:
                # statically-tail sub-tile: zero the undefined V rows so the
                # 0-probability columns cannot poison the PV matmul with NaN
                colv = kv_base + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
                v = jnp.where((ki != nk_static - 1) | (colv < lk_arr), v, 0)
            l_scr[...] = l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
            acc_scr[...] = acc_scr[...] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(ki == nk - 1)
    def _finish():
        l = jnp.maximum(l_scr[...], 1e-30)
        o_ref[0, 0, :, :] = (acc_scr[...] / l).astype(o_ref.dtype)


def _staticmax_call(
    q: jnp.ndarray,  # [B, N, Lq, D] padded, pre-scaled
    k: jnp.ndarray,
    v: jnp.ndarray,
    bounds: jnp.ndarray,  # [2] int32
    m_bound: jnp.ndarray,  # [1] f32
    bq: int,
    bkm: int,
    bk: int,
) -> jnp.ndarray:
    b, n, lq, d = q.shape
    lk = k.shape[2]
    grid = (b, n, lq // bq, (lk + bkm - 1) // bkm)
    kernel = functools.partial(_staticmax_kernel, bq=bq, bkm=bkm, bk=bk,
                               lk_arr=lk)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b_, n_, qi, ki, bounds, m: (b_, n_, qi, 0)),
                pl.BlockSpec((1, 1, bkm, d), lambda b_, n_, qi, ki, bounds, m: (b_, n_, ki, 0)),
                pl.BlockSpec((1, 1, bkm, d), lambda b_, n_, qi, ki, bounds, m: (b_, n_, ki, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, d), lambda b_, n_, qi, ki, bounds, m: (b_, n_, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(bounds, m_bound, q, k, v)


def _staticmax_skew_kernel(
    bounds_ref,  # [lo, hi] int32
    m_ref,  # [1] f32 — upper bound on the (pre-scaled, log2-domain) logits
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BK, D]  tile min(ki, nk-1)
    v_ref,  # [1, 1, BK, D]  tile max(ki-1, 0)  (lags K by one step)
    o_ref,  # [1, 1, BQ, D]
    s_scr,  # [2, BQ, BK] f32 — double-buffered masked scores (incl. -M)
    l_scr,  # [BQ, 1] f32
    acc_scr,  # [BQ, D] f32
    *,
    bq: int,
    bk: int,
    nk: int,  # real KV tiles; the grid runs nk+1 steps
    lk_arr: int,  # K/V array length; the ceil grid may overshoot it (NOPAD)
):
    ki = pl.program_id(3)
    lo = bounds_ref[0]
    hi = bounds_ref[1]
    M = m_ref[0]

    @pl.when(ki == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # phase A (MXU): score tile min(ki, nk-1) into the spill buffer. The -M
    # shift rides the mask bias, so phase B is exp2 directly on the spill.
    kt = jnp.minimum(ki, nk - 1)
    kv_base = kt * bk
    q = q_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k_ref[0, 0, :, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = kv_base + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
    # select (not additive bias): with an unpadded tail tile (NOPAD ceil
    # grid) the out-of-bounds K rows are undefined and a NaN score must not
    # survive the masking (hi <= lk_arr, so col < hi covers the overshoot)
    s_scr[ki % 2] = jnp.where((col >= lo) & (col < hi), s - M, NEG_INF)

    # phase B (VPU + MXU): tile ki-1's contribution — NO running max, no
    # alpha corrections, no cross-tile data dependency beyond the spill:
    # phase A of step ki is free to overlap with phase B of step ki.
    @pl.when(ki > 0)
    def _process():
        p = jnp.exp2(s_scr[(ki + 1) % 2])  # <= 1 by construction of M
        v = v_ref[0, 0, :, :]
        if nk * bk > lk_arr:
            # unpadded tail tile (NOPAD): zero the undefined V rows so the
            # 0-probability columns cannot poison the PV matmul with NaN
            colv = (ki - 1) * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bk, 1), 0
            )
            v = jnp.where((ki - 1 != nk - 1) | (colv < lk_arr), v, 0)
        l_scr[...] = l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == nk)
    def _finish():
        l = jnp.maximum(l_scr[...], 1e-30)
        o_ref[0, 0, :, :] = (acc_scr[...] / l).astype(o_ref.dtype)


def _staticmax_skew_call(
    q: jnp.ndarray,  # [B, N, Lq, D] padded, pre-scaled
    k: jnp.ndarray,
    v: jnp.ndarray,
    bounds: jnp.ndarray,  # [2] int32
    m_bound: jnp.ndarray,  # [1] f32
    bq: int,
    bk: int,
) -> jnp.ndarray:
    b, n, lq, d = q.shape
    lk = k.shape[2]
    nk = (lk + bk - 1) // bk
    grid = (b, n, lq // bq, nk + 1)
    kernel = functools.partial(_staticmax_skew_kernel, bq=bq, bk=bk, nk=nk,
                               lk_arr=lk)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b_, n_, qi, ki, bounds, m: (b_, n_, qi, 0)),
                pl.BlockSpec(
                    (1, 1, bk, d),
                    lambda b_, n_, qi, ki, bounds, m: (b_, n_, jnp.minimum(ki, nk - 1), 0),
                ),
                pl.BlockSpec(
                    (1, 1, bk, d),
                    lambda b_, n_, qi, ki, bounds, m: (b_, n_, jnp.maximum(ki - 1, 0), 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, d), lambda b_, n_, qi, ki, bounds, m: (b_, n_, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, bq, bk), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(bounds, m_bound, q, k, v)


def _logit_bound(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """[1] f32 upper bound on q·k over all (row, col) pairs: max row norm of
    q times max row norm of k (q already carries scale*log2e)."""
    qn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)))
    kn = jnp.sqrt(jnp.max(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1)))
    return (qn * kn)[None] + 1e-3


def _skew_kernel(
    bounds_ref,  # [lo, hi] int32
    q_ref,  # [1, 1, BQ, D] — pre-scaled by softmax_scale * log2(e)
    k_ref,  # [1, 1, BK, D]  tile min(ki, nk-1)
    v_ref,  # [1, 1, BK, D]  tile max(ki-1, 0)  (lags K by one step)
    o_ref,  # [1, 1, BQ, D]
    s_scr,  # [2, BQ, BK] f32 — double-buffered scores
    m_scr,  # [BQ, 1] f32
    l_scr,  # [BQ, 1] f32
    acc_scr,  # [BQ, D] f32
    *,
    bq: int,
    bk: int,
    nk: int,  # real KV tiles; the grid runs nk+1 steps
):
    ki = pl.program_id(3)
    lo = bounds_ref[0]
    hi = bounds_ref[1]

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # phase A: score tile min(ki, nk-1) -> s_scr[ki % 2]. Unconditional
    # straight-line code (dead columns masked by the bias; a fully-masked
    # tile contributes 0 via the exp2 corrections) to maximise the
    # scheduler's freedom to overlap with phase B's VPU chain.
    kt = jnp.minimum(ki, nk - 1)
    kv_base = kt * bk
    q = q_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k_ref[0, 0, :, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = kv_base + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
    bias = jnp.where((col >= lo) & (col < hi), 0.0, NEG_INF)
    s_scr[ki % 2] = s + bias

    # phase B: online-softmax + PV for tile ki-1 (scores from the other
    # scratch buffer, V from the lagged input block)
    @pl.when(ki > 0)
    def _process():
        sp = s_scr[(ki + 1) % 2]
        v = v_ref[0, 0, :, :]
        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(sp, axis=1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(sp - m_new)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = m_new

    @pl.when(ki == nk)
    def _finish():
        l = jnp.maximum(l_scr[...], 1e-20)
        o_ref[0, 0, :, :] = (acc_scr[...] / l).astype(o_ref.dtype)


def _skew_call(
    q: jnp.ndarray,  # [B, N, Lq, D] padded
    k: jnp.ndarray,  # [B, N, Lk, D] padded
    v: jnp.ndarray,
    bounds: jnp.ndarray,  # [2] int32
    bq: int,
    bk: int,
) -> jnp.ndarray:
    b, n, lq, d = q.shape
    lk = k.shape[2]
    nk = lk // bk
    grid = (b, n, lq // bq, nk + 1)
    kernel = functools.partial(_skew_kernel, bq=bq, bk=bk, nk=nk)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b_, n_, qi, ki, bounds: (b_, n_, qi, 0)),
                pl.BlockSpec(
                    (1, 1, bk, d),
                    lambda b_, n_, qi, ki, bounds: (b_, n_, jnp.minimum(ki, nk - 1), 0),
                ),
                pl.BlockSpec(
                    (1, 1, bk, d),
                    lambda b_, n_, qi, ki, bounds: (b_, n_, jnp.maximum(ki - 1, 0), 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, d), lambda b_, n_, qi, ki, bounds: (b_, n_, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, bq, bk), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(bounds, q, k, v)


def _flash_call(
    q: jnp.ndarray,  # [B, N, Lq, D] (Lq padded) — BNLD so block tiles
    k: jnp.ndarray,  # [B, N, Lk, D]   satisfy the (8,128) lowering constraint
    v: jnp.ndarray,
    bounds: jnp.ndarray,  # [2] int32 (lo, hi) — window mode only
    mode: str,
    kv_len: int,
    block_tokens: int = 1,
    local_window: Optional[int] = None,
    bq: int = 0,
    bkm: int = 0,
    bk: int = 0,
) -> jnp.ndarray:
    b, n, lq, d = q.shape
    lk = k.shape[2]
    grid = (b, n, lq // bq, (lk + bkm - 1) // bkm)
    kernel = functools.partial(
        _flash_kernel, mode=mode, kv_len=kv_len, block_tokens=block_tokens,
        local_window=local_window, bq=bq, bkm=bkm, bk=bk, int8_qk=INT8_QK,
        lk_arr=lk,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b_, n_, qi, ki, bounds: (b_, n_, qi, 0)),
                pl.BlockSpec((1, 1, bkm, d), lambda b_, n_, qi, ki, bounds: (b_, n_, ki, 0)),
                pl.BlockSpec((1, 1, bkm, d), lambda b_, n_, qi, ki, bounds: (b_, n_, ki, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, d), lambda b_, n_, qi, ki, bounds: (b_, n_, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(bounds, q, k, v)


def _tiles_for(lq: int, lk: int):
    """Adapt tile sizes to short sequences (e.g. 512-token cross-attn KV) so
    padding does not multiply the sweep cost."""
    bq = min(BQ, _round_up(lq, 128))
    bk = min(BK, _round_up(lk, 128))
    bkm = min(BKM, _round_up(lk, bk))
    bkm = (bkm // bk) * bk  # bkm must be a multiple of bk
    return bq, bkm, bk


def _pad_seq(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    """Pad the L axis of [B, N, L, D] to a multiple of `mult`."""
    L = x.shape[2]
    pad = _round_up(L, mult) - L
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


def _prescale(q: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Fold softmax scale and log2(e) into q (kernel exponentiates via exp2)."""
    return (q * jnp.asarray(scale * LOG2E, q.dtype)).astype(q.dtype)


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
    bq, bkm, bk = _tiles_for(Lq, Lk)
    bounds = jnp.stack(
        [jnp.asarray(lo, jnp.int32),
         jnp.minimum(jnp.asarray(hi, jnp.int32), Lk)]
    )
    if SKEW2 and not INT8_QK:
        bk2 = min(BK2, _round_up(Lk, 128))
        # s_scr is [2, bq, bk2] f32 — cap the spill at ~8 MiB (the SKEW
        # sibling bounds bq the same way; over-budget VMEM crashes the
        # remote compile helper): 8*bq*bk2 bytes <= 8 MiB.
        bq = min(bq, max(128, (1 << 20) // bk2 // 128 * 128))
        qp = _pad_seq(_prescale(q, scale).transpose(0, 2, 1, 3), bq)
        if NOPAD:
            # ceil KV grid + in-kernel tail masking (see the staticmax path)
            kp = k.transpose(0, 2, 1, 3)
            vp = v.transpose(0, 2, 1, 3)
        else:
            kp = _pad_seq(k.transpose(0, 2, 1, 3), bk2)
            vp = _pad_seq(v.transpose(0, 2, 1, 3), bk2)
        m_bound = _logit_bound(qp, k)
        out = jax.lax.cond(
            m_bound[0] < 64.0,  # same underflow guard as the staticmax path
            lambda: _staticmax_skew_call(
                qp, kp, vp, bounds, m_bound, bq=bq, bk=bk2
            ),
            lambda: _flash_call(
                qp, kp, vp, bounds, "window", Lk, bq=bq, bkm=bk2, bk=bk2
            ),
        )
        return out[:, :, :Lq].transpose(0, 2, 1, 3)
    if SKEW and not INT8_QK:
        bq = min(bq, 512)  # s_scr is [2, bq, bk] f32 — bound VMEM
        qp = _pad_seq(_prescale(q, scale).transpose(0, 2, 1, 3), bq)
        kp = _pad_seq(k.transpose(0, 2, 1, 3), bk)
        vp = _pad_seq(v.transpose(0, 2, 1, 3), bk)
        out = _skew_call(qp, kp, vp, bounds, bq=bq, bk=bk)
        return out[:, :, :Lq].transpose(0, 2, 1, 3)
    if STATIC_MAX and not INT8_QK:
        qp = _pad_seq(_prescale(q, scale).transpose(0, 2, 1, 3), bq)
        if NOPAD:
            # ceil KV grid + in-kernel tail masking instead of padding the
            # 28.7 MB window twice per call (~0.13 ms/layer of pad copies)
            kp = k.transpose(0, 2, 1, 3)
            vp = v.transpose(0, 2, 1, 3)
        else:
            kp = _pad_seq(k.transpose(0, 2, 1, 3), bkm)
            vp = _pad_seq(v.transpose(0, 2, 1, 3), bkm)
        m_bound = _logit_bound(qp, k)
        # the no-running-max kernel is only safe when exp2(s - M) cannot
        # underflow a whole row (qk-normed inputs keep M ~ 2). A caller with
        # large row norms falls back to the running-max kernel at runtime
        # rather than silently zeroing rows.
        out = jax.lax.cond(
            m_bound[0] < 64.0,
            lambda: _staticmax_call(
                qp, kp, vp, bounds, m_bound, bq=bq, bkm=bkm, bk=bk
            ),
            lambda: _flash_call(
                qp, kp, vp, bounds, "window", Lk, bq=bq, bkm=bkm, bk=bk
            ),
        )
        return out[:, :, :Lq].transpose(0, 2, 1, 3)
    qp = _pad_seq(_prescale(q, scale).transpose(0, 2, 1, 3), bq)
    if NOPAD and not INT8_QK:
        kp = k.transpose(0, 2, 1, 3)
        vp = v.transpose(0, 2, 1, 3)
    else:
        kp = _pad_seq(k.transpose(0, 2, 1, 3), bkm)
        vp = _pad_seq(v.transpose(0, 2, 1, 3), bkm)
    out = _flash_call(qp, kp, vp, bounds, "window", Lk, bq=bq, bkm=bkm, bk=bk)
    return out[:, :, :Lq].transpose(0, 2, 1, 3)


def prefill_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_tokens: int,
    local_window: Optional[int] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Blockwise-causal self attention: kv < ends[q], optional local window.

    block_tokens and local_window are static Python ints — the mask math
    compiles to constants per tile."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    Lq, Lk = q.shape[1], k.shape[1]
    bq, bkm, bk = _tiles_for(Lq, Lk)
    qp = _pad_seq(_prescale(q, scale).transpose(0, 2, 1, 3), bq)
    kp = _pad_seq(k.transpose(0, 2, 1, 3), bkm)
    vp = _pad_seq(v.transpose(0, 2, 1, 3), bkm)
    bounds = jnp.zeros((2,), jnp.int32)  # unused in block_causal mode
    out = _flash_call(
        qp, kp, vp, bounds, "block_causal", Lk,
        block_tokens=block_tokens, local_window=local_window,
        bq=bq, bkm=bkm, bk=bk,
    )
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
