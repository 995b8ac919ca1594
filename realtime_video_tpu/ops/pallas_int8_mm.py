"""Fused int8 linear for the DiT block matmuls (quantise + s8 MXU dot +
dequant epilogue in ONE kernel).

The production XLA int8 path (models/wan_dit.py linear) runs three programs'
worth of HBM traffic per linear: a quantise-write fusion (read bf16, write
s8 — ~0.4 ms per FFN input in the round-4 trace, ~2.5x its own roofline),
the s8 matmul, and a dequant epilogue. The round-4 profile puts the int8
linears+elementwise at ~350 ms/block vs a ~175 ms roofline (docs/PARITY.md).
This kernel keeps the activation in bf16 in HBM and quantises PER TILE in
registers with the same per-tensor static scale, so the s8 copy of x never
exists in HBM, and the dequant (a_scale * w_scale[n] + bias) runs in the
matmul's own epilogue. NOTE: the in-kernel quantise multiplies by a
precomputed f32 reciprocal while the default XLA path divides — like
RTV_Q_RCP, quanta at exact-half rounding boundaries can differ by 1 LSB
(wan_dit.py:52-56); the A/B and tests compare within int8 tolerance, not
bit-exactly.

Reference role being chased: torchao int8/fp8 linears
(release_server.py:179-182). Routed from wan_dit.linear behind
RTV_DIT_PALLAS_MM (A/B-gated, docs/MEASUREMENTS.md round-5).

STATUS: MEASURED LOSER, kept opt-in. Fused A/B 2026-08-20 (window-stable,
default bracketed 9.125/9.124): RTV_DIT_PALLAS_MM=1 reads 8.234 fps (-9.8%).
Inside the megafused block program XLA fuses the quantise into producer
epilogues and pipelines the s8 matmuls better than this kernel's
per-tile requantise; the HBM-traffic argument above does not survive
in situ. Do not re-enable without a new in-situ lead.

Static-scale tier only (p["a_scale"] present — the serving default); the
dynamic-amax tier needs a global reduce before quantising and stays on XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel_kres(x_ref, w_ref, ws_ref, asc_ref, b_ref, o_ref, xq_ref,
                    *, out_dtype):
    # K-resident path (K <= 2048): grid (m, n) with the x block CONSTANT
    # across the n sweep (index map ignores n -> pallas skips the refetch),
    # quantised ONCE per m tile into a s8 VMEM scratch. x HBM traffic is 1x
    # the activation — the XLA path pays producer-write + quantise-fusion
    # read/write + matmul read (3x) plus a kernel launch.
    @pl.when(pl.program_id(1) == 0)
    def _quantise():
        inv_a = asc_ref[0, 0]
        xq_ref[...] = jnp.clip(
            jnp.round(x_ref[...].astype(jnp.float32) * inv_a), -127, 127
        ).astype(jnp.int8)

    acc = jnp.dot(xq_ref[...], w_ref[...], preferred_element_type=jnp.int32)
    a_scale = asc_ref[0, 1]
    y = acc.astype(jnp.float32) * (a_scale * ws_ref[0]) + b_ref[0]
    o_ref[...] = y.astype(out_dtype)


def _mm_kernel(x_ref, w_ref, ws_ref, asc_ref, b_ref, o_ref, acc_ref,
               *, nk: int, out_dtype):
    # x [bm, bk] bf16, w [bk, bn] s8, ws [1, bn] f32 (per-out-channel weight
    # scale), asc [1, 1] f32 (1/a_scale, a_scale), b [1, bn] f32, acc [bm,
    # bn] s32 scratch; k is the innermost grid axis.
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    inv_a = asc_ref[0, 0]
    xq = jnp.clip(
        jnp.round(x_ref[...].astype(jnp.float32) * inv_a), -127, 127
    ).astype(jnp.int8)
    acc_ref[...] += jnp.dot(xq, w_ref[...],
                            preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _emit():
        a_scale = asc_ref[0, 1]
        y = acc_ref[...].astype(jnp.float32) * (a_scale * ws_ref[0])
        y = y + b_ref[0]
        o_ref[...] = y.astype(out_dtype)


def _tile(dim: int, cap: int, mult: int) -> int:
    best = 0
    for t in range(mult, cap + 1, mult):
        if dim % t == 0:
            best = t
    return best


def int8_linear(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                a_scale: jnp.ndarray, bias=None, interpret: bool = False):
    """y = dequant(quantise(x) @ w_q) + bias.

    x [M, K] (or [*lead, M, K], flattened), w_q [K, N] s8, w_scale [N] f32,
    a_scale scalar f32 (static per-tensor activation scale), bias [N] f32
    or None. Returns bf16/x.dtype [.., M, N], or None when the shapes don't
    tile (caller falls back to the XLA path)."""
    lead = x.shape[:-2]
    M, K = x.shape[-2:]
    N = w_q.shape[-1]
    if any(d != 1 for d in lead) or K % 128:
        return None
    bk = K if K <= 2048 else _tile(K, 2048, 128)
    if not bk:
        return None

    def fits(bm, bn):  # double-buffered ins + outs; ~12MB budget
        scratch = bm * bk if bk == K else bm * bn * 4  # s8 xq | s32 acc
        vmem = (2 * bm * bk * x.dtype.itemsize + 2 * bk * bn  # x + s8 w
                + 2 * bm * bn * x.dtype.itemsize + scratch  # out + scratch
                + 3 * bm * bn * 4  # s32 dot result + f32 dequant temps: the
                # measured scoped-vmem stack at 4680-token serving shapes
                # exceeded the 16M limit by exactly this term (2026-08-20
                # smoke: est 11.5M -> actual 18.54M, go/compile-time-vmem-oom)
                + 3 * 2 * bn * 4)  # ws/asc/b rows
        return vmem <= (12 << 20)

    m_divs = sorted((d for d in range(8, min(M, 1024) + 1, 8) if M % d == 0),
                    reverse=True)
    n_divs = sorted((d for d in range(128, min(N, 1024) + 1, 128)
                     if N % d == 0), reverse=True)
    bm = bn = 0
    for m_try in m_divs:
        for n_try in n_divs:
            if fits(m_try, n_try):
                bm, bn = m_try, n_try
                break
        if bm:
            break
    if not bm or not bn:
        return None
    nk = K // bk
    asc = jnp.stack([1.0 / a_scale.astype(jnp.float32),
                     a_scale.astype(jnp.float32)]).reshape(1, 2)
    b = (bias.astype(jnp.float32) if bias is not None
         else jnp.zeros((N,), jnp.float32)).reshape(1, N)
    ws = w_scale.astype(jnp.float32).reshape(1, N)
    x2 = x.reshape(M, K)
    if nk == 1:
        out = pl.pallas_call(
            functools.partial(_mm_kernel_kres, out_dtype=x.dtype),
            grid=(M // bm, N // bn),
            in_specs=[
                pl.BlockSpec((bm, K), lambda m, n: (m, 0)),
                pl.BlockSpec((K, bn), lambda m, n: (0, n)),
                pl.BlockSpec((1, bn), lambda m, n: (0, n)),
                pl.BlockSpec((1, 2), lambda m, n: (0, 0)),
                pl.BlockSpec((1, bn), lambda m, n: (0, n)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda m, n: (m, n)),
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((bm, K), jnp.int8)],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20),  # default 16M rejects 4680-token
            # serving shapes (scoped-vmem stack OOM, 2026-08-20 smoke)
            interpret=interpret,
        )(x2, w_q, ws, asc, b)
    else:
        out = pl.pallas_call(
            functools.partial(_mm_kernel, nk=nk, out_dtype=x.dtype),
            grid=(M // bm, N // bn, nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda m, n, k: (m, k)),
                pl.BlockSpec((bk, bn), lambda m, n, k: (k, n)),
                pl.BlockSpec((1, bn), lambda m, n, k: (0, n)),
                pl.BlockSpec((1, 2), lambda m, n, k: (0, 0)),
                pl.BlockSpec((1, bn), lambda m, n, k: (0, n)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20),
            interpret=interpret,
        )(x2, w_q, ws, asc, b)
    return out.reshape(*lead, M, N) if lead else out
