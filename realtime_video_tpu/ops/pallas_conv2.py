"""Element-window Pallas conv for the VAE's 3x3 spatial convolutions.

Second engineering swing at the decoder-conv gap (VERDICT r4 #4): XLA's conv
engine runs the decoder's 3x3 convs at 25-47% MXU (docs/MEASUREMENTS.md), and
the reference buys this row's perf from a TensorRT int8 engine
(demo_utils/vae.py:317-390). The round-2 kernel (`ops/pallas_conv.py`) lost
at 0.73-0.78x XLA for two self-inflicted reasons: the halo was carried via
kt*3 SHIFTED INPUT VIEWS (9x HBM read of the input) because classic Blocked
BlockSpecs cannot overlap, and the full-im2col scratch forced 1-2-row tiles.

This kernel removes both with `pl.Element` block indexing (element-start
index maps -> OVERLAPPING row windows from ONE input, no shifted views, no
manual DMA):

  grid (N, H/th); per step the block is x[n, i*th : i*th+th+2, :, :] —
  th+2 rows including the halo, fetched once (HBM read amplification
  (th+2)/th ~= 1.2 at th=8, vs 9x before);
  per (di, dj) tap: ONE contiguous-reshape matmul over the full padded
  width, acc += (x[di:di+th] as [th*Wp, C]) @ w[di, dj], column-sliced to
  the dj alignment — no im2col scratch, no patch building, K = C (the
  taps are channel-merged by the caller, so C is already 3*C_orig = 288+
  at decoder shapes and the MXU K dimension is dense).

Integration: `models/vae.py _spatial_conv` routes here for 3x3 stride-1
convs when the RTV_VAE_CONV map names the "pallas" formulation; bf16 and
int8 (int32-accumulate) tiers both supported. Equality:
tests/test_pallas_conv2.py (interpret mode vs lax.conv).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil(a: int, b: int) -> int:
    return -(-a // b) * b


def _vmem_bytes(th: int, Wp: int, C: int, Co: int, xb: int, ob: int) -> int:
    Cp, Cop = _ceil(C, 128), _ceil(Co, 128)
    x_blk = 2 * (th + 2) * _ceil(Wp, 8) * Cp * xb  # double-buffered window
    w_blk = 9 * _ceil(C, 8) * Cop * xb  # resident (same block every step)
    out = 2 * th * _ceil(Wp - 2, 8) * Cop * ob
    acc = 2 * th * _ceil(Wp, 8) * Cop * 4  # matmul result + running acc
    return x_blk + w_blk + out + acc


def _pick_th(H: int, Wp: int, C: int, Co: int, xb: int, ob: int,
             budget: int = 20 << 20) -> int:
    # The kernel requests a raised scoped-vmem limit (64M, see pallas_call
    # below) because the default 16M rejects real serving shapes: dec96
    # (482x834, 288->96) measured 16.32M actual vs a 12M estimate — the
    # static model undercounts the per-tap dot/accumulate temporaries by
    # ~1.7x (2026-08-20 on-chip smoke). Budget 20M ~= 34M actual worst
    # case, comfortably under the raised limit while keeping tiles small
    # enough to double-buffer.
    for th in (16, 12, 10, 8, 6, 5, 4, 3, 2):
        if H % th == 0 and _vmem_bytes(th, Wp, C, Co, xb, ob) <= budget:
            return th
    return 0


def _kernel(x_ref, w_ref, o_ref, *, th: int, W: int, acc_dtype,
            bf16_dot: bool):
    x = x_ref[0]  # [th+2, Wp, C]
    w = w_ref[...]  # [3, 3, C, Co]
    Wp = x.shape[1]
    acc = None
    for di in range(3):
        # rank-3 dot_general contracting C: one [Wp, C] @ [C, Co] matmul per
        # row of the th-slice, no reshape — merging (th, Wp) via reshape
        # crashes the Mosaic backend for s8 operands ((32,128) tiling; the
        # int8 VAE tier hit it in situ, 2026-08-20), and the dj alignment is
        # a column slice of the RESULT, not an input restaging
        xs = x[di : di + th]
        for dj in range(3):
            wt = w[di, dj]
            if bf16_dot:
                # ragged-C s8 dots (C % 128 != 0) crash Mosaic; a bf16 dot
                # with f32 accumulate is bit-exact for the int8 tier while
                # every intermediate integer stays < 2^24 (s8 values are
                # exact in bf16, products exact in f32, per-tap sums
                # <= C * 127^2 — the caller gates C <= 1040), and the f32 ->
                # s32 cast below is exact for integers
                yf = jax.lax.dot_general(
                    xs.astype(jnp.bfloat16), wt.astype(jnp.bfloat16),
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(acc_dtype)
            else:
                yf = jax.lax.dot_general(
                    xs, wt, (((2,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype)
            a = yf[:, dj : dj + W, :]
            acc = a if acc is None else acc + a
    o_ref[...] = acc.astype(o_ref.dtype)[None]


def conv3x3(x: jnp.ndarray, w: jnp.ndarray, preferred=None,
            interpret: bool = False):
    """3x3 stride-1 VALID conv of pre-padded x [N, H+2, W+2, C] with
    w [3, 3, C, Co] -> [N, H, W, Co]. preferred=jnp.int32 for the int8 tier
    (int32 accumulate/emit, dequant stays with the caller); float inputs
    accumulate f32 and emit x.dtype. Returns None (at trace time) when no
    tile fits — caller falls back to XLA's conv."""
    N, Hp, Wp, C = x.shape
    H, W = Hp - 2, Wp - 2
    Co = w.shape[-1]
    if preferred is not None:
        acc_dtype = out_dtype = preferred
    else:
        acc_dtype, out_dtype = jnp.float32, x.dtype
    bf16_dot = x.dtype == jnp.int8 and C % 128 != 0
    if bf16_dot and C > 1040:
        # bf16-dot exactness bound: per-tap |sum| <= C * 127^2 must stay
        # < 2^24 for the f32 accumulate to be integer-exact (kernel note)
        return None
    th = _pick_th(H, Wp, C, Co, x.dtype.itemsize,
                  jnp.dtype(out_dtype).itemsize)
    if th == 0:
        return None
    return pl.pallas_call(
        functools.partial(_kernel, th=th, W=W, acc_dtype=acc_dtype,
                          bf16_dot=bf16_dot),
        grid=(N, H // th),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(th + 2), pl.Element(Wp),
                 pl.Element(C)),
                lambda n, i: (n, i * th, 0, 0),
            ),
            pl.BlockSpec((3, 3, C, Co), lambda n, i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W, Co), lambda n, i: (n, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, Co), out_dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the default 16M scoped-vmem stack limit rejects real decoder
            # shapes (docstring); v5e VMEM is far larger — raise it
            vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(x, w)
