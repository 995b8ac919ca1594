"""Pallas TPU conv kernel for the VAE's 3x3(x kt) convolutions.

STATUS: correct (tests/test_pallas_conv.py) but measured SLOWER than XLA's
conv on one v5e through the axon tunnel (0.73-0.78x at decoder shapes):
the halo is carried via kt*3 shifted input views (9x HBM traffic) because
manual-DMA kernels crash this environment's remote compiler, and the 16MB
VMEM with pallas double-buffering forces 1-2-row tiles, so per-step overhead
dominates. Kept as the starting point for a DMA-based rewrite on hardware
with a full toolchain. Background: XLA's conv at the VAE decoder's shapes
runs at 27-47% MXU (CLAUDE.md chip calibration) — the single largest cost
in the serving hot path after the DiT itself. The kernel rebuilds the conv
as im2col-in-VMEM + per-tap wide matmuls, the strategy the reference
delegates to TensorRT (demo_utils/vae.py:317-390 VAETRTWrapper):

  inputs: kt*3 shifted views x[tap : tap+T_out, dh : dh+H] (the (tap, dh)
          halo baked into XLA slices — BlockSpec blocks cannot overlap, and
          manual-DMA kernels crash this environment's remote compiler);
  grid (T_out, H/th); per step, per tap:
      patches[th, W, 9C] <- 9 dw/dh-shifted VMEM views
      acc += patches @ w[tap]        ([th*W, 9C] x [9C, Co] on the MXU)

K = 9C (864 at C=96) packs the MXU K dimension ~7x denser than XLA's
spatial-window walk.

Contract (matches models/vae.py conv3d): x [T_in, H+2, W+2, C] already
spatially padded, w [kt, 3, 3, C, Co], bias [Co]; stride 1, VALID;
y [T_in-kt+1, H, W, Co]. f32 accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(H: int, W: int, C: int, kt: int, budget: int = 11 << 20) -> int:
    Cp = (C + 127) // 128 * 128
    for th in (16, 12, 10, 8, 6, 5, 4, 3, 2, 1):
        if H % th:
            continue
        views = 2 * kt * 3 * th * (W + 2) * Cp * 2  # x2: pallas double-buffers
        patches = th * W * 9 * Cp * 2
        out = 2 * th * W * Cp * 2
        acc = th * W * Cp * 4
        if views + patches + out + acc <= budget:
            return th
    return 1


def _conv_kernel(
    *refs,
    kt: int,
    th: int,
    W: int,
    C: int,
    Cp: int,
):
    # refs: kt*3 view blocks [1, th, Wp, C], w [kt, 9*Cp, Co], b [1, Co],
    #       out [1, th, W, Co], patches scratch [th, W, 9*Cp].
    # Patch column slots are Cp (C rounded up to 128) so every VMEM write
    # lands at a lane-aligned offset — unaligned lane offsets crash this
    # environment's remote Mosaic compiler. The [C:Cp) pad lanes are zeroed
    # once (their weight rows are zero too, but VMEM garbage can be NaN and
    # NaN*0 = NaN).
    views = refs[: kt * 3]
    w_ref, b_ref, o_ref, p_scr = refs[kt * 3 :]

    if Cp != C:
        # one aligned full-buffer memset on the first grid step; the per-step
        # writes below never touch the [C:Cp) pad lanes, so they stay zero
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _zero_pad_lanes():
            p_scr[...] = jnp.zeros_like(p_scr)

    acc = jnp.zeros((th, W, o_ref.shape[-1]), jnp.float32)
    for tap in range(kt):
        for dh in range(3):
            v = views[tap * 3 + dh]
            for dw in range(3):
                col = (dh * 3 + dw) * Cp
                p_scr[:, :, col : col + C] = v[0, :, dw : dw + W, :]
        acc = acc + jax.lax.dot_general(
            p_scr[...],
            w_ref[tap],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = (acc + b_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th",))
def conv3x3(
    x: jnp.ndarray,   # [T_in, H+2, W+2, C] spatially pre-padded
    w: jnp.ndarray,   # [kt, 3, 3, C, Co]
    b: jnp.ndarray,   # [Co]
    th: int | None = None,
) -> jnp.ndarray:
    kt, kh, kw, C, Co = w.shape
    assert kh == 3 and kw == 3
    T_in, Hp, Wp, Cx = x.shape
    assert Cx == C
    H, W = Hp - 2, Wp - 2
    T_out = T_in - kt + 1
    if th is None:
        th = _pick_th(H, W, C, kt)
    Cp = (C + 127) // 128 * 128
    # [kt, 3, 3, C, Co] -> [kt, 9*Cp, Co]; rows [C:Cp) of each slot are zero
    w2 = jnp.pad(
        w.reshape(kt, 9, C, Co), ((0, 0), (0, 0), (0, Cp - C), (0, 0))
    ).reshape(kt, 9 * Cp, Co).astype(x.dtype)
    b2 = b.reshape(1, Co).astype(jnp.float32)
    # (tap, dh)-shifted views; dw stays in-VMEM via the Wp halo
    views = [
        jax.lax.slice(x, (tap, dh, 0, 0), (tap + T_out, dh + H, Wp, C))
        for tap in range(kt)
        for dh in range(3)
    ]

    kernel = functools.partial(_conv_kernel, kt=kt, th=th, W=W, C=C, Cp=Cp)
    grid = (T_out, H // th)
    view_spec = pl.BlockSpec((1, th, Wp, C), lambda t, hi: (t, hi, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[view_spec] * (kt * 3) + [
            pl.BlockSpec((kt, 9 * Cp, Co), lambda t, hi: (0, 0, 0)),
            pl.BlockSpec((1, Co), lambda t, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W, Co), lambda t, hi: (t, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T_out, H, W, Co), x.dtype),
        scratch_shapes=[pltpu.VMEM((th, W, 9 * Cp), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*views, w2, b2)
