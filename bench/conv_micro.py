"""VAE-decoder conv formulation microbench at the three hot shapes.

Roofline (bench/vae_roofline.py): the decoder's cost is dominated by 3x3x3
res-block convs at 96ch@480x832 (T=4), 192ch@240x416 (T=4), 384ch@120x208
(T=2) — 31 TFLOP/block at a measured ~23% MXU through XLA conv. This sweeps
alternative formulations of the SAME math to find the fast one:

  conv     — the production path: temporal taps channel-concatenated, one
             lax.conv 3x3 with 3C input channels (models/vae.py:96-107)
  shifted  — y = sum_{di,dj} shift(x)[di,dj] @ w[di,dj]: 9 matmuls, no
             materialised im2col
  im2col   — materialise [T*H*W, 9*3C] then one matmul (9x input traffic;
             expected hbm-bound, included as a control)
  phase    — 4 per-phase 2x2-packed convs on a 2x2 space-to-depth input
             (each output phase has its own 2x2 packed support)
  int8     — the production int8 path (dynamic act scale + int8 lax.conv)

Usage (ONE TPU process at a time):
    python bench/conv_micro.py --shape 96 --variant conv [--iters 20]

Timing rules (CLAUDE.md): whole chain in one jit, evolving inputs, final
host fetch.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    # C, H, W, T  (streaming-latent shapes; taps make Cin = 3C)
    "96": (96, 480, 832, 4),
    "192": (192, 240, 416, 4),
    "384": (384, 120, 208, 2),
    # encoder shapes for the T=1 anti-drift re-encode (release_server.py:573-
    # 575 analog): fresh single-frame chunks skip the zero-padded temporal
    # taps (models/vae.py causal_conv3d), so Cin = C and the conv is plain 2D.
    # The re-encode measures ~175 ms vs a 14 ms roofline — per-conv overhead
    # at T=1 — so the winning formulation here feeds the per-Cout variant map.
    "enc96": (96, 480, 832, 1),
    "enc192": (192, 240, 416, 1),
    "enc384": (384, 120, 208, 1),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--shape", choices=list(SHAPES), default="96")
    p.add_argument("--variant", default="conv",
                   choices=["conv", "shifted", "wcol", "hcol", "im2col", "pallas", "int8pallas",
                            "phase", "int8", "int8shifted", "int8wcol",
                            "int8phase", "threeconv", "matmul", "conv1x1",
                            "copy", "bigmm"])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--salt", type=float, default=0.0,
                   help="perturb the chain-blend constant to force a FRESH "
                        "compile of an otherwise-cached arm — the only way "
                        "to rank arms inside a poisoned-compile window is "
                        "fresh-vs-fresh (docs/MEASUREMENTS.md)")
    p.add_argument("--check", action="store_true",
                   help="CPU equality check vs the conv formulation (small shape)")
    args = p.parse_args()

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.rtv_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    enc_t1 = args.shape.startswith("enc")
    C, H, W, T = SHAPES[args.shape]
    if args.check:
        C, H, W, T = 8, 12, 16, (1 if enc_t1 else 2)
    if enc_t1:
        # T=1 tap-skip path: single temporal tap, Cin = C, taps is identity
        ci = C

        def taps(x):
            return x
    else:
        ci = 3 * C  # temporal taps pre-concatenated, as in conv3d

        def taps(x):
            # causal pad 2 + 3 shifted views channel-concat (the conv3d
            # path); part of every variant's real cost
            xp = jnp.pad(x, ((2, 0), (0, 0), (0, 0), (0, 0)))
            return jnp.concatenate([xp[i : i + T] for i in range(3)], axis=-1)

    kw_ = jax.random.normal(jax.random.PRNGKey(0), (3, 3, ci, C), jnp.bfloat16) * 0.02
    b = jnp.zeros((C,), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (T, H, W, C), jnp.bfloat16)

    if args.variant == "conv":
        def conv(x):
            xin = jnp.pad(taps(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            return jax.lax.conv_general_dilated(
                xin, kw_, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    elif args.variant == "int8":
        wq_ = jnp.clip(jnp.round(kw_.astype(jnp.float32) / 2e-4), -127, 127
                       ).astype(jnp.int8)
        scale = jnp.full((C,), 2e-4, jnp.float32)

        def conv(x):
            xin = jnp.pad(taps(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            amax = jnp.maximum(jnp.max(jnp.abs(xin.astype(jnp.float32))), 1e-6)
            a_scale = amax / 127.0
            xq = jnp.clip(jnp.round(xin.astype(jnp.float32) / a_scale),
                          -127, 127).astype(jnp.int8)
            yq = jax.lax.conv_general_dilated(
                xq, wq_, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return (yq.astype(jnp.float32) * (a_scale * scale) + b).astype(x.dtype)
    elif args.variant == "int8shifted":
        # the int8 tier through the shifted-einsum formulation (what
        # RTV_VAE_CONV=shifted does to the production int8 path)
        wq_ = jnp.clip(jnp.round(kw_.astype(jnp.float32) / 2e-4), -127, 127
                       ).astype(jnp.int8)
        scale = jnp.full((C,), 2e-4, jnp.float32)

        def conv(x):
            xin = jnp.pad(taps(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            amax = jnp.maximum(jnp.max(jnp.abs(xin.astype(jnp.float32))), 1e-6)
            a_scale = amax / 127.0
            xq = jnp.clip(jnp.round(xin.astype(jnp.float32) / a_scale),
                          -127, 127).astype(jnp.int8)
            y = None
            for di in range(3):
                for dj in range(3):
                    yi = jnp.einsum(
                        "thwc,co->thwo", xq[:, di : di + H, dj : dj + W, :],
                        wq_[di, dj], preferred_element_type=jnp.int32)
                    y = yi if y is None else y + yi
            return (y.astype(jnp.float32) * (a_scale * scale) + b).astype(x.dtype)
    elif args.variant == "matmul":
        # CONTROL: same M/K/N as one tap-position of the conv, as 9 pure
        # einsums with distinct weights (CSE-proof) on the SAME unshifted
        # input — the MXU ceiling for these dims without conv semantics.
        def conv(x):
            xt = taps(x)
            y = None
            for di in range(3):
                for dj in range(3):
                    yi = jnp.einsum("thwc,co->thwo", xt, kw_[di, dj])
                    y = yi if y is None else y + yi
            return y + b
    elif args.variant == "copy":
        # CONTROL: pure elementwise pass over the activation tensor —
        # measures ACHIEVED HBM bandwidth (read+write x.size) in this chained
        # harness. Reported TFLOP/s is meaningless here; read the ms.
        def conv(x):
            return x * 1.000123 + 0.5

        @jax.jit
        def chain_copy(x, iters):
            def body(_, xc):
                return (xc * 1.000123 + 0.5).astype(xc.dtype)
            return jax.lax.fori_loop(0, iters, body, x)

        xw = chain_copy(x0, args.iters)
        jax.device_get(xw[0, 0, :2, 0])  # warmup (different arg than timed)
        t0 = time.perf_counter()
        out = chain_copy(xw, args.iters)
        jax.device_get(out[-1, -1, -1, :2])
        dt = time.perf_counter() - t0
        per = dt / args.iters * 1e3
        gbps = 2 * x0.size * 2 / (per * 1e-3) / 1e9
        print(f"{args.shape}ch copy: {per:.3f} ms/pass  ({gbps:.0f} GB/s achieved)")
        return
    elif args.variant == "bigmm":
        # CONTROL: 4k x 4k x 4k bf16 matmul chain — the harness must show
        # ~190 TFLOP/s (round-1 chip calibration) or the harness itself lies.
        a0 = jax.random.normal(jax.random.PRNGKey(7), (4096, 4096), jnp.bfloat16)
        w0 = jax.random.normal(jax.random.PRNGKey(8), (4096, 4096), jnp.bfloat16) * 0.01

        @jax.jit
        def chain_mm(a, iters):
            def body(_, ac):
                return (ac @ w0 * 0.001).astype(ac.dtype)
            return jax.lax.fori_loop(0, iters, body, a)

        aw = chain_mm(a0, args.iters)
        jax.device_get(aw[0, :2])  # warmup (different arg than timed)
        t0 = time.perf_counter()
        out = chain_mm(aw, args.iters)
        jax.device_get(out[-1, :2])
        dt = time.perf_counter() - t0
        per = dt / args.iters * 1e3
        tf = 2 * 4096**3 / (per * 1e-3) / 1e12
        print(f"bigmm 4k: {per:.3f} ms  ({tf:.0f} TFLOP/s)")
        return
    elif args.variant == "conv1x1":
        # CONTROL: 9 distinct 1x1 convs through the conv op — isolates the
        # conv engine's 3x3-windowing cost from its matmul path.
        def conv(x):
            xt = taps(x)
            y = None
            for di in range(3):
                for dj in range(3):
                    yi = jax.lax.conv_general_dilated(
                        xt, kw_[di : di + 1, dj : dj + 1], (1, 1), "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    y = yi if y is None else y + yi
            return y + b
    elif args.variant == "threeconv":
        if enc_t1:
            raise SystemExit("threeconv needs the 3-tap kernel; "
                             "enc* shapes are single-tap (T=1)")
        # no tap-concat materialisation: one 2D conv per temporal tap, summed.
        # Trades the 3C-wide concat's write+read (~1.8 GB at 96ch) for 3
        # narrower convs XLA may or may not chain efficiently.
        def conv(x):
            xp = jnp.pad(x, ((2, 0), (1, 1), (1, 1), (0, 0)))
            y = None
            for i in range(3):
                xi = xp[i : i + T]
                yi = jax.lax.conv_general_dilated(
                    xi, kw_[:, :, i * C : (i + 1) * C, :], (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = yi if y is None else y + yi
            return y + b
    elif args.variant == "shifted":
        def conv(x):
            xin = jnp.pad(taps(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = None
            for di in range(3):
                for dj in range(3):
                    v = xin[:, di : di + H, dj : dj + W, :]
                    yy = jnp.einsum("thwc,co->thwo", v, kw_[di, dj])
                    y = yy if y is None else y + yy
            return y + b
    elif args.variant == "wcol":
        # W-only im2col: channel-concat the 3 W-shifts (3x traffic), then 3
        # matmuls with K=3ci over H-shifts — the midpoint between "shifted"
        # (9 matmuls, K=ci, 1x traffic) and "im2col" (1 matmul, K=9ci, 9x)
        def conv(x):
            xin = jnp.pad(taps(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate(
                [xin[:, :, dj : dj + W, :] for dj in range(3)], axis=-1)
            y = None
            for di in range(3):
                yi = jnp.einsum("thwc,co->thwo", cols[:, di : di + H],
                                kw_[di].reshape(3 * ci, C))
                y = yi if y is None else y + yi
            return y + b
    elif args.variant == "hcol":
        # H-only im2col: concat the 3 H-shifts (contiguous row slices, so the
        # concat reads are unstrided), then 3 matmuls over W-shifts
        def conv(x):
            xin = jnp.pad(taps(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate(
                [xin[:, di : di + H, :, :] for di in range(3)], axis=-1)
            wh = kw_.transpose(1, 0, 2, 3)  # [dj, di, ci, C]
            y = None
            for dj in range(3):
                yi = jnp.einsum("thwc,co->thwo", cols[:, :, dj : dj + W],
                                wh[dj].reshape(3 * ci, C))
                y = yi if y is None else y + yi
            return y + b
    elif args.variant == "int8wcol":
        # the int8 tier through the wcol formulation (RTV_VAE_CONV=wcol on
        # the production int8 path): int8 concat is 1 byte/el
        wq_ = jnp.clip(jnp.round(kw_.astype(jnp.float32) / 2e-4), -127, 127
                       ).astype(jnp.int8)
        scale = jnp.full((C,), 2e-4, jnp.float32)

        def conv(x):
            xin = jnp.pad(taps(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            amax = jnp.maximum(jnp.max(jnp.abs(xin.astype(jnp.float32))), 1e-6)
            a_scale = amax / 127.0
            xq = jnp.clip(jnp.round(xin.astype(jnp.float32) / a_scale),
                          -127, 127).astype(jnp.int8)
            cols = jnp.concatenate(
                [xq[:, :, dj : dj + W, :] for dj in range(3)], axis=-1)
            y = None
            for di in range(3):
                yi = jnp.einsum("thwc,co->thwo", cols[:, di : di + H],
                                wq_[di].reshape(3 * ci, C),
                                preferred_element_type=jnp.int32)
                y = yi if y is None else y + yi
            return (y.astype(jnp.float32) * (a_scale * scale) + b).astype(x.dtype)
    elif args.variant == "pallas":
        # Element-window Pallas kernel (ops/pallas_conv2.py) — bf16 tier
        from realtime_video_tpu.ops import pallas_conv2

        def conv(x):
            xin = jnp.pad(taps(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = pallas_conv2.conv3x3(xin, kw_, interpret=args.check)
            assert y is not None, "no row tile fits this shape"
            return y + b
    elif args.variant == "int8pallas":
        # the int8 tier through the Element-window Pallas kernel: int32
        # accumulate in-kernel, dequant epilogue outside (as in production)
        from realtime_video_tpu.ops import pallas_conv2

        wq_ = jnp.clip(jnp.round(kw_.astype(jnp.float32) / 2e-4), -127, 127
                       ).astype(jnp.int8)
        scale = jnp.full((C,), 2e-4, jnp.float32)

        def conv(x):
            xin = jnp.pad(taps(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            amax = jnp.maximum(jnp.max(jnp.abs(xin.astype(jnp.float32))), 1e-6)
            a_scale = amax / 127.0
            xq = jnp.clip(jnp.round(xin.astype(jnp.float32) / a_scale),
                          -127, 127).astype(jnp.int8)
            yq = pallas_conv2.conv3x3(xq, wq_, preferred=jnp.int32,
                                      interpret=args.check)
            assert yq is not None, "no row tile fits this shape"
            return (yq.astype(jnp.float32) * (a_scale * scale) + b).astype(x.dtype)
    elif args.variant == "im2col":
        wm = kw_.reshape(9 * ci, C)

        def conv(x):
            xin = jnp.pad(taps(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate(
                [xin[:, di : di + H, dj : dj + W, :]
                 for di in range(3) for dj in range(3)], axis=-1)
            return jnp.einsum("thwc,co->thwo", cols, wm) + b
    elif args.variant == "phase":
        # the PRODUCTION phase formulation (models/vae.py _phase_conv):
        # per-phase 2x2 packed convs on a 2x2 space-to-depth input
        from realtime_video_tpu.models.vae import _phase_conv

        def conv(x):
            return _phase_conv(taps(x), kw_) + b
    else:  # int8phase
        # the int8 tier through the production phase formulation
        # (RTV_VAE_CONV=phase on the production int8 path)
        from realtime_video_tpu.models.vae import _phase_conv

        wq_ = jnp.clip(jnp.round(kw_.astype(jnp.float32) / 2e-4), -127, 127
                       ).astype(jnp.int8)
        scale = jnp.full((C,), 2e-4, jnp.float32)

        def conv(x):
            xin = taps(x)
            amax = jnp.maximum(jnp.max(jnp.abs(xin.astype(jnp.float32))), 1e-6)
            a_scale = amax / 127.0
            xq = jnp.clip(jnp.round(xin.astype(jnp.float32) / a_scale),
                          -127, 127).astype(jnp.int8)
            yq = _phase_conv(xq, wq_, preferred=jnp.int32)
            return (yq.astype(jnp.float32) * (a_scale * scale) + b).astype(x.dtype)
    label = args.variant

    if args.check:
        import numpy as np

        if args.variant in ("matmul", "conv1x1"):
            # perf CONTROLS, not equivalent math — just check they run
            jnp.asarray(conv(x0)).block_until_ready()
            print(f"{label}: control runs (no equality expected)")
            return

        def ref(x):
            xin = jnp.pad(taps(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            return jax.lax.conv_general_dilated(
                xin, kw_, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

        got, want = np.asarray(conv(x0), np.float32), np.asarray(ref(x0), np.float32)
        # int8 carries dynamic-quantisation noise by design
        atol = 0.5 if args.variant.startswith("int8") else 2e-2
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=atol)
        print(f"{label}: check ok (max err {np.abs(got - want).max():.4f})")
        return

    # salt != 0 changes the trace hash -> fresh compile. The chain runs in
    # bf16, where the blend literal is canonicalized at trace time: a salt
    # below one bf16 ulp (2^-9 at ~1.0) leaves the HLO BIT-IDENTICAL and the
    # persistent cache hits anyway. Quantize any nonzero salt up to >=0.004
    # so the constant (and hence the trace) genuinely differs.
    salt = args.salt
    if salt != 0.0:
        import math
        salt = math.copysign(max(1, round(abs(salt) / 0.004)) * 0.004, salt)
    blend = 0.999 - salt  # subtract: keep the chain contraction <= 1

    @jax.jit
    def chain(x, iters):
        def body(_, xc):
            y = conv(xc)
            return (xc * blend + y.astype(xc.dtype) * 0.001).astype(xc.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    # warmup with the SAME iters (one compile); the timed call takes the
    # warmup's OUTPUT as input — same shapes, different values, so the
    # tunnel's (executable, args) dispatch dedupe cannot collapse it
    xw = chain(x0, args.iters)
    jax.device_get(xw[0, 0, :2, 0])
    t0 = time.perf_counter()
    out = chain(xw, args.iters)
    jax.device_get(out[-1, -1, -1, :2])
    dt = time.perf_counter() - t0
    per = dt / args.iters * 1e3
    flops = 2 * 9 * ci * C * T * H * W  # useful
    print(f"{args.shape}ch {label}: {per:.3f} ms/conv  "
          f"({flops / (per * 1e-3) / 1e12:.1f} TFLOP/s useful, iters {args.iters})")


if __name__ == "__main__":
    main()
