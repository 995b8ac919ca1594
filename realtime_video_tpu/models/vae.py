"""Wan 2.1 causal 3D VAE — functional JAX implementation with explicit
streaming conv caches.

Mirrors the reference architecture and cache semantics exactly:
  * CausalConv3d left-pads time by 2*pad_t, splicing in up to CACHE_T=2 cached
    input frames (wan/modules/vae.py:17-36);
  * Resample up/down 3d time-convs skip entirely on the first-ever chunk
    (vae.py:104-149) — `first=True` is a static switch here (two jit variants
    replace the reference's `feat_cache[idx] is None` checks);
  * encode chunks time as 1,4,4,... (vae.py:491-517); decode runs frame by
    frame (vae.py:519-567); the streaming wrappers keep the cache alive across
    calls (demo_utils/vae_block3.py:116-230).

TPU-first details: NTHWC layout (XLA conv wants channels-last), caches are a
flat tuple of arrays threaded through jit (the reference's *args-cache design,
vae_block3.py:195-230, was already shaped for this), norms in f32.
"""
from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.config import (
    VAEConfig,
    VAE_LATENT_MEAN,
    VAE_LATENT_STD,
)

Params = Dict[str, Any]
Cache = Tuple[jnp.ndarray, ...]

CACHE_T = 2


# ---------------------------------------------------------------------------
# cache cursor: traversal order is static, so a host-side cursor threads the
# flat cache tuple through the (traced) module graph
# ---------------------------------------------------------------------------


class _CacheIO:
    def __init__(self, entries: Optional[Sequence[jnp.ndarray]]):
        self.entries = list(entries) if entries is not None else None
        self.out: List[jnp.ndarray] = []
        self.i = 0

    def get(self) -> Optional[jnp.ndarray]:
        if self.entries is None:
            self.i += 1
            return None
        v = self.entries[self.i]
        self.i += 1
        return v

    def put(self, v: jnp.ndarray) -> None:
        self.out.append(v)


# ---------------------------------------------------------------------------
# primitives (NTHWC)
# ---------------------------------------------------------------------------


#: when set (a dict), float conv calls record max|input| keyed by id(param
#: dict) — used by calibrate_vae_act_scales to derive static int8 act scales
_ACT_CALIB: Optional[dict] = None


def _record_calib(p: Params, x: jnp.ndarray) -> None:
    if _ACT_CALIB is not None and not isinstance(x, jax.core.Tracer):
        # eager-only hook; the Tracer guard keeps concurrent jitted decodes
        # from crashing on float() during a calibration pass
        amax = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
        _ACT_CALIB[id(p)] = max(_ACT_CALIB.get(id(p), 0.0), amax)


#: spatial-conv formulation for the 3x3 stride-1 convs (bench/conv_micro.py
#: sweep): "conv" = lax.conv (the conv engine; pays a relayout copy per conv
#: when elementwise ops sit between convs — measured ~28% of decode),
#: "shifted" = 9 shift+einsum matmuls that never enter the conv engine's
#: [H, T, 8, W/8, C] layout, or "wcol" = W-only im2col (channel-concat the 3
#: W-shifts, then 3 K=3Ci matmuls over H-shifts — 3x the shifted K for 3x
#: input traffic, the midpoint between "shifted" and a full 9x im2col).
#: Equality-tested; default decided by on-chip A/B. Accepts either one
#: variant name for all convs, or a per-output-width map so a mixed sweep
#: result is adoptable: "96:wcol,192:conv,default:conv" keys on Cout.
_CONV_VARIANT = os.getenv("RTV_VAE_CONV", "conv")

#: skip the zero-padded temporal taps for fresh T=1 chunks (the anti-drift
#: re-encode + first decode): 1/kt the conv FLOPs, exact math. Gated because
#: it CHANGES those traced programs — while the remote compile service emits
#: poisoned executables (CLAUDE.md sickness mode), the old cached programs
#: are faster than freshly compiled "optimised" ones (measured 8.2 -> 4.1 fps
#: when the re-encode recompiled sick); flip off to reuse the old cache.
_T1_TAPSKIP = os.getenv("RTV_VAE_T1_TAPSKIP", "1") in ("1", "true")
#: quantise int8 activations BEFORE the temporal tap-concat (bit-exact, s8
#: concat traffic). Changes the decoder HLO, so bench's poisoning probe
#: flips it off to reuse the pre-change cached programs when fresh compiles
#: are degraded.
_QCAT = os.getenv("RTV_VAE_QCAT", "1") in ("1", "true")
# see wan_dit._Q_RCP: reciprocal-multiply quantise, opt-in pending fused A/B
_Q_RCP = os.getenv("RTV_Q_RCP", "0") in ("1", "true")


_KNOWN_VARIANTS = {"conv", "shifted", "wcol", "im2col", "threeconv", "phase",
                   "pallas"}
_WARNED_VARIANTS: set = set()


def _variant_for(co: int, ci: Optional[int] = None) -> str:
    """Formulation for a conv with output channels co (and, when known,
    effective input channels ci — post tap-merge). Map keys, most specific
    first: "CIxCO" (e.g. "96x96", distinguishes the T=1 tap-skip re-encode
    convs from the 3C-tapped decoder convs at the same Cout), then "CO",
    then "default"."""
    if ":" not in _CONV_VARIANT:
        variant = _CONV_VARIANT
    else:
        m = dict(kv.split(":", 1) for kv in _CONV_VARIANT.split(","))
        if ci is not None and f"{ci}x{co}" in m:
            variant = m[f"{ci}x{co}"]
        else:
            variant = m.get(str(co), m.get("default", "conv"))
    if variant not in _KNOWN_VARIANTS and variant not in _WARNED_VARIANTS:
        # a typo'd/unported name silently runs "conv" downstream — say so
        _WARNED_VARIANTS.add(variant)
        import warnings

        warnings.warn(
            f"RTV_VAE_CONV names unknown formulation {variant!r} "
            f"(known: {sorted(_KNOWN_VARIANTS)}); the conv engine runs instead",
            stacklevel=2,
        )
    return variant


def _phase_conv(x, w, preferred=None):
    """2x2 space-to-depth phase decomposition of a SAME-padded 3x3 conv.

    Pack x [T,H,W,Ci] -> [T,H/2,W/2,4Ci] (phase-major channels); each output
    phase (py,px) is one VALID 2x2 conv over a shifted slice of the 1-padded
    packed tensor, with a [2,2,4Ci,Co] kernel embedding the true 3x3 taps
    (structural zeros elsewhere). 4x wider channels at 4/9 the taps — a
    different point in the conv engine's layout space than the plain 3x3
    (sweep arm 'phase', bench/conv_micro.py). Exact for even H, W; int8-safe
    (zeros quantise exactly, the conv is linear)."""
    t, h, wd, ci = x.shape
    co = w.shape[3]
    kwargs = {} if preferred is None else {"preferred_element_type": preferred}
    xr = x.reshape(t, h // 2, 2, wd // 2, 2, ci).transpose(0, 1, 3, 2, 4, 5)
    xp = xr.reshape(t, h // 2, wd // 2, 4 * ci)
    xp = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
    outs = []
    for py in (0, 1):
        for px in (0, 1):
            k4 = jnp.zeros((2, 2, 4 * ci, co), w.dtype)
            for ky in range(3):
                for kx in range(3):
                    ry, rx = py + ky - 1, px + kx - 1  # real input offset
                    # offset ry lives in packed row floor(ry/2), phase ry%2;
                    # the 2x2 window for output phase (py,px) starts at packed
                    # offset py-1, so the kernel row is floor(ry/2)-(py-1)
                    pr, fr = (ry + 2) // 2 - 1, (ry + 2) % 2
                    pc, fc = (rx + 2) // 2 - 1, (rx + 2) % 2
                    kr, kc = pr + 1 - py, pc + 1 - px
                    blk = (fr * 2 + fc) * ci
                    k4 = k4.at[kr, kc, blk : blk + ci, :].set(w[ky, kx])
            br, bc = (py + 1) // 2, (px + 1) // 2
            v = xp[:, br : br + h // 2 + 1, bc : bc + wd // 2 + 1, :]
            outs.append(jax.lax.conv_general_dilated(
                v, k4, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"), **kwargs))
    y = jnp.stack(outs, axis=3)  # [T, H/2, W/2, 4, Co], phase-major
    y = y.reshape(t, h // 2, wd // 2, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(t, h, wd, co)


def _spatial_conv(x, w, stride=(1, 1), padding="VALID", preferred=None):
    """One 2D conv, formulation-switchable. x [N,H,W,Ci], w [kh,kw,Ci,Co]."""
    kh, kw = w.shape[:2]
    variant = _variant_for(w.shape[3], w.shape[2])
    if variant == "phase" and kh == 3 and kw == 3 and stride == (1, 1) \
            and padding != "VALID" \
            and tuple(map(tuple, padding)) == ((1, 1), (1, 1)) \
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        return _phase_conv(x, w, preferred)
    if variant == "pallas" and kh == 3 and kw == 3 and stride == (1, 1) \
            and os.getenv("RTV_DISABLE_PALLAS", "0") not in ("1", "true") \
            and jax.default_backend() == "tpu":
        # Element-window Pallas kernel (ops/pallas_conv2.py): overlapping
        # halo windows from one input, no im2col scratch — the in-env swing
        # at the conv engine's 25-47% MXU (VERDICT r4 #4). Falls back to the
        # conv engine when no row tile fits (picker returns None).
        from realtime_video_tpu.ops import pallas_conv2

        xp = x
        if padding != "VALID":
            (ph0, ph1), (pw0, pw1) = padding
            if ph0 or ph1 or pw0 or pw1:
                xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
        y = pallas_conv2.conv3x3(xp, w, preferred=preferred)
        if y is not None:
            return y
        variant = "conv"
    if variant in ("shifted", "wcol", "im2col") and kh == 3 and kw == 3 \
            and stride == (1, 1):
        if padding != "VALID":
            (ph0, ph1), (pw0, pw1) = padding
            if ph0 or ph1 or pw0 or pw1:
                x = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
        ho, wo = x.shape[1] - 2, x.shape[2] - 2
        kwargs = {} if preferred is None else {
            "preferred_element_type": preferred}
        if variant == "wcol":
            ci, co = w.shape[2], w.shape[3]
            # [N, H+2, Wo, 3Ci], dj-major channels — matches w[di] reshaped
            cols = jnp.concatenate(
                [x[:, :, dj : dj + wo, :] for dj in range(3)], axis=-1
            )
            y = None
            for di in range(3):
                yi = jnp.einsum(
                    "thwc,co->thwo", cols[:, di : di + ho],
                    w[di].reshape(3 * ci, co), **kwargs,
                )
                y = yi if y is None else y + yi
            return y
        if variant == "im2col":
            ci, co = w.shape[2], w.shape[3]
            # full im2col: one matmul with K=9Ci at 9x input traffic (the
            # sweep's hbm-bound control; adoptable in case the conv-engine
            # relayout tax outweighs the traffic at some shape)
            cols = jnp.concatenate(
                [x[:, di : di + ho, dj : dj + wo, :]
                 for di in range(3) for dj in range(3)], axis=-1
            )
            return jnp.einsum(
                "thwc,co->thwo", cols, w.reshape(9 * ci, co), **kwargs
            )
        y = None
        for di in range(3):
            for dj in range(3):
                yi = jnp.einsum(
                    "thwc,co->thwo", x[:, di : di + ho, dj : dj + wo, :],
                    w[di, dj], **kwargs,
                )
                y = yi if y is None else y + yi
        return y
    kwargs = {} if preferred is None else {"preferred_element_type": preferred}
    return jax.lax.conv_general_dilated(
        x, w, stride, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kwargs,
    )


def conv3d(p: Params, x: jnp.ndarray, stride=(1, 1, 1), padding="VALID") -> jnp.ndarray:
    """3D conv decomposed into kt 2D convs summed over temporal taps.

    XLA lowers true Conv3D poorly on TPU (measured ~50x slower); the
    decomposition y[t] = sum_i conv2d(x[st*t + i], w[i]) is exact and keeps
    everything on the fast NHWC conv path.
    """
    # padding: "VALID" or explicit spatial (lo, hi) pairs ((ph_lo, ph_hi),
    # (pw_lo, pw_hi)) — forwarded to the conv op itself. A separate jnp.pad
    # materialises the whole tensor (measured ~4% of decode in pad ops plus
    # the extra copies it forces); conv-native padding is free.
    if "w_q" in p:  # int8 tier: w_q [kt,kh,kw,C,co] int8
        kt, kh, kw = p["w_q"].shape[:3]
        st = stride[0]
        assert st == 1 or kt == 1
        t_out = x.shape[0] - kt + 1
        xq = None
        if kt > 1 and not _QCAT:
            taps = [x[i : i + t_out] for i in range(kt)]
            x = jnp.concatenate(taps, axis=-1)
        elif kt > 1:
            # quantise BEFORE the tap-concat: per-tensor quantisation is
            # pointwise and every input frame appears in at least one tap, so
            # amax(taps(x)) == amax(x) and quantise∘concat == concat∘quantise
            # bit-for-bit. The concat then moves s8 (1 B/el, not bf16's 2),
            # and with a calibrated static a_scale the quantise fuses into
            # the producing norm/silu chain instead of re-reading the 3C-wide
            # concat (traces: ~2.2 ms standalone quantise per 96-ch conv).
            xq, a_scale = _quantize_act(p, x)
            taps = [xq[i : i + t_out] for i in range(kt)]
            xq = jnp.concatenate(taps, axis=-1)
        wq = p["w_q"].transpose(1, 2, 0, 3, 4).reshape(kh, kw, -1, p["w_q"].shape[-1])
        if xq is not None:
            return _int8_conv2d(dict(p, w_q=wq), x, stride[1:], padding,
                                xq=xq, a_scale=a_scale)
        return _int8_conv2d(dict(p, w_q=wq), x, stride[1:], padding)
    _record_calib(p, x)
    w = p["w"].astype(x.dtype)  # [kt, kh, kw, ci, co]
    kt, kh, kw = w.shape[:3]
    st, sh, sw = stride
    T, H, W, C = x.shape  # THWC: time is the conv batch axis, so TPU tiling
    t_out = (T - kt) // st + 1  # lands on (W, C) with no sublane-time padding
    if kt == 1:
        y = _spatial_conv(x[::st], w[0], (sh, sw), padding)
    elif st == 1:
        if _variant_for(w.shape[-1], kt * w.shape[3]) == "threeconv":
            # no tap-concat materialisation: one 2D conv per temporal tap,
            # summed (trades the kt*C-wide concat's write+read for kt
            # narrower convs — sweep arm, bench/conv_micro.py)
            y = None
            for i in range(kt):
                yi = _spatial_conv(x[i : i + t_out], w[i], (sh, sw), padding)
                y = yi if y is None else y + yi
        else:
            # channel-concat the kt shifted temporal views and run ONE wide conv:
            # y[t] = sum_i conv2d(x[t+i], w[i]) == conv2d(cat_c(x[t..t+kt]), cat_ci(w)).
            # 3x wider input channels -> much better MXU utilisation than three
            # narrow convs (or XLA's slow native Conv3D).
            taps = [x[i : i + t_out] for i in range(kt)]
            xin = jnp.concatenate(taps, axis=-1)
            w2 = w.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kt * C, w.shape[-1])
            y = _spatial_conv(xin, w2, (sh, sw), padding)
    else:  # strided temporal conv (encoder downsample3d) — per-tap sum
        y = None
        for i in range(kt):
            xi = x[i : i + st * (t_out - 1) + 1 : st]
            yi = _spatial_conv(xi, w[i], (sh, sw), padding)
            y = yi if y is None else y + yi
    return y + p["b"].astype(x.dtype)


def _quantize_act(p: Params, x: jnp.ndarray):
    """Per-tensor int8 activation quantisation: calibrated static scale when
    p carries "a_scale" (the TRT calibration analog), dynamic amax otherwise.
    Returns (xq int8, a_scale f32)."""
    if "a_scale" in p:
        a_scale = p["a_scale"].astype(jnp.float32)
    else:
        amax = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-6)
        a_scale = amax / 127.0
    # scalar-reciprocal multiply vs per-element divide (VPU-bound pass; see
    # wan_dit._Q_RCP) — opt-in until the fused A/B ratifies it
    xf = x.astype(jnp.float32)
    scaled = xf * (1.0 / a_scale) if _Q_RCP else xf / a_scale
    xq = jnp.clip(jnp.round(scaled), -127, 127).astype(jnp.int8)
    return xq, a_scale


def _int8_conv2d(p: Params, x: jnp.ndarray, stride=(1, 1), padding="VALID",
                 xq=None, a_scale=None) -> jnp.ndarray:
    """int8 conv (the TPU analog of the reference's TensorRT int8 VAE engine,
    demo_utils/vae_torch2trt.py): per-tensor activation scale,
    per-output-channel weight scales, int32 accumulation.
    p["w_q"] here is the 4D [kh,kw,ci,co] (taps already merged by conv3d).

    Activation scale: CALIBRATED static when p carries "a_scale" (the TRT
    calibration analog — the quantise then fuses into the producing op with
    no extra amax read of the input), dynamic per-tensor otherwise. Callers
    that already quantised (conv3d pre-tap-concat) pass xq/a_scale."""
    if xq is None:
        xq, a_scale = _quantize_act(p, x)
    yq = _spatial_conv(xq, p["w_q"], stride, padding, preferred=jnp.int32)
    y = yq.astype(jnp.float32) * (a_scale * p["scale"].astype(jnp.float32))
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def conv2d(p: Params, x: jnp.ndarray, stride=(1, 1), padding="VALID") -> jnp.ndarray:
    """x [B*T, H, W, C]."""
    if "w_q" in p:
        wq = p["w_q"]
        if wq.ndim == 5:  # [1,kh,kw,ci,co]
            wq = wq[0]
        return _int8_conv2d(dict(p, w_q=wq), x, stride, padding)
    _record_calib(p, x)
    y = _spatial_conv(x, p["w"].astype(x.dtype), stride, padding)
    return y + p["b"].astype(x.dtype)


def causal_conv3d(
    p: Params,
    x: jnp.ndarray,
    cache: Optional[jnp.ndarray],
    io: _CacheIO,
    stride=(1, 1, 1),
) -> jnp.ndarray:
    """CausalConv3d with cache splice (vae.py:17-36) + cache update
    (vae.py:191-209: new cache = last CACHE_T input frames, carrying over the
    previous cache frame when the chunk is shorter)."""
    if "w_q" in p:
        kt, kh, kw = p["w_q"].shape[:3]  # int8 weights stay 5D (kt static)
    else:
        kt, kh, kw = p["w"].shape[:3]
    pad_t, pad_h, pad_w = 2 * (kt // 2), kh // 2, kw // 2
    if pad_t > 0:
        if cache is None and x.shape[0] == 1 and _T1_TAPSKIP:
            # fresh single-frame chunk — THE anti-drift re-encode
            # (release_server.py:573-575) and the first decode chunk. The
            # zero-padded temporal taps contribute exactly nothing, so run
            # only the last tap's 2D conv: 1/kt the FLOPs and no tap-concat
            # materialisation (T=1 is per-conv-overhead-bound).
            _record_calib(p, x)  # record under the ORIGINAL param dict
            new_cache = jnp.concatenate(
                [jnp.zeros_like(x), x], axis=0
            )[-CACHE_T:]
            io.put(new_cache)
            key = "w_q" if "w_q" in p else "w"
            p_last = dict(p, **{key: p[key][kt - 1:]})
            spad = ((pad_h, pad_h), (pad_w, pad_w)) if (pad_h or pad_w) else "VALID"
            return conv3d(p_last, x, stride=stride, padding=spad)
        if cache is None:
            xin = jnp.pad(x, ((pad_t, 0), (0, 0), (0, 0), (0, 0)))
            new_cache = x[-CACHE_T:]
            if new_cache.shape[0] < CACHE_T:  # first chunk had 1 frame
                new_cache = jnp.concatenate(
                    [jnp.zeros_like(new_cache), new_cache], axis=0
                )[-CACHE_T:]
        else:
            xin = jnp.concatenate([cache.astype(x.dtype), x], axis=0)
            if xin.shape[0] < x.shape[0] + pad_t:
                xin = jnp.pad(
                    xin, ((x.shape[0] + pad_t - xin.shape[0], 0), (0, 0), (0, 0), (0, 0))
                )
            new_cache = jnp.concatenate([cache.astype(x.dtype), x], axis=0)[-CACHE_T:]
        io.put(new_cache)
    else:
        xin = x
    spad = ((pad_h, pad_h), (pad_w, pad_w)) if (pad_h or pad_w) else "VALID"
    return conv3d(p, xin, stride=stride, padding=spad)


def rms_norm_image(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """RMS_norm channel-first images=False (vae.py:39-54): L2-normalise over C,
    scale by sqrt(C)*gamma (+ bias). Here C is the last axis.

    Stats in f32, but scaling stays in the input dtype so the big tensor is
    never materialised in f32 (single fused read/write pass)."""
    d = x.shape[-1]
    sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    # sqrt(d)/||x|| = rsqrt(d * mean(x^2)) * sqrt(d) = rsqrt(mean(x^2))
    inv = jax.lax.rsqrt(sq + 1e-12).astype(x.dtype)
    y = x * inv * p["gamma"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def residual_block(p: Params, x: jnp.ndarray, io: _CacheIO) -> jnp.ndarray:
    """ResidualBlock (vae.py:175-209): RMS-SiLU-conv ×2 + shortcut."""
    h = x
    if "shortcut" in p:
        h = conv3d(p["shortcut"], x)  # 1x1x1, no temporal pad
    y = rms_norm_image(p["norm1"], x)
    y = jax.nn.silu(y)
    y = causal_conv3d(p["conv1"], y, io.get(), io)
    y = rms_norm_image(p["norm2"], y)
    y = jax.nn.silu(y)
    y = causal_conv3d(p["conv2"], y, io.get(), io)
    return y + h


def attention_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head per-frame spatial attention (vae.py:212-251)."""
    t, hh, ww, c = x.shape
    ident = x
    y = rms_norm_image(p["norm"], x)
    y = y.reshape(t, hh * ww, c)
    qkv = jnp.einsum("blc,cd->bld", y, p["to_qkv"]["w"].astype(y.dtype)) + p["to_qkv"][
        "b"
    ].astype(y.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = c**-0.5
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v)
    o = jnp.einsum("blc,cd->bld", o, p["proj"]["w"].astype(o.dtype)) + p["proj"][
        "b"
    ].astype(o.dtype)
    return ident + o.reshape(t, hh, ww, c)


def resample(
    p: Params, mode: str, x: jnp.ndarray, io: _CacheIO, first: bool
) -> jnp.ndarray:
    """Resample up/down 2d/3d with time-conv caches (vae.py:66-149)."""
    t, hh, ww, c = x.shape
    if mode == "upsample3d":
        if first:
            # reference: allocate zero cache, skip time conv (vae.py:109-111)
            io.put(jnp.zeros((CACHE_T, hh, ww, c), x.dtype))
        else:
            cache = io.get()
            xin = jnp.concatenate([cache.astype(x.dtype), x], axis=0)
            y = conv3d(p["time_conv"], xin)  # k=(3,1,1) valid -> t frames, 2c ch
            # cache update (vae.py:114-120)
            if t >= CACHE_T:
                new_cache = x[-CACHE_T:]
            else:
                last = x[-1:]
                padding = jnp.where(cache[-1:] == 0, 0.0, last.astype(cache.dtype))
                new_cache = jnp.concatenate([padding.astype(x.dtype), last], axis=0)
            io.put(new_cache)
            # interleave the two halves over time (vae.py:123-125)
            y = y.reshape(t, hh, ww, 2, c)
            y = y.transpose(0, 3, 1, 2, 4).reshape(t * 2, hh, ww, c)
            x = y
            t = x.shape[0]

    if mode in ("upsample2d", "upsample3d"):
        w_like = p["conv"].get("w", p["conv"].get("w_q"))
        if w_like.shape[-1] == 2 * x.shape[-1]:
            # fused upsample+conv (fuse_decoder_upsample): co == 4*(c//2) ==
            # 2c marks the phase-folded kernel — one conv at the ORIGINAL
            # resolution producing all four output phases, then
            # depth-to-space. No 4x nearest-upsample materialisation, 4x
            # wider MXU output tiles.
            y = conv2d(p["conv"], x, (1, 1), padding=((1, 1), (1, 1)))
            tt, hh2, ww2, c4 = y.shape
            co = c4 // 4
            x = y.reshape(tt, hh2, ww2, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(tt, hh2 * 2, ww2 * 2, co)
        else:
            # nearest 2x then 3x3 conv dim -> dim//2
            up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = conv2d(p["conv"], up, (1, 1), padding=((1, 1), (1, 1)))
    elif mode in ("downsample2d", "downsample3d"):
        # ZeroPad2d (0,1,0,1) + 3x3 stride-2 conv (vae.py:90-98)
        x = conv2d(p["conv"], x, (2, 2), padding=((0, 1), (0, 1)))

    if mode == "downsample3d":
        if first:
            io.put(x)  # full chunk stored (vae.py:135-137)
        else:
            cache = io.get()
            pre = x
            xin = jnp.concatenate([cache[-1:].astype(x.dtype), x], axis=0)
            x = conv3d(p["time_conv"], xin, stride=(2, 1, 1))
            io.put(pre[-1:])
    return x


# ---------------------------------------------------------------------------
# encoder / decoder graphs
# ---------------------------------------------------------------------------


def _encoder_plan(cfg: VAEConfig):
    """(list of ('res', in, out) | ('resample', mode, dim)) per stage."""
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    plan = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        cur = din
        for _ in range(cfg.num_res_blocks):
            plan.append(("res", cur, dout))
            cur = dout
        if i != len(cfg.dim_mult) - 1:
            mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
            plan.append(("resample", mode, dout))
    return dims, plan


def _decoder_plan(cfg: VAEConfig):
    dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    plan = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        cur = din // 2 if i in (1, 2, 3) else din  # vae.py:380-383
        for _ in range(cfg.num_res_blocks + 1):
            plan.append(("res", cur, dout))
            cur = dout
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if cfg.temperal_upsample[i] else "upsample2d"
            plan.append(("resample", mode, dout))
    return dims, plan


def encoder_apply(
    cfg: VAEConfig, params: Params, x: jnp.ndarray, cache: Optional[Cache], first: bool
) -> Tuple[jnp.ndarray, Cache]:
    """Encoder3d (vae.py:254-345). x [B,T,H,W,3] -> [B,T/4ish,H/8,W/8,2*z]."""
    io = _CacheIO(cache)
    x = causal_conv3d(params["conv1"], x, io.get(), io)
    _, plan = _encoder_plan(cfg)
    for spec, p in zip(plan, params["downsamples"]):
        if spec[0] == "res":
            x = residual_block(p, x, io)
        else:
            x = resample(p, spec[1], x, io, first)
    x = residual_block(params["middle_res1"], x, io)
    x = attention_block(params["middle_attn"], x)
    x = residual_block(params["middle_res2"], x, io)
    x = rms_norm_image(params["head_norm"], x)
    x = jax.nn.silu(x)
    x = causal_conv3d(params["head_conv"], x, io.get(), io)
    return x, tuple(io.out)


def decoder_apply(
    cfg: VAEConfig, params: Params, x: jnp.ndarray, cache: Optional[Cache], first: bool
) -> Tuple[jnp.ndarray, Cache]:
    """Decoder3d (vae.py:348-446). x [B,T,h,w,z] -> [B,~4T,8h,8w,3]."""
    io = _CacheIO(cache)
    x = causal_conv3d(params["conv1"], x, io.get(), io)
    x = residual_block(params["middle_res1"], x, io)
    x = attention_block(params["middle_attn"], x)
    x = residual_block(params["middle_res2"], x, io)
    _, plan = _decoder_plan(cfg)
    for spec, p in zip(plan, params["upsamples"]):
        if spec[0] == "res":
            x = residual_block(p, x, io)
        else:
            x = resample(p, spec[1], x, io, first)
    x = rms_norm_image(params["head_norm"], x)
    x = jax.nn.silu(x)
    x = causal_conv3d(params["head_conv"], x, io.get(), io)
    return x, tuple(io.out)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_conv3d(key, kt, kh, kw, cin, cout, dtype) -> Params:
    fan_in = kt * kh * kw * cin
    lim = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (kt, kh, kw, cin, cout), jnp.float32, -lim, lim).astype(dtype),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -lim, lim).astype(dtype),
    }


def _init_conv2d(key, kh, kw, cin, cout, dtype) -> Params:
    fan_in = kh * kw * cin
    lim = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32, -lim, lim).astype(dtype),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -lim, lim).astype(dtype),
    }


def _init_res(key, cin, cout, dtype) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": {"gamma": jnp.ones((cin,), dtype)},
        "conv1": _init_conv3d(ks[0], 3, 3, 3, cin, cout, dtype),
        "norm2": {"gamma": jnp.ones((cout,), dtype)},
        "conv2": _init_conv3d(ks[1], 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["shortcut"] = _init_conv3d(ks[2], 1, 1, 1, cin, cout, dtype)
    return p


def _init_attn(key, dim, dtype) -> Params:
    ks = jax.random.split(key, 2)
    return {
        "norm": {"gamma": jnp.ones((dim,), dtype)},
        "to_qkv": {
            "w": (jax.random.normal(ks[0], (dim, dim * 3), jnp.float32) * dim**-0.5).astype(dtype),
            "b": jnp.zeros((dim * 3,), dtype),
        },
        "proj": {"w": jnp.zeros((dim, dim), dtype), "b": jnp.zeros((dim,), dtype)},
    }


def _init_resample(key, mode, dim, dtype) -> Params:
    ks = jax.random.split(key, 2)
    p = {}
    if mode in ("upsample2d", "upsample3d"):
        p["conv"] = _init_conv2d(ks[0], 3, 3, dim, dim // 2, dtype)
        if mode == "upsample3d":
            p["time_conv"] = _init_conv3d(ks[1], 3, 1, 1, dim, dim * 2, dtype)
    elif mode in ("downsample2d", "downsample3d"):
        p["conv"] = _init_conv2d(ks[0], 3, 3, dim, dim, dtype)
        if mode == "downsample3d":
            p["time_conv"] = _init_conv3d(ks[1], 3, 1, 1, dim, dim, dtype)
    return p


def init_vae_params(key, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 256))
    enc_dims, enc_plan = _encoder_plan(cfg)
    dec_dims, dec_plan = _decoder_plan(cfg)
    z = cfg.z_dim

    def stage_params(plan):
        out = []
        for spec in plan:
            if spec[0] == "res":
                out.append(_init_res(next(keys), spec[1], spec[2], dtype))
            else:
                out.append(_init_resample(next(keys), spec[1], spec[2], dtype))
        return out

    enc_out = enc_dims[-1]
    dec_out = dec_dims[-1]
    encoder = {
        "conv1": _init_conv3d(next(keys), 3, 3, 3, 3, enc_dims[0], dtype),
        "downsamples": stage_params(enc_plan),
        "middle_res1": _init_res(next(keys), enc_out, enc_out, dtype),
        "middle_attn": _init_attn(next(keys), enc_out, dtype),
        "middle_res2": _init_res(next(keys), enc_out, enc_out, dtype),
        "head_norm": {"gamma": jnp.ones((enc_out,), dtype)},
        "head_conv": _init_conv3d(next(keys), 3, 3, 3, enc_out, z * 2, dtype),
    }
    decoder = {
        "conv1": _init_conv3d(next(keys), 3, 3, 3, z, dec_dims[0], dtype),
        "middle_res1": _init_res(next(keys), dec_dims[0], dec_dims[0], dtype),
        "middle_attn": _init_attn(next(keys), dec_dims[0], dtype),
        "middle_res2": _init_res(next(keys), dec_dims[0], dec_dims[0], dtype),
        "upsamples": stage_params(dec_plan),
        "head_norm": {"gamma": jnp.ones((dec_out,), dtype)},
        "head_conv": _init_conv3d(next(keys), 3, 3, 3, dec_out, 3, dtype),
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        "conv1": _init_conv3d(next(keys), 1, 1, 1, z * 2, z * 2, dtype),  # vae.py:479
        "conv2": _init_conv3d(next(keys), 1, 1, 1, z, z, dtype),  # vae.py:480
    }


def fuse_decoder_upsample(params: Params) -> Params:
    """Fold nearest-2x upsample + pad + 3x3 conv (Resample upsample branch,
    vae.py:66-149) into ONE conv at the original resolution producing the
    four (dy, dx) phase outputs, de-interleaved by depth-to-space in
    resample().

    Exact rewrite: each output phase reads a 2x2 original-pixel support; the
    phase kernels fold w rows/cols with T0 = [[1,0,0],[0,1,1],[0,0,0]] (even
    outputs) / T1 = [[0,0,0],[1,1,0],[0,0,1]] (odd outputs), zero-padded back
    to 3x3. Removes the 4x upsampled-input materialisation and runs the conv
    with 4x wider output channels (co=96..192 -> 384..768: exact 128-lane
    tiles on the MXU). Run BEFORE quantize_vae_params — the fused kernel is
    a normal [3,3,ci,4co] conv and int8-quantises per channel as usual."""

    def fuse_conv(conv: Params) -> Params:
        w = conv["w"]  # [3,3,ci,co]
        t0 = jnp.asarray([[1, 0, 0], [0, 1, 1], [0, 0, 0]], w.dtype)
        t1 = jnp.asarray([[0, 0, 0], [1, 1, 0], [0, 0, 1]], w.dtype)
        phases = [
            jnp.einsum("ak,bl,klio->abio", ty, tx, w)
            for ty in (t0, t1) for tx in (t0, t1)
        ]
        return {"w": jnp.concatenate(phases, axis=-1), "b": jnp.tile(conv["b"], 4)}

    out = dict(params)
    dec = dict(out["decoder"])
    ups = []
    for p in dec["upsamples"]:
        if isinstance(p, dict) and "conv" in p and "w" in p["conv"] \
                and p["conv"]["w"].ndim == 4 and p["conv"]["w"].shape[0] == 3:
            p = dict(p)
            p["conv"] = fuse_conv(p["conv"])
        ups.append(p)
    dec["upsamples"] = ups
    out["decoder"] = dec
    return out


def calibrate_vae_act_scales(
    cfg, params: Params, latents: jnp.ndarray, pixels: Optional[jnp.ndarray] = None,
) -> dict:
    """Record per-conv activation maxima over a float decode (and optionally
    encode) pass — the TensorRT calibration analog (demo_utils/vae_torch2trt.py
    builds its int8 engine from calibration batches the same way).

    latents: [B, Tz, h, w, z] (>=2 latent frames exercises first + streaming).
    Returns {tree path: amax}; feed to quantize_vae_params so the int8 convs
    use static activation scales (no dynamic amax pass per call). Path keys
    (not id()) survive copies/device_put/reload of the param pytree between
    calibration and quantisation.
    Runs eagerly — use small spatial dims; scales transfer across resolution."""
    global _ACT_CALIB
    _ACT_CALIB = {}
    try:
        px, cache = decode_chunks(cfg, params, latents[:, :1], None, first=True)
        for i in range(1, latents.shape[1]):
            px, cache = decode_chunks(cfg, params, latents[:, i : i + 1], cache,
                                      first=False)
        if pixels is not None:
            encode_chunks(cfg, params, pixels, None, stream=False)
        by_id = dict(_ACT_CALIB)
    finally:
        _ACT_CALIB = None
    out = {}
    for path, node in _walk_paths(params):
        if id(node) in by_id:
            out[path] = by_id[id(node)]
    return out


def _walk_paths(node, path=""):
    """Yield (path, node) for every dict node in a VAE param pytree."""
    if isinstance(node, dict):
        yield path, node
        for k, v in node.items():
            yield from _walk_paths(v, f"{path}/{k}")
    elif isinstance(node, list):
        for i, v in enumerate(node):
            yield from _walk_paths(v, f"{path}/{i}")


def quantize_vae_params(params: Params, act_scales: Optional[dict] = None,
                        margin: float = 1.5, skip_encoder: bool = False) -> Params:
    """int8-quantise the heavy (3x3 spatial) convs of a VAE param pytree:
    per-output-channel symmetric weight scales; temporal taps pre-merged to
    the wide-conv layout. 1x1 convs, time convs and norms stay in bf16/f32.
    The serving flag is `enable_int8` (reference flag enable_fp8/use_trt).

    act_scales: calibration dict from calibrate_vae_act_scales. Convs found
    in it get a STATIC activation scale (amax * margin / 127) — the dynamic
    per-call amax reduction disappears and the quantise fuses into the
    producing op. margin absorbs content/resolution drift vs calibration."""
    import numpy as np

    attached = [0]

    def quant(p, path):
        if not (isinstance(p, dict) and "w" in p and "b" in p):
            return p
        w = np.asarray(p["w"], np.float32)
        if w.ndim == 5:  # conv3d [kt,kh,kw,ci,co]
            if w.shape[1] != 3:  # skip 1x1 spatial + time convs
                return p
            wq5 = w
        elif w.ndim == 4:  # conv2d [kh,kw,ci,co]
            if w.shape[0] != 3:
                return p
            wq5 = w[None]
        else:
            return p
        co = wq5.shape[-1]
        scale = np.maximum(np.abs(wq5).reshape(-1, co).max(axis=0), 1e-8) / 127.0
        wq = np.clip(np.round(wq5 / scale), -127, 127).astype(np.int8)
        out = {
            "w_q": jnp.asarray(wq),  # [kt,kh,kw,ci,co] int8; kt static via shape
            "scale": jnp.asarray(scale, jnp.float32),
            "b": p["b"],
        }
        if act_scales and path in act_scales:
            out["a_scale"] = jnp.asarray(
                max(act_scales[path], 1e-6) * margin / 127.0, jnp.float32
            )
            attached[0] += 1
        return out

    def walk(node, path=""):
        if isinstance(node, dict):
            if "w" in node and "b" in node and hasattr(node["w"], "ndim"):
                return quant(node, path)
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
        return node

    if skip_encoder:
        # T=1 single-frame encodes are per-conv-overhead-bound; int8's extra
        # quantize/dequant passes can outweigh its MXU gain there — keep the
        # encoder bf16 while the decoder takes the int8 tier
        out = dict(params)
        out["decoder"] = walk(params["decoder"], "/decoder")
        out["conv2"] = walk(params["conv2"], "/conv2")
    else:
        out = walk(params)
    if act_scales:
        # silent-drop guard: calibration that fails to attach is a perf
        # regression with no error — fail loudly instead
        assert attached[0] > 0, (
            "act_scales provided but none attached — path keys do not match "
            "this param pytree (stale calibration?)"
        )
    return out


def latent_scale(cfg: VAEConfig, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if cfg.z_dim == len(VAE_LATENT_MEAN):
        mean = jnp.asarray(VAE_LATENT_MEAN, dtype)
        std = jnp.asarray(VAE_LATENT_STD, dtype)
    else:  # tiny test configs
        mean = jnp.zeros((cfg.z_dim,), dtype)
        std = jnp.ones((cfg.z_dim,), dtype)
    return mean, std


# ---------------------------------------------------------------------------
# chunked drivers (the public VAE API)
# ---------------------------------------------------------------------------


def encode_chunks(
    cfg: VAEConfig,
    params: Params,
    video: jnp.ndarray,  # [B, T, H, W, 3], T = 1 + 4k
    cache: Optional[Cache] = None,
    stream: bool = False,
) -> Tuple[jnp.ndarray, Cache]:
    """Chunked encode: 1,4,4,... fresh (vae.py:491-517) or 4,4,... streaming
    (vae_block3.py:133-175). Returns normalised latents [B, Tz, h, w, z].

    Internals run on THWC (batch folded; streaming requires B=1 exactly like
    the reference cached paths, wan_wrapper.py:100)."""
    assert video.shape[0] == 1, "streaming VAE paths are single-stream (B=1)"
    vid = video[0]
    t = vid.shape[0]
    outs = []
    if not stream:
        # a warm cache with stream=False would be silently discarded and the
        # frames re-encoded as a fresh 1+4k stream (diverging latents)
        assert cache is None, "pass stream=True to continue a warm encode"
        z, cache = encoder_apply(cfg, params["encoder"], vid[:1], None, first=True)
        outs.append(z)
        rest = range(1, t, 4)
    else:
        assert cache is not None, "streaming encode needs a warm cache"
        rest = range(0, t, 4)
    for s in rest:
        z, cache = encoder_apply(cfg, params["encoder"], vid[s : s + 4], cache, first=False)
        outs.append(z)
    out = jnp.concatenate(outs, axis=0)
    mu, _log_var = jnp.split(conv3d(params["conv1"], out), 2, axis=-1)
    mean, std = latent_scale(cfg, jnp.float32)
    mu = (mu.astype(jnp.float32) - mean) / std
    return mu.astype(video.dtype)[None], cache


def decode_chunks(
    cfg: VAEConfig,
    params: Params,
    latents: jnp.ndarray,  # [B, Tz, h, w, z], normalised
    cache: Optional[Cache] = None,
    first: Optional[bool] = None,
    chunk: int = 1,
) -> Tuple[jnp.ndarray, Cache]:
    """Streaming decode (vae.py:519-567, vae_block3.py:195-230).

    first=True (or cache=None): first-ever chunk of a stream — frame 0 skips
    temporal upsampling (1 + 4*(Tz-1) output frames). Subsequent calls with the
    returned cache produce 4*Tz frames.

    `chunk` latent frames batch through each conv together (exact for causal
    convs; any chunking is equivalent — validated by streaming==full tests).
    chunk=1 bounds full-resolution temporaries to ~2GB on a 16GB chip;
    raise it on bigger-HBM parts for throughput.
    """
    if first is None:
        first = cache is None
    assert latents.shape[0] == 1, "streaming VAE paths are single-stream (B=1)"
    mean, std = latent_scale(cfg, jnp.float32)
    z = latents[0].astype(jnp.float32) * std + mean
    z = z.astype(latents.dtype)
    x = conv3d(params["conv2"], z)
    outs = []
    start = 0
    if first:
        y, cache = decoder_apply(cfg, params["decoder"], x[:1], cache, first=True)
        outs.append(y)
        start = 1
    while start < x.shape[0]:
        stop = min(start + chunk, x.shape[0])
        y, cache = decoder_apply(cfg, params["decoder"], x[start:stop], cache, first=False)
        outs.append(y)
        start = stop
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return jnp.clip(out.astype(jnp.float32), -1.0, 1.0)[None], cache


def encode_to_latent(cfg: VAEConfig, params: Params, pixels: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 3, H, W] in [-1,1] -> [B, Tz, z, h, w] (WanVAEWrapper.encode_to_latent,
    utils/wan_wrapper.py:79-93 — the reference also loops the batch)."""
    video = pixels.transpose(0, 1, 3, 4, 2)
    outs = [encode_chunks(cfg, params, video[i : i + 1])[0] for i in range(video.shape[0])]
    return jnp.concatenate(outs, axis=0).transpose(0, 1, 4, 2, 3)


def decode_to_pixel(cfg: VAEConfig, params: Params, latents: jnp.ndarray) -> jnp.ndarray:
    """[B, Tz, z, h, w] -> [B, T, 3, H, W] in [-1,1] (wan_wrapper.py:95-118)."""
    z = latents.transpose(0, 1, 3, 4, 2)
    outs = [
        decode_chunks(cfg, params, z[i : i + 1], None, first=True)[0]
        for i in range(z.shape[0])
    ]
    return jnp.concatenate(outs, axis=0).transpose(0, 1, 4, 2, 3)
