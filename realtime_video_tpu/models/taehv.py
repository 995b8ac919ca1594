"""TAEHV — Tiny AutoEncoder for Hunyuan/Wan video (cheap preview decode tier).

Mirrors the reference demo_utils/taehv.py: MemBlock (temporal memory of the
previous frame's input), TPool (channel-concat of `stride` consecutive frames
+ 1x1 conv), TGrow (1x1 conv to stride*C, split into frames), Clamp, spatial
up/down sampling. Loaded from taew2_1.pth for Wan 2.1 latents.

Instead of the reference's two runners (parallel O(T) vs sequential
graph-traversal O(1), taehv.py:60-156) we implement chunk-streaming: each
MemBlock carries its last input frame in an explicit state pytree, so chunked
calls are exact and jit-friendly.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

LATENT_CHANNELS = 16
IMAGE_CHANNELS = 3
N_F = (256, 128, 64, 64)


def _conv2d(p, x, stride=1):
    """x [N*T, H, W, C]."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        padding=[(1, 1), (1, 1)] if p["w"].shape[0] == 3 else [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _flat(x):  # [N,T,H,W,C] -> [N*T,H,W,C]
    n, t = x.shape[:2]
    return x.reshape(n * t, *x.shape[2:]), n, t


def _unflat(x, n):
    nt = x.shape[0]
    return x.reshape(n, nt // n, *x.shape[1:])


# decoder plan: list of (kind, args). kind in
# {conv, relu, clamp, mem, upsample, tpool, tgrow}
def decoder_plan(time_upscale=(True, True), space_upscale=(True, True, True)):
    p: List[Tuple] = [
        ("clamp",), ("conv", LATENT_CHANNELS, N_F[0], True), ("relu",),
        ("mem", N_F[0], N_F[0]), ("mem", N_F[0], N_F[0]), ("mem", N_F[0], N_F[0]),
        ("upsample", 2 if space_upscale[0] else 1),
        ("tgrow", N_F[0], 1), ("conv", N_F[0], N_F[1], False),
        ("mem", N_F[1], N_F[1]), ("mem", N_F[1], N_F[1]), ("mem", N_F[1], N_F[1]),
        ("upsample", 2 if space_upscale[1] else 1),
        ("tgrow", N_F[1], 2 if time_upscale[0] else 1), ("conv", N_F[1], N_F[2], False),
        ("mem", N_F[2], N_F[2]), ("mem", N_F[2], N_F[2]), ("mem", N_F[2], N_F[2]),
        ("upsample", 2 if space_upscale[2] else 1),
        ("tgrow", N_F[2], 2 if time_upscale[1] else 1), ("conv", N_F[2], N_F[3], False),
        ("relu",), ("conv", N_F[3], IMAGE_CHANNELS, True),
    ]
    return p


def encoder_plan():
    p: List[Tuple] = [
        ("conv", IMAGE_CHANNELS, 64, True), ("relu",),
        ("tpool", 64, 2), ("conv_s2", 64, 64, False),
        ("mem", 64, 64), ("mem", 64, 64), ("mem", 64, 64),
        ("tpool", 64, 2), ("conv_s2", 64, 64, False),
        ("mem", 64, 64), ("mem", 64, 64), ("mem", 64, 64),
        ("tpool", 64, 1), ("conv_s2", 64, 64, False),
        ("mem", 64, 64), ("mem", 64, 64), ("mem", 64, 64),
        ("conv", 64, LATENT_CHANNELS, True),
    ]
    return p


def _init_conv(key, kh, cin, cout, bias, dtype):
    lim = 1.0 / math.sqrt(kh * kh * cin)
    k1, k2 = jax.random.split(key)
    p = {"w": jax.random.uniform(k1, (kh, kh, cin, cout), jnp.float32, -lim, lim).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_taehv_params(key, dtype=jnp.float32, time_upscale=(True, True)) -> Params:
    keys = iter(jax.random.split(key, 128))

    def stage(plan):
        out = []
        for spec in plan:
            kind = spec[0]
            if kind in ("conv", "conv_s2"):
                _, cin, cout, bias = spec
                out.append(_init_conv(next(keys), 3, cin, cout, bias, dtype))
            elif kind == "mem":
                _, cin, cout = spec
                p = {
                    "c0": _init_conv(next(keys), 3, cin * 2, cout, True, dtype),
                    "c1": _init_conv(next(keys), 3, cout, cout, True, dtype),
                    "c2": _init_conv(next(keys), 3, cout, cout, True, dtype),
                }
                if cin != cout:
                    p["skip"] = _init_conv(next(keys), 1, cin, cout, False, dtype)
                out.append(p)
            elif kind == "tpool":
                _, nf, stride = spec
                out.append(_init_conv(next(keys), 1, nf * stride, nf, False, dtype))
            elif kind == "tgrow":
                _, nf, stride = spec
                out.append(_init_conv(next(keys), 1, nf, nf * stride, False, dtype))
            else:
                out.append(None)
        return out

    return {
        "encoder": stage(encoder_plan()),
        "decoder": stage(decoder_plan(time_upscale)),
    }


def _mem_block(p, x, n, carry):
    """x [N*T,H,W,C]; carry [N,1,H,W,C] previous last-frame input or None."""
    xt = _unflat(x, n)
    if carry is None:
        past = jnp.concatenate([jnp.zeros_like(xt[:, :1]), xt[:, :-1]], axis=1)
    else:
        past = jnp.concatenate([carry.astype(xt.dtype), xt[:, :-1]], axis=1)
    new_carry = xt[:, -1:]
    past_f, _, _ = _flat(past)
    y = _conv2d(p["c0"], jnp.concatenate([x, past_f], axis=-1))
    y = jax.nn.relu(y)
    y = _conv2d(p["c1"], y)
    y = jax.nn.relu(y)
    y = _conv2d(p["c2"], y)
    skip = _conv2d(p["skip"], x) if "skip" in p else x
    return jax.nn.relu(y + skip), new_carry


def _apply(plan, params, x, state: Optional[List]):
    """x [N,T,H,W,C]; state = per-block carry list (None = fresh clip)."""
    n = x.shape[0]
    xf, n, t = _flat(x)
    fresh = state is None
    new_state: List = []
    for i, (spec, p) in enumerate(zip(plan, params)):
        kind = spec[0]
        if kind == "conv":
            xf = _conv2d(p, xf)
        elif kind == "conv_s2":
            xf = _conv2d(p, xf, stride=2)
        elif kind == "relu":
            xf = jax.nn.relu(xf)
        elif kind == "clamp":
            xf = jnp.tanh(xf / 3.0) * 3.0
        elif kind == "upsample":
            s = spec[1]
            if s != 1:
                xf = jnp.repeat(jnp.repeat(xf, s, axis=1), s, axis=2)
        elif kind == "mem":
            carry = None if fresh else state[len(new_state)]
            xf, c = _mem_block(p, xf, n, carry)
            new_state.append(c)
            continue
        elif kind == "tpool":
            stride = spec[2]
            xt = _unflat(xf, n)
            nn_, tt, hh, ww, cc = xt.shape
            # channel-concat `stride` consecutive frames (frame-major order,
            # matching the torch reshape semantics in taehv.py:43-45)
            xt = (
                xt.reshape(nn_, tt // stride, stride, hh, ww, cc)
                .transpose(0, 1, 3, 4, 2, 5)
                .reshape(nn_, tt // stride, hh, ww, stride * cc)
            )
            xf, n, t = _flat(xt)
            xf = _conv2d(p, xf)
        elif kind == "tgrow":
            stride = spec[2]
            xf = _conv2d(p, xf)
            if stride > 1:
                nt, hh, ww, cc = xf.shape
                xt = xf.reshape(n, nt // n, hh, ww, stride, cc // stride)
                xt = xt.transpose(0, 1, 4, 2, 3, 5).reshape(
                    n, (nt // n) * stride, hh, ww, cc // stride
                )
                xf, n, t = _flat(xt)
        else:
            raise ValueError(kind)
    return _unflat(xf, n), new_state


def taehv_decode(
    params: Params,
    latents: jnp.ndarray,  # [N, T, C=16, h, w] ~Gaussian
    state: Optional[List] = None,
    time_upscale=(True, True),
) -> Tuple[jnp.ndarray, List]:
    """Decode latents to [N, 4T, 3, H, W] in ~[0,1]. For a fresh clip the
    caller trims the first 2^(time_upscales)-1 frames (taehv.py:180)."""
    x = latents.transpose(0, 1, 3, 4, 2)
    out, new_state = _apply(decoder_plan(time_upscale), params["decoder"], x, state)
    return out.transpose(0, 1, 4, 2, 3), new_state


def taehv_encode(
    params: Params,
    video: jnp.ndarray,  # [N, T, 3, H, W] in [0, 1], T multiple of 4
    state: Optional[List] = None,
) -> Tuple[jnp.ndarray, List]:
    x = video.transpose(0, 1, 3, 4, 2)
    out, new_state = _apply(encoder_plan(), params["encoder"], x, state)
    return out.transpose(0, 1, 4, 2, 3), new_state


def frames_to_trim(time_upscale=(True, True)) -> int:
    return 2 ** sum(time_upscale) - 1


def convert_taehv_checkpoint(sd, dtype=jnp.float32) -> Params:
    """torch taew2_1.pth state dict -> param pytree (patching TGrow kernels as
    in taehv.py:195-208)."""

    def conv_p(prefix, bias=True):
        w = np.asarray(sd[f"{prefix}.weight"].float().numpy())
        p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0), dtype)}
        if bias and f"{prefix}.bias" in sd:
            p["b"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"].float().numpy()), dtype)
        return p

    def stage(plan, prefix):
        out = []
        for i, spec in enumerate(plan):
            kind = spec[0]
            base = f"{prefix}.{i}"
            if kind in ("conv", "conv_s2"):
                out.append(conv_p(base))
            elif kind == "mem":
                p = {
                    "c0": conv_p(f"{base}.conv.0"),
                    "c1": conv_p(f"{base}.conv.2"),
                    "c2": conv_p(f"{base}.conv.4"),
                }
                if f"{base}.skip.weight" in sd:
                    p["skip"] = conv_p(f"{base}.skip", bias=False)
                out.append(p)
            elif kind in ("tpool", "tgrow"):
                w = np.asarray(sd[f"{base}.conv.weight"].float().numpy())
                if kind == "tgrow":
                    want_out = spec[1] * spec[2]
                    if w.shape[0] > want_out:
                        w = w[-want_out:]
                out.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0), dtype)})
            else:
                out.append(None)
        return out

    return {
        "encoder": stage(encoder_plan(), "encoder"),
        "decoder": stage(decoder_plan(), "decoder"),
    }
