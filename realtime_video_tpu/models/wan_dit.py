"""Block-causal Wan DiT — TPU-native functional implementation.

Re-implements the behaviour of the reference `CausalWanModel`
(wan/modules/causal_model.py:526-1173) and the bidirectional `WanModel`
(wan/modules/model.py:309-500) as one pure-functional model:

  * params are a pytree with transformer blocks stacked on a leading layer
    axis; the forward pass is a single `lax.scan` over layers;
  * the KV cache (ops/kv_cache.py) rides in the scan carry and is updated
    with dynamic-update-slices — with donated buffers XLA compiles these to
    in-place writes (the TPU replacement for the reference's mutable ring
    buffers, causal_model.py:349-392);
  * attention modes are static python switches: "decode" (KV-window),
    "prefill" (blockwise-causal mask, writes cache — the recompute path,
    release_server.py:588-633), "train" (mask only), "teacher_forcing"
    (clean|noisy concat, causal_model.py:1060-1077);
  * AdaLN modulation is per-frame ([B,F,6,C]) exactly as in
    CausalWanAttentionBlock (causal_model.py:463-491).

Numerics: params/activations bf16, norms in f32, RoPE in f32, time MLP in f32.
"""
from __future__ import annotations

import dataclasses
import math
import os as _os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from realtime_video_tpu.config import WanModelConfig
from realtime_video_tpu.models.rope import (
    RopeTables,
    rope_apply,
    rope_apply_fused,
    sinusoidal_embedding_1d,
)
from realtime_video_tpu.ops import attention as attn_ops
from realtime_video_tpu.ops import kv_cache as kvc

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


_AMAX_SUB = int(_os.getenv("RTV_DIT_AMAX_SUB", "1"))
# quantise with a hoisted scalar reciprocal + multiply instead of a
# per-element f32 divide (divide lowers to ~7 VPU ops; the quantise pass is
# VPU-bound — traces show ~0.4 ms per FFN input at 4680x8960). Opt-in until
# the fused A/B ratifies it (changes program traces; measurement rules in
# CLAUDE.md). Rounding can differ by 1 LSB at exact-half quanta.
_Q_RCP = _os.getenv("RTV_Q_RCP", "0") in ("1", "true")
# quantise in bf16 arithmetic end-to-end (multiply/round/clip in bf16, no
# f32 widening): halves the VPU register traffic of the quantise-write
# fusion (~0.4 ms per FFN input in the r4 trace, ~2.5x its HBM roofline).
# Integers <=127 are exact in bf16; the scaled value picks up a <=0.4%
# relative error BEFORE rounding, so quanta can shift 1 LSB near the top of
# range — same order as the quantisation noise itself. Opt-in until the
# fused A/B ratifies it (VERDICT r4 #3).
_Q_BF16 = _os.getenv("RTV_Q_BF16", "0") in ("1", "true")
# fused int8 linear Pallas kernel (ops/pallas_int8_mm.py): quantise + s8
# MXU dot + dequant epilogue in ONE kernel — no s8 activation copy in HBM,
# no separate quantise-write/dequant fusions. Static-scale tier only;
# opt-in until the fused A/B ratifies it (VERDICT r4 #3).
_PALLAS_MM = _os.getenv("RTV_DIT_PALLAS_MM", "0") in ("1", "true")

#: when a list, eager (python-scan) block forwards record max|input| of every
#: block linear, in call order — the DiT analog of the VAE's TRT-style
#: calibration (calibrate_vae_act_scales). See calibrate_wan_act_scales.
_ACT_CALIB: Optional[list] = None
_IN_SCAN = False
#: jit-mode calibration: `linear` appends TRACER amaxes (collected once per
#: layer-scan body trace and emitted as scan outputs by dit_forward) instead
#: of eager floats — the whole calibration forward compiles to ONE program
#: per timestep shape. Cuts the 1.3B bench recalibration from ~7 min of
#: single-core eager dispatch to one CPU compile + fast executions.
_CALIB_JIT = False


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if _ACT_CALIB is not None and _IN_SCAN and "w" in p \
            and hasattr(p["w"], "ndim") and p["w"].ndim == 2:
        if _CALIB_JIT:
            _ACT_CALIB.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
        elif not isinstance(x, jax.core.Tracer):
            # eager-only hook (calibrate_act_scales); the Tracer guard keeps a
            # jitted forward issued during calibration from crashing on float()
            _ACT_CALIB.append(float(jnp.max(jnp.abs(x.astype(jnp.float32)))))
    if "w_q" in p:
        # int8 weights + per-tensor activation scale (the TPU analog of the
        # reference's torchao quantized linears, release_server.py:179-182;
        # int8 MXU throughput is 2x bf16 on v5e). Activation scale is STATIC
        # (calibrated per site+layer — no amax pass at all) when "a_scale"
        # is present, else a dynamic per-call amax.
        # RTV_DIT_AMAX_SUB=k>1: estimate amax from every k-th token row (1/k
        # the reduce traffic; values beyond the estimate saturate at +-127)
        if "a_scale" in p:
            a_scale = p["a_scale"].astype(jnp.float32)
            if _PALLAS_MM and p["w_q"].ndim == 2 \
                    and _os.getenv("RTV_DISABLE_PALLAS", "0") not in ("1", "true") \
                    and jax.default_backend() == "tpu":
                from realtime_video_tpu.ops import pallas_int8_mm

                y = pallas_int8_mm.int8_linear(
                    x, p["w_q"], p["scale"], a_scale, bias=p.get("b"))
                if y is not None:
                    return y
        else:
            xa = x[..., ::_AMAX_SUB, :] if _AMAX_SUB > 1 and x.ndim >= 2 else x
            amax = jnp.maximum(jnp.max(jnp.abs(xa.astype(jnp.float32))), 1e-6)
            a_scale = amax / 127.0
        if _Q_BF16:
            scaled = x.astype(jnp.bfloat16) * (1.0 / a_scale).astype(jnp.bfloat16)
        else:
            xf = x.astype(jnp.float32)
            scaled = xf * (1.0 / a_scale) if _Q_RCP else xf / a_scale
        xq = jnp.clip(jnp.round(scaled), -127, 127).astype(jnp.int8)
        yq = jnp.dot(xq, p["w_q"], preferred_element_type=jnp.int32)
        y = yq.astype(jnp.float32) * (a_scale * p["scale"].astype(jnp.float32))
        if "b" in p:
            y = y + p["b"].astype(jnp.float32)
        return y.astype(x.dtype)
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _calib_site_order(blocks: Params):
    """The block-linear call order inside the layer body — must match `body`
    in dit_forward (self-attn proj(s), o, cross q, cross o, ffn fc1, fc2)."""
    sa = blocks["self_attn"]
    sites = ([("self_attn", "qkv")] if "qkv" in sa else
             [("self_attn", "q"), ("self_attn", "k"), ("self_attn", "v")])
    sites += [("self_attn", "o"), ("cross_attn", "q"), ("cross_attn", "o"),
              ("ffn", "fc1"), ("ffn", "fc2")]
    return sites


def _python_scan(body, carry, xs):
    """Eager per-layer loop standing in for the layer lax.scan during
    activation calibration (so `linear` sees concrete per-layer values)."""
    global _IN_SCAN
    num = jax.tree_util.tree_leaves(xs)[0].shape[0]
    ys = []
    _IN_SCAN = True
    try:
        for i in range(num):
            x_i = jax.tree_util.tree_map(lambda a: a[i], xs)
            carry, y = body(carry, x_i)
            ys.append(y)
    finally:
        _IN_SCAN = False
    stacked = None if ys[0] is None else jnp.stack(ys)
    return carry, stacked


def calibrate_wan_act_scales(records: list, blocks: Params, num_layers: int):
    """Fold flat call-order calibration records into {(group, name): [L] amax}.

    records: concatenation over >=1 forwards of per-layer, per-site amaxes
    (what `linear` appended under _ACT_CALIB). Multiple forwards (e.g. one
    per denoise timestep) are max-reduced elementwise."""
    import numpy as np

    sites = _calib_site_order(blocks)
    per_fwd = num_layers * len(sites)
    assert records and len(records) % per_fwd == 0, (
        len(records), per_fwd,
        "calibration records do not tile (gan_classify taps are not "
        "supported during calibration)",
    )
    arr = np.asarray(records, np.float64).reshape(-1, num_layers, len(sites))
    amax = arr.max(axis=0)  # [L, sites]
    return {site: amax[:, j] for j, site in enumerate(sites)}


def quantize_wan_linears(
    params: Params, act_scales: Optional[dict] = None, margin: float = 1.5
) -> Params:
    """int8-quantise the transformer block linears (self/cross attention
    projections + FFN) with per-output-channel weight scales. Embeddings,
    norms, modulation and the head stay in bf16/f32.

    act_scales: {(group, name): [L] amax} from calibrate_wan_act_scales —
    matching sites get a STATIC per-layer activation scale (amax * margin /
    127, stacked [L] so the layer scan slices it), dropping the per-call
    dynamic amax pass (the VAE's measured +0.42 fps analog)."""
    import numpy as np

    def quant(p, a_amax=None):
        w = np.asarray(p["w"], np.float32)  # [L, in, out]
        scale = np.maximum(np.abs(w).max(axis=1), 1e-8) / 127.0  # [L, out]
        wq = np.clip(np.round(w / scale[:, None, :]), -127, 127).astype(np.int8)
        out = {"w_q": jnp.asarray(wq), "scale": jnp.asarray(scale, jnp.float32)}
        if a_amax is not None:
            out["a_scale"] = jnp.asarray(
                np.maximum(a_amax, 1e-6) * margin / 127.0, jnp.float32
            )
        if "b" in p:
            out["b"] = p["b"]
        return out

    blocks = params["blocks"]

    def walk(node, group):
        if isinstance(node, dict):
            if "w" in node and hasattr(node["w"], "ndim") and node["w"].ndim == 3:
                return quant(node)
            out = {}
            for k, v in node.items():
                if act_scales and (group, k) in act_scales and isinstance(v, dict) \
                        and "w" in v and hasattr(v["w"], "ndim") and v["w"].ndim == 3:
                    out[k] = quant(v, act_scales[(group, k)])
                else:
                    out[k] = walk(v, group)
            return out

        return node

    new_blocks = dict(blocks)
    for key in ("self_attn", "cross_attn", "ffn"):
        new_blocks[key] = walk(blocks[key], key)
    if act_scales:
        attached = sum(
            1 for g in ("self_attn", "cross_attn", "ffn")
            for v in new_blocks[g].values()
            if isinstance(v, dict) and "a_scale" in v
        )
        # calibration against a different param layout (e.g. calibrated
        # unfused q/k/v then fused before quantizing) would silently fall
        # back to dynamic amax — a perf regression with no error. Fail
        # loudly instead (the VAE counterpart asserts the same way).
        assert attached > 0, (
            "act_scales matched no linear: calibrate and quantize on the "
            f"SAME param layout (scale keys: {sorted(act_scales)})"
        )
    return dict(params, blocks=new_blocks)


def rms_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """WanRMSNorm (model.py:69-85): stats in f32, then * weight."""
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return n.astype(x.dtype) * p["scale"].astype(x.dtype)


def layer_norm(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """WanLayerNorm (model.py:88-98): f32 stats, optional affine."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y.astype(x.dtype)
    if scale is not None:
        y = y * scale.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def _per_frame(
    x: jnp.ndarray, num_frames: int
) -> jnp.ndarray:  # [B, L, D] -> [B, F, L/F, D]
    b, L, d = x.shape
    return x.reshape(b, num_frames, L // num_frames, d)


def _flat(x: jnp.ndarray) -> jnp.ndarray:  # [B,F,l,D] -> [B,L,D]
    b, f, l, d = x.shape
    return x.reshape(b, f * l, d)


def modulate(x: jnp.ndarray, num_frames: int, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Per-frame AdaLN: unflatten seq -> (F, fsl), x*(1+scale)+shift
    (causal_model.py:471)."""
    xf = _per_frame(x, num_frames)
    y = xf * (1.0 + scale[:, :, None, :].astype(x.dtype)) + shift[:, :, None, :].astype(x.dtype)
    return _flat(y)


def gate(x: jnp.ndarray, num_frames: int, g: jnp.ndarray) -> jnp.ndarray:
    xf = _per_frame(x, num_frames)
    return _flat(xf * g[:, :, None, :].astype(x.dtype))


# ---------------------------------------------------------------------------
# parameter init / structure
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, dtype, init="xavier", bias=True) -> Params:
    if init == "xavier":
        lim = math.sqrt(6.0 / (d_in + d_out))
        w = jax.random.uniform(key, (d_in, d_out), jnp.float32, -lim, lim)
    elif init == "normal02":
        w = jax.random.normal(key, (d_in, d_out), jnp.float32) * 0.02
    elif init == "zeros":
        w = jnp.zeros((d_in, d_out), jnp.float32)
    else:
        raise ValueError(init)
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def fuse_qkv_params(params: Params) -> Params:
    """Fuse per-block self-attention q/k/v into one [L, D, 3D] projection
    (reference fuse_projections, causal_model.py:203-216). Inference-only
    transform; the split weights are dropped."""
    sa = params["blocks"]["self_attn"]
    if "qkv" in sa:
        return params
    assert "w" in sa["q"], (
        "fuse_qkv_params must run BEFORE quantize_wan_linears "
        "(the split float weights are needed to build the fused qkv)"
    )
    fused = {
        "w": jnp.concatenate([sa["q"]["w"], sa["k"]["w"], sa["v"]["w"]], axis=-1),
        "b": jnp.concatenate([sa["q"]["b"], sa["k"]["b"], sa["v"]["b"]], axis=-1),
    }
    new_sa = {k: v for k, v in sa.items() if k not in ("q", "k", "v")}
    new_sa["qkv"] = fused
    new_blocks = dict(params["blocks"], self_attn=new_sa)
    return dict(params, blocks=new_blocks)


def init_wan_params(
    key: jax.Array, cfg: WanModelConfig, dtype=jnp.bfloat16
) -> Params:
    """Random init mirroring CausalWanModel.init_weights (causal_model.py:1151-1173)."""
    d, ffn, nl = cfg.dim, cfg.ffn_dim, cfg.num_layers
    pt, ph, pw = cfg.patch_size
    keys = iter(jax.random.split(key, 64))

    def block_params(k) -> Params:
        ks = iter(jax.random.split(k, 16))
        sa = {
            "q": _init_linear(next(ks), d, d, dtype),
            "k": _init_linear(next(ks), d, d, dtype),
            "v": _init_linear(next(ks), d, d, dtype),
            "o": _init_linear(next(ks), d, d, dtype),
            "norm_q": {"scale": jnp.ones((d,), dtype)},
            "norm_k": {"scale": jnp.ones((d,), dtype)},
        }
        ca = {
            "q": _init_linear(next(ks), d, d, dtype),
            "k": _init_linear(next(ks), d, d, dtype),
            "v": _init_linear(next(ks), d, d, dtype),
            "o": _init_linear(next(ks), d, d, dtype),
            "norm_q": {"scale": jnp.ones((d,), dtype)},
            "norm_k": {"scale": jnp.ones((d,), dtype)},
        }
        if cfg.model_type == "i2v":
            ca["k_img"] = _init_linear(next(ks), d, d, dtype)
            ca["v_img"] = _init_linear(next(ks), d, d, dtype)
            ca["norm_k_img"] = {"scale": jnp.ones((d,), dtype)}
        blk = {
            "self_attn": sa,
            "cross_attn": ca,
            "ffn": {
                "fc1": _init_linear(next(ks), d, ffn, dtype),
                "fc2": _init_linear(next(ks), ffn, d, dtype),
            },
            "modulation": (
                jax.random.normal(next(ks), (1, 6, d), jnp.float32) / d**0.5
            ).astype(jnp.float32),
        }
        if cfg.cross_attn_norm:
            blk["norm3"] = {
                "scale": jnp.ones((d,), dtype),
                "bias": jnp.zeros((d,), dtype),
            }
        return blk

    blocks = [block_params(k) for k in jax.random.split(next(keys), nl)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)

    params: Params = {
        "patch_embedding": _init_linear(
            next(keys), cfg.in_dim * pt * ph * pw, d, dtype
        ),
        "text_embedding": {
            "fc1": _init_linear(next(keys), cfg.text_dim, d, dtype, "normal02"),
            "fc2": _init_linear(next(keys), d, d, dtype, "normal02"),
        },
        "time_embedding": {
            "fc1": _init_linear(next(keys), cfg.freq_dim, d, jnp.float32, "normal02"),
            "fc2": _init_linear(next(keys), d, d, jnp.float32, "normal02"),
        },
        "time_projection": {
            "fc": _init_linear(next(keys), d, 6 * d, jnp.float32)
        },
        "blocks": stacked,
        "head": {
            # zero-init output layer (causal_model.py:1173)
            "head": _init_linear(
                next(keys), d, math.prod(cfg.patch_size) * cfg.out_dim, dtype, "zeros"
            ),
            "modulation": (
                jax.random.normal(next(keys), (1, 2, d), jnp.float32) / d**0.5
            ),
        },
    }
    if cfg.model_type == "i2v":
        params["img_emb"] = {
            "norm1": {"scale": jnp.ones((1280,), dtype), "bias": jnp.zeros((1280,), dtype)},
            "fc1": _init_linear(next(keys), 1280, d, dtype),
            "fc2": _init_linear(next(keys), d, d, dtype),
            "norm2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        }
    return params


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------


def patchify(cfg: WanModelConfig, params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[B, F, C, H, W] latents -> [B, F*h*w, D] tokens.

    patch (1,2,2) conv == reshape + matmul (MXU-friendly; replaces the Conv3d
    patch_embedding, causal_model.py:614-615).
    """
    pt, ph, pw = cfg.patch_size
    assert pt == 1, "temporal patch size must be 1 (Wan uses (1,2,2))"
    b, f, c, H, W = x.shape
    h, w = H // ph, W // pw
    xt = x.reshape(b, f, c, h, ph, w, pw)
    xt = xt.transpose(0, 1, 3, 5, 2, 4, 6)  # [B,f,h,w,C,ph,pw]
    tokens = xt.reshape(b, f * h * w, c * ph * pw)
    return linear(params["patch_embedding"], tokens)


def unpatchify(
    cfg: WanModelConfig, x: jnp.ndarray, grid: Tuple[int, int, int]
) -> jnp.ndarray:
    """[B, L, prod(patch)*out] -> [B, F, out, H, W] (causal_model.py:1126-1149)."""
    f, h, w = grid
    pt, ph, pw = cfg.patch_size
    c = cfg.out_dim
    b = x.shape[0]
    y = x.reshape(b, f, h, w, pt, ph, pw, c)
    y = y.transpose(0, 1, 4, 7, 2, 5, 3, 6)  # [B,f,pt,c,h,ph,w,pw]
    return y.reshape(b, f * pt, c, h * ph, w * pw)


def time_embeddings(
    cfg: WanModelConfig, params: Params, t: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """t [B, F] -> (e [B,F,D] f32, e0 [B,F,6,D] f32) (causal_model.py:890-892)."""
    b, f = t.shape
    sin = sinusoidal_embedding_1d(cfg.freq_dim, t.reshape(-1))  # f32
    te = params["time_embedding"]
    e = linear(te["fc2"], jax.nn.silu(linear(te["fc1"], sin)))
    e0 = linear(params["time_projection"]["fc"], jax.nn.silu(e))
    return e.reshape(b, f, cfg.dim), e0.reshape(b, f, 6, cfg.dim)


def text_embedding(cfg: WanModelConfig, params: Params, context: jnp.ndarray) -> jnp.ndarray:
    """[B, 512, text_dim] -> [B, 512, D] (causal_model.py:616-618, 897-902)."""
    te = params["text_embedding"]
    return linear(te["fc2"], gelu_tanh(linear(te["fc1"], context)))


def img_embedding(params: Params, clip_fea: jnp.ndarray) -> jnp.ndarray:
    """MLPProj for i2v CLIP features (model.py:503-515)."""
    p = params["img_emb"]
    x = layer_norm(clip_fea, p["norm1"]["scale"], p["norm1"]["bias"])
    x = gelu_tanh(linear(p["fc1"], x))
    x = linear(p["fc2"], x)
    return layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"])


def compute_crossattn_cache(
    cfg: WanModelConfig,
    params: Params,
    context: jnp.ndarray,
    clip_fea: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Precompute per-layer text K/V [L,B,T,N,Dh] (the reference computes these
    lazily on first forward, model.py:186-195; we do it once per prompt).

    For i2v models pass clip_fea [B, 257, 1280]: the img_emb MLP projects it
    and per-layer k_img/v_img are cached too (WanI2VCrossAttention,
    model.py:258-300).
    """
    ctx = text_embedding(cfg, params, context)  # [B, T, D]
    ca = params["blocks"]["cross_attn"]
    b, T, _ = ctx.shape
    n, dh = cfg.num_heads, cfg.head_dim

    def _dense_w(pp):
        # dequantise int8 weights for the once-per-prompt cache build
        if "w_q" in pp:
            return (
                pp["w_q"].astype(jnp.float32) * pp["scale"][:, None, :]
            ).astype(ctx.dtype)
        return pp["w"]

    def kv_one(src):
        def f(w_k, b_k, w_v, b_v, nk_scale):
            k = jnp.dot(src, w_k.astype(src.dtype)) + b_k.astype(src.dtype)
            k = rms_norm({"scale": nk_scale}, k)
            v = jnp.dot(src, w_v.astype(src.dtype)) + b_v.astype(src.dtype)
            Ts = src.shape[1]
            return k.reshape(b, Ts, n, dh), v.reshape(b, Ts, n, dh)
        return f

    k, v = jax.vmap(kv_one(ctx))(
        _dense_w(ca["k"]), ca["k"]["b"], _dense_w(ca["v"]), ca["v"]["b"],
        ca["norm_k"]["scale"],
    )
    cache = {"k": k, "v": v}
    if clip_fea is not None and cfg.model_type == "i2v":
        img_ctx = img_embedding(params, clip_fea.astype(ctx.dtype))  # [B,257,D]
        k_img, v_img = jax.vmap(kv_one(img_ctx))(
            _dense_w(ca["k_img"]), ca["k_img"]["b"],
            _dense_w(ca["v_img"]), ca["v_img"]["b"],
            ca["norm_k_img"]["scale"],
        )
        cache["k_img"] = k_img
        cache["v_img"] = v_img
    return cache


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ForwardMode:
    kind: str  # "decode" | "prefill" | "train"
    rolling: bool = False  # rolling KV eviction (local-attn long-form path)


def gan_block_apply(
    cfg: WanModelConfig, p: Params, x: jnp.ndarray, register: jnp.ndarray
) -> jnp.ndarray:
    """GanAttentionBlock (model.py:391-470): register token cross-attends to
    the layer features; token = reg + attn(norm3(x), reg); y = ffn(norm2) + token.

    x [B, L, D]; register [B, 1, D]. Returns [B, 1, D].
    """
    b, L, d = x.shape
    n, dh = cfg.num_heads, cfg.head_dim
    xn = layer_norm(x, p["norm3"]["scale"], p["norm3"]["bias"], eps=cfg.eps)
    ca = p["cross_attn"]
    # WanGanCrossAttention (model.py:231-255): q from the register token,
    # k/v from the features
    q = rms_norm(ca["norm_q"], linear(ca["q"], register), eps=cfg.eps).reshape(b, 1, n, dh)
    k = rms_norm(ca["norm_k"], linear(ca["k"], xn), eps=cfg.eps).reshape(b, L, n, dh)
    v = linear(ca["v"], xn).reshape(b, L, n, dh)
    y = attn_ops.xla_attention(q, k, v)
    token = register + linear(ca["o"], y.reshape(b, 1, d))
    tn = layer_norm(token, eps=cfg.eps)
    ff = p["ffn"]
    return linear(ff["fc2"], gelu_tanh(linear(ff["fc1"], tn))) + token


def dit_forward(
    cfg: WanModelConfig,
    params: Params,
    x: jnp.ndarray,  # [B, F, C, H, W]
    t: jnp.ndarray,  # [B, F] float32 timesteps
    rope_tables: RopeTables,
    crossattn_cache: Dict[str, jnp.ndarray],
    mode: str = "decode",
    kv_cache: Optional[Dict[str, jnp.ndarray]] = None,
    current_start: jnp.ndarray | int = 0,
    max_attention_size: Optional[int] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    sink_tokens: int = 0,
    rolling: bool = False,
    gan_classify: Optional[Dict[str, Any]] = None,
    tf_concat: bool = False,
    prefill_block_tokens: Optional[int] = None,
    sp_attn=None,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """One transformer forward. Returns (flow_pred [B,F,C,H,W], new_kv_cache).

    mode="decode": RoPE offset = current_start//fsl; append K/V to the cache at
      the reference's local indices; attend over the window
      [local_end - max_attention_size, local_end)   (causal_model.py:349-392).
    mode="prefill": blockwise-causal mask over the input, K/V written at
      [0, L); ends set to L (causal_model.py:305-348 + recompute path).
    mode="train": mask-only, no cache (set attn_mask, kv_cache=None).
    """
    b, f, c, H, W = x.shape
    pt, ph, pw = cfg.patch_size
    # teacher forcing: x = [clean | noisy] along frames; RoPE positions repeat
    # for the two halves (causal_model.py:1060-1077 + rope per chunk)
    rope_f = f // 2 if tf_concat else f
    grid = (rope_f, H // ph, W // pw)
    fsl = grid[1] * grid[2]
    L = f * fsl
    n, dh = cfg.num_heads, cfg.head_dim

    tokens = patchify(cfg, params, x)  # [B, L, D]
    e, e0 = time_embeddings(cfg, params, t)  # f32
    e0 = e0.astype(jnp.float32)

    current_start = jnp.asarray(current_start, jnp.int32)
    if mode == "decode":
        assert kv_cache is not None and max_attention_size is not None
        cache_size = kv_cache["k"].shape[2]
        start_frame = current_start // fsl
        shift, write_start, new_global_end, new_local_end = kvc.plan_kv_update(
            kv_cache, current_start, L, cache_size, sink_tokens, rolling
        )
        # static-size attention window ending at new_local_end
        win = min(max_attention_size, cache_size)
        win_start = jnp.clip(new_local_end - win, 0, cache_size - win)
        # valid kv positions relative to the window slice
        dec_lo = jnp.maximum(new_local_end - max_attention_size, 0) - win_start
        dec_hi = new_local_end - win_start
    elif mode == "prefill":
        assert kv_cache is not None
        start_frame = jnp.zeros((), jnp.int32)
        write_start = jnp.zeros((), jnp.int32)
        new_global_end = jnp.asarray(L, jnp.int32)
        new_local_end = jnp.asarray(L, jnp.int32)
        shift = jnp.zeros((), jnp.int32)
        if attn_mask is None and prefill_block_tokens is None:
            raise ValueError("prefill requires attn_mask or prefill_block_tokens")
    elif mode == "train":
        # attn_mask None = full bidirectional attention (the 50-step teacher,
        # text2video.py generate) — mask-free, so no [L, L] mask tensor is
        # ever materialised (1 GB at the 32760-token teacher shape) and the
        # fast unmasked attention path applies. sp_attn (optional) replaces
        # the self-attention with a sequence-parallel one (the xDiT USP
        # monkey-patch analog, text2video.py:87-97).
        start_frame = jnp.zeros((), jnp.int32)
    else:
        raise ValueError(mode)

    mask_b = None
    if attn_mask is not None:
        mask_b = attn_mask[None, None]  # [1,1,Lq,Lk]

    num_layers = cfg.num_layers
    layer_ids = jnp.arange(num_layers, dtype=jnp.int32)

    # hoist the fused rope grid out of the layer loop: layer-invariant, and
    # traced per layer its small per-axis table reads become latency-bound
    # S(1) prefetches every iteration (measured ~37% of the denoise step)
    rope_cos, rope_sin = rope_tables.fused(*grid, start_frame)

    def body(carry, xs):
        xtok, ck_all, cv_all = carry
        bp, cak, cav, lid = xs["bp"], xs["cak"], xs["cav"], xs["lid"]
        # modulation: [1,6,D] broadcast-added to e0 [B,F,6,D] (causal_model.py:466)
        em = bp["modulation"][None].astype(jnp.float32) + e0  # [B,F,6,D] via [1,1,6,D]
        sh_msa, sc_msa, g_msa = em[:, :, 0], em[:, :, 1], em[:, :, 2]
        sh_ffn, sc_ffn, g_ffn = em[:, :, 3], em[:, :, 4], em[:, :, 5]

        # ---- self attention ----
        xn = modulate(layer_norm(xtok, eps=cfg.eps), f, sh_msa, sc_msa)
        sa = bp["self_attn"]
        if "qkv" in sa:
            # fused projection (reference fuse_projections,
            # release_server.py:176-177): one wide matmul
            q, k, v = jnp.split(linear(sa["qkv"], xn), 3, axis=-1)
            q = rms_norm(sa["norm_q"], q, eps=cfg.eps).reshape(b, L, n, dh)
            k = rms_norm(sa["norm_k"], k, eps=cfg.eps).reshape(b, L, n, dh)
            v = v.reshape(b, L, n, dh)
        else:
            q = rms_norm(sa["norm_q"], linear(sa["q"], xn), eps=cfg.eps).reshape(b, L, n, dh)
            k = rms_norm(sa["norm_k"], linear(sa["k"], xn), eps=cfg.eps).reshape(b, L, n, dh)
            v = linear(sa["v"], xn).reshape(b, L, n, dh)
        if tf_concat:
            Lh = L // 2
            q = jnp.concatenate(
                [rope_apply_fused(q[:, :Lh], rope_cos, rope_sin),
                 rope_apply_fused(q[:, Lh:], rope_cos, rope_sin)], axis=1)
            k = jnp.concatenate(
                [rope_apply_fused(k[:, :Lh], rope_cos, rope_sin),
                 rope_apply_fused(k[:, Lh:], rope_cos, rope_sin)], axis=1)
        else:
            q = rope_apply_fused(q, rope_cos, rope_sin)
            k = rope_apply_fused(k, rope_cos, rope_sin)

        if mode == "train":
            if sp_attn is not None and mask_b is None:
                y = sp_attn(q, k, v)
            else:
                y = attn_ops.attention(q, k, v, mask=mask_b)
        else:
            if mode == "decode" and rolling:
                ck_l = kvc.shift_layer_cache(ck_all[lid], shift, sink_tokens)
                cv_l = kvc.shift_layer_cache(cv_all[lid], shift, sink_tokens)
                ck_all = jax.lax.dynamic_update_slice(
                    ck_all, ck_l[None], (lid, 0, 0, 0, 0)
                )
                cv_all = jax.lax.dynamic_update_slice(
                    cv_all, cv_l[None], (lid, 0, 0, 0, 0)
                )
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, k.astype(ck_all.dtype)[None], (lid, 0, write_start, 0, 0)
            )
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, v.astype(cv_all.dtype)[None], (lid, 0, write_start, 0, 0)
            )
            if mode == "decode":
                wk = jax.lax.dynamic_slice(
                    ck_all, (lid, 0, win_start, 0, 0), (1, b, win, n, dh)
                )[0]
                wv = jax.lax.dynamic_slice(
                    cv_all, (lid, 0, win_start, 0, 0), (1, b, win, n, dh)
                )[0]
                y = attn_ops.decode_attention(
                    q, wk.astype(q.dtype), wv.astype(q.dtype), dec_lo, dec_hi
                )
            elif prefill_block_tokens is not None:
                # prefill on the Pallas block-causal kernel (no dense mask)
                y = attn_ops.block_causal_attention(q, k, v, prefill_block_tokens)
            else:  # prefill with an explicit dense mask (i2v variants)
                y = attn_ops.attention(q, k, v, mask=mask_b)

        y = linear(sa["o"], y.reshape(b, L, cfg.dim))
        xtok = xtok + gate(y, f, g_msa)

        # ---- cross attention (t2v; cached text K/V) ----
        ca = bp["cross_attn"]
        if cfg.cross_attn_norm:
            xc = layer_norm(xtok, bp["norm3"]["scale"], bp["norm3"]["bias"], eps=cfg.eps)
        else:
            xc = xtok
        qc = rms_norm(ca["norm_q"], linear(ca["q"], xc), eps=cfg.eps).reshape(b, L, n, dh)
        yc = attn_ops.attention(qc, cak.astype(qc.dtype), cav.astype(qc.dtype))
        if "cak_img" in xs:
            # i2v: add image-token attention before the output proj
            # (WanI2VCrossAttention, model.py:291-299)
            y_img = attn_ops.attention(
                qc, xs["cak_img"].astype(qc.dtype), xs["cav_img"].astype(qc.dtype)
            )
            yc = yc + y_img
        xtok = xtok + linear(ca["o"], yc.reshape(b, L, cfg.dim))

        # ---- ffn ----
        xf2 = modulate(layer_norm(xtok, eps=cfg.eps), f, sh_ffn, sc_ffn)
        ff = bp["ffn"]
        y = linear(ff["fc2"], gelu_tanh(linear(ff["fc1"], xf2)))
        xtok = xtok + gate(y, f, g_ffn)

        ys = None
        if gan_classify is not None:
            # feature taps for the GAN critic (model.py:785-789): at tapped
            # layers the matching register token cross-attends to the features
            taps = gan_classify["taps"]
            regs = gan_classify["registers"]  # [num_reg, D] (rms-normed)
            gbs = gan_classify["blocks"]

            def mk(i):
                def f(_):
                    reg = jnp.broadcast_to(
                        regs[i][None, None].astype(xtok.dtype), (b, 1, cfg.dim)
                    )
                    return gan_block_apply(cfg, gbs[i], xtok, reg)
                return f

            def zero(_):
                return jnp.zeros((b, 1, cfg.dim), xtok.dtype)

            branch = len(taps)
            for i, tl in enumerate(taps):
                branch = jnp.where(lid == tl, i, branch)
            ys = jax.lax.switch(branch, [mk(i) for i in range(len(taps))] + [zero], None)
        return (xtok, ck_all, cv_all), ys

    if kv_cache is not None:
        carry0 = (tokens, kv_cache["k"], kv_cache["v"])
    else:
        dummy = jnp.zeros((num_layers, b, 1, n, dh), tokens.dtype)
        carry0 = (tokens, dummy, dummy)

    xs = {
        "bp": params["blocks"],
        "cak": crossattn_cache["k"],
        "cav": crossattn_cache["v"],
        "lid": layer_ids,
    }
    if "k_img" in crossattn_cache:
        xs["cak_img"] = crossattn_cache["k_img"]
        xs["cav_img"] = crossattn_cache["v_img"]
    # serving profile: the rolled scan dynamic-slices EVERY stacked param per
    # layer per step (~28 async slice-starts x layers x steps measured on the
    # denoise trace). Unrolling makes the slices static so XLA schedules
    # weight prefetches across layers and fuses across block boundaries.
    # Costs compile time; training keeps the rolled loop (remat-friendly).
    unroll = int(_os.getenv("RTV_DIT_UNROLL", "1"))
    if _ACT_CALIB is not None and _CALIB_JIT:
        # jit-mode calibration: the scan body is traced once; `linear`
        # appends one tracer amax per site, which we pop and emit as the
        # scan's per-layer output -> [L, n_sites] in a single compiled
        # program (vs the eager per-layer loop below)
        def body_cal(carry, xs_):
            global _IN_SCAN
            n0 = len(_ACT_CALIB)
            _IN_SCAN = True
            try:
                carry2, _ = body(carry, xs_)
            finally:
                _IN_SCAN = False
            site_amax = jnp.stack(_ACT_CALIB[n0:])
            del _ACT_CALIB[n0:]
            return carry2, site_amax

        (tokens, new_k, new_v), site_amax = jax.lax.scan(body_cal, carry0, xs)
        _ACT_CALIB.append(site_amax)  # [L, n_sites] traced array
        tap_tokens = None
    elif _ACT_CALIB is not None:
        # calibration: eager per-layer loop so `linear` records concrete
        # per-site activation maxima (lax.scan traces the body only once)
        (tokens, new_k, new_v), tap_tokens = _python_scan(body, carry0, xs)
    else:
        (tokens, new_k, new_v), tap_tokens = jax.lax.scan(
            body, carry0, xs, unroll=unroll if unroll > 1 else 1
        )

    logits = None
    if gan_classify is not None:
        # tap_tokens: [L, B, 1, D]; gather the tapped layers (model.py:790-795)
        taps = gan_classify["taps"]
        sel = jnp.concatenate([tap_tokens[tl] for tl in taps], axis=1)  # [B,n,D]
        flat = sel.reshape(b, -1)
        if gan_classify.get("concat_time", False):
            flat = jnp.concatenate([flat, 10.0 * e[:, 0].astype(flat.dtype)], axis=-1)
        cp = gan_classify["cls_head"]
        hcls = layer_norm(flat, cp["norm"]["scale"], cp["norm"]["bias"], eps=1e-5)
        hcls = jax.nn.silu(linear(cp["fc1"], hcls))
        logits = linear(cp["fc2"], hcls)

    # ---- head (CausalHead, causal_model.py:495-523) ----
    if tf_concat:
        # keep only the noisy half (causal_model.py:1104-1108)
        tokens = tokens[:, L // 2 :]
        e = e[:, f // 2 :]
        f = f // 2
    hp = params["head"]
    eh = hp["modulation"][None].astype(jnp.float32) + e[:, :, None, :]  # [B,F,2,D]
    sh, sc = eh[:, :, 0], eh[:, :, 1]
    yh = modulate(layer_norm(tokens, eps=cfg.eps), f, sh, sc)
    out = linear(hp["head"], yh)
    flow = unpatchify(cfg, out, (f, grid[1], grid[2]))

    if gan_classify is not None:
        return flow, logits
    new_cache = None
    if kv_cache is not None:
        new_cache = {
            "k": new_k,
            "v": new_v,
            "global_end": new_global_end,
            "local_end": new_local_end,
        }
    return flow, new_cache


def context_prefill(
    cfg: WanModelConfig,
    params: Params,
    clean_ctx: jnp.ndarray,  # [B, F_ctx, C, H, W]
    rope_tables,
    crossattn_cache,
    kv_cache,
    block_tokens: int,
    max_attention_size: int,
):
    """Write clean-context K/V into a freshly-reset cache (the serving
    recompute path, release_server.py:588-633).

    When the context is at most ONE attention block (the server's
    kv_cache_num_frames=3 == num_frame_per_block), the blockwise-causal mask
    is dense — identical math to a decode-mode forward at current_start=0,
    whose compiled program measures ~4x faster than the prefill-mode one on
    v5e (bench/split_bench.py round-2 notes). Longer contexts (resume
    latents) keep the block-causal kernel."""
    b, f = clean_ctx.shape[:2]
    fsl = cfg.frame_seq_length(clean_ctx.shape[-2], clean_ctx.shape[-1])
    t0 = jnp.zeros((b, f), jnp.float32)
    if f * fsl <= block_tokens and f * fsl <= max_attention_size:
        _, kv = dit_forward(
            cfg, params, clean_ctx, t0, rope_tables, crossattn_cache,
            mode="decode", kv_cache=kv_cache, current_start=0,
            max_attention_size=max_attention_size,
        )
    else:
        _, kv = dit_forward(
            cfg, params, clean_ctx, t0, rope_tables, crossattn_cache,
            mode="prefill", kv_cache=kv_cache,
            prefill_block_tokens=block_tokens,
        )
    return kv


def dit_classify(
    cfg: WanModelConfig,
    params: Params,
    noisy: jnp.ndarray,
    t: jnp.ndarray,
    rope_tables: RopeTables,
    crossattn_cache: Dict[str, jnp.ndarray],
    gan_params: Params,
    taps: Tuple[int, ...] = (13, 21, 29),
    concat_time: bool = False,
) -> jnp.ndarray:
    """Discriminator logits [B, num_class] (classify-mode forward,
    model.py:775-795). Full bidirectional attention, no cache."""
    b, f, c, h, w = noisy.shape
    registers = rms_norm(
        gan_params["register_norm"], gan_params["register_tokens"], eps=1e-6
    )
    # attn_mask=None: full bidirectional attention IS the mask-free fast
    # path — a dense all-ones [L,L] mask would be a mathematical no-op that
    # forces the masked XLA attention (O(L^2) memory; ~1 GB of mask alone at
    # the 32760-token teacher shape) instead of the flash kernel
    _, logits = dit_forward(
        cfg, params, noisy, t.astype(jnp.float32), rope_tables, crossattn_cache,
        mode="train", attn_mask=None,
        gan_classify={
            "taps": taps,
            "registers": registers,
            "blocks": gan_params["blocks"],
            "cls_head": gan_params["cls_head"],
            "concat_time": concat_time,
        },
    )
    return logits
