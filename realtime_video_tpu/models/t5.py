"""umT5-XXL text encoder — functional JAX implementation.

Mirrors the reference from-scratch T5 (wan/modules/t5.py):
  * T5Attention without q scaling (t5.py:111-114);
  * per-layer relative position embeddings (umT5: shared_pos=False,
    t5.py:466-467) with the standard log-bucketed relative positions
    (t5.py:245-264);
  * gated-GELU feed-forward fc1(x) * gelu(gate(x)) (t5.py:123-141);
  * pre-norm residual blocks, final T5LayerNorm.

Layers are stacked and scanned; the bucket matrix is computed once per length
and each layer looks up its own embedding inside the scan.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.config import T5Config

Params = Dict[str, Any]


def t5_layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMS-style norm without mean subtraction (t5.py:53-66)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (p["scale"].astype(jnp.float32) * y).astype(x.dtype)


def _gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    # explicit tanh-GELU (t5.py:46-50)
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


def relative_position_buckets(
    lq: int, lk: int, num_buckets: int = 32, max_dist: int = 128, bidirectional: bool = True
) -> jnp.ndarray:
    """[lq, lk] int32 bucket ids (t5.py:245-264)."""
    ctx = np.arange(lk)[None, :] - np.arange(lq)[:, None]  # rel_pos
    if bidirectional:
        nb = num_buckets // 2
        buckets = (ctx > 0).astype(np.int64) * nb
        rel = np.abs(ctx)
    else:
        nb = num_buckets
        buckets = np.zeros_like(ctx)
        rel = -np.minimum(ctx, 0)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / math.log(max_dist / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets = buckets + np.where(rel < max_exact, rel, large)
    return jnp.asarray(buckets, jnp.int32)


def init_t5_encoder_params(
    key: jax.Array, cfg: T5Config, dtype=jnp.bfloat16
) -> Params:
    """Init mirroring t5.py:27-43 (only shapes matter — real use loads weights)."""
    d, da, dff, nh, nl = cfg.dim, cfg.dim_attn, cfg.dim_ffn, cfg.num_heads, cfg.num_layers
    keys = iter(jax.random.split(key, 8 * nl + 8))

    def lin(k, din, dout, std):
        return {"w": (jax.random.normal(k, (din, dout), jnp.float32) * std).astype(dtype)}

    def block(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "norm1": {"scale": jnp.ones((d,), dtype)},
            "attn": {
                "q": lin(next(ks), d, da, (d * da) ** -0.5),
                "k": lin(next(ks), d, da, d**-0.5),
                "v": lin(next(ks), d, da, d**-0.5),
                "o": lin(next(ks), da, d, (nh * (da // nh)) ** -0.5),
            },
            "norm2": {"scale": jnp.ones((d,), dtype)},
            "ffn": {
                "gate": lin(next(ks), d, dff, d**-0.5),
                "fc1": lin(next(ks), d, dff, d**-0.5),
                "fc2": lin(next(ks), dff, d, dff**-0.5),
            },
            "rel_emb": (
                jax.random.normal(next(ks), (cfg.num_buckets, nh), jnp.float32)
                * (2 * cfg.num_buckets * nh) ** -0.5
            ).astype(jnp.float32),
        }

    blocks = [block(k) for k in jax.random.split(next(keys), nl)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)
    return {
        "token_embedding": (
            jax.random.normal(next(keys), (cfg.vocab_size, d), jnp.float32)
        ).astype(dtype),
        "blocks": stacked,
        "norm": {"scale": jnp.ones((d,), dtype)},
    }


def t5_encode(
    cfg: T5Config,
    params: Params,
    ids: jnp.ndarray,  # [B, L] int32
    mask: Optional[jnp.ndarray] = None,  # [B, L] 1=token
) -> jnp.ndarray:
    """Returns [B, L, dim] final hidden states (t5.py:303-312)."""
    b, L = ids.shape
    nh = cfg.num_heads
    hd = cfg.dim_attn // nh
    x = params["token_embedding"][ids]
    buckets = relative_position_buckets(
        L, L, cfg.num_buckets, cfg.max_dist, bidirectional=True
    )
    if mask is not None:
        attn_mask = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30).astype(jnp.float32)
    else:
        attn_mask = jnp.zeros((b, 1, 1, L), jnp.float32)

    def body(x, bp):
        # self attention (no q scaling)
        y = t5_layer_norm(bp["norm1"], x)
        ap = bp["attn"]
        q = jnp.dot(y, ap["q"]["w"].astype(y.dtype)).reshape(b, L, nh, hd)
        k = jnp.dot(y, ap["k"]["w"].astype(y.dtype)).reshape(b, L, nh, hd)
        v = jnp.dot(y, ap["v"]["w"].astype(y.dtype)).reshape(b, L, nh, hd)
        pos_bias = bp["rel_emb"][buckets].transpose(2, 0, 1)[None]  # [1,H,L,L] f32
        logits = (
            jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
            + pos_bias
            + attn_mask
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, L, cfg.dim_attn)
        x = x + jnp.dot(o, ap["o"]["w"].astype(o.dtype))
        # gated-GELU ffn
        y = t5_layer_norm(bp["norm2"], x)
        fp = bp["ffn"]
        h = jnp.dot(y, fp["fc1"]["w"].astype(y.dtype)) * _gelu_tanh(
            jnp.dot(y, fp["gate"]["w"].astype(y.dtype))
        )
        x = x + jnp.dot(h, fp["fc2"]["w"].astype(h.dtype))
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return t5_layer_norm(params["norm"], x)


def encode_prompts(
    cfg: T5Config,
    params: Params,
    ids: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """WanTextEncoder.forward semantics: run the encoder, zero the padding
    positions (utils/wan_wrapper.py:43-55). Returns [B, text_len, dim]."""
    ctx = t5_encode(cfg, params, ids, mask)
    return ctx * (mask[..., None] > 0).astype(ctx.dtype)
