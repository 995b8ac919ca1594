"""XLM-Roberta-CLIP (vision tower) for image-to-video conditioning.

Mirrors the reference wan/modules/clip.py: ViT-H/14 (dim 1280, 32 layers,
heads 16, gelu, pre-norm) whose 31st-block features [B, 257, 1280] condition
the i2v cross attention (CLIPModel.visual with use_31_block=True,
clip.py:527-541); plus a compact XLM-Roberta text tower (clip.py:455-471,
xlm_roberta.py) for full API parity.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

VIT_H_CFG = dict(
    image_size=224, patch_size=14, dim=1280, mlp_ratio=4, num_heads=16,
    num_layers=32, norm_eps=1e-5,
)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(
        x.dtype
    )


def _lin(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_vit_params(key, cfg=None, dtype=jnp.float32) -> Params:
    cfg = cfg or VIT_H_CFG
    d, nl, mr = cfg["dim"], cfg["num_layers"], cfg["mlp_ratio"]
    ps = cfg["patch_size"]
    np_tokens = (cfg["image_size"] // ps) ** 2
    gain = 1.0 / math.sqrt(d)
    keys = iter(jax.random.split(key, 8 * nl + 8))

    def lin_p(k, din, dout, bias=True):
        p = {"w": (jax.random.normal(k, (din, dout), jnp.float32) * gain).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def block(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "norm1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "attn": {
                "qkv": lin_p(next(ks), d, 3 * d),
                "proj": lin_p(next(ks), d, d),
            },
            "norm2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "mlp": {
                "fc1": lin_p(next(ks), d, mr * d),
                "fc2": lin_p(next(ks), mr * d, d),
            },
        }

    blocks = [block(k) for k in jax.random.split(next(keys), nl)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)
    return {
        # conv as matmul over 14x14x3 patches (pre_norm=True -> no bias)
        "patch_embedding": {"w": (jax.random.normal(next(keys), (ps * ps * 3, d), jnp.float32) * gain).astype(dtype)},
        "cls_embedding": (jax.random.normal(next(keys), (1, 1, d), jnp.float32) * gain).astype(dtype),
        "pos_embedding": (jax.random.normal(next(keys), (1, np_tokens + 1, d), jnp.float32) * gain).astype(dtype),
        "pre_norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "blocks": stacked,
    }


def vit_forward(
    params: Params,
    images: jnp.ndarray,  # [B, 3, H, W] normalised with CLIP stats
    cfg=None,
    use_31_block: bool = True,
) -> jnp.ndarray:
    """Returns [B, 257, 1280] features after 31 blocks (clip.py:281-302)."""
    cfg = cfg or VIT_H_CFG
    d, nh = cfg["dim"], cfg["num_heads"]
    hd = d // nh
    ps = cfg["patch_size"]
    b, c, H, W = images.shape
    gh, gw = H // ps, W // ps
    x = images.reshape(b, c, gh, ps, gw, ps).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, gh * gw, c * ps * ps)
    x = _lin(params["patch_embedding"], x)
    cls = jnp.broadcast_to(params["cls_embedding"].astype(x.dtype), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    x = _ln(params["pre_norm"], x, cfg["norm_eps"])

    L = x.shape[1]
    num_layers = cfg["num_layers"] - (1 if use_31_block else 0)

    def body(x, bp):
        y = _ln(bp["norm1"], x, cfg["norm_eps"])
        qkv = _lin(bp["attn"]["qkv"], y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, L, nh, hd)
        k = k.reshape(b, L, nh, hd)
        v = v.reshape(b, L, nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (hd**-0.5), axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, L, d)
        x = x + _lin(bp["attn"]["proj"], o)
        y = _ln(bp["norm2"], x, cfg["norm_eps"])
        h = jax.nn.gelu(_lin(bp["mlp"]["fc1"], y), approximate=False)
        x = x + _lin(bp["mlp"]["fc2"], h)
        return x, None

    sliced = jax.tree.map(lambda a: a[:num_layers], params["blocks"])
    x, _ = jax.lax.scan(body, x, sliced)
    return x


XLM_ROBERTA_CFG = dict(
    vocab_size=250002, max_text_len=514, type_size=1, pad_id=1,
    dim=1024, num_heads=16, num_layers=24, post_norm=True, norm_eps=1e-5,
)


def init_xlm_roberta_params(key, cfg=None, dtype=jnp.float32) -> Params:
    """XLM-Roberta text tower (reference wan/modules/xlm_roberta.py:76-170):
    BERT-style post-LN encoder with word/position/type embeddings."""
    cfg = cfg or XLM_ROBERTA_CFG
    d, nl = cfg["dim"], cfg["num_layers"]
    keys = iter(jax.random.split(key, 8 * nl + 8))

    def lin(k, din, dout):
        return {
            "w": (jax.random.normal(k, (din, dout), jnp.float32) * 0.02).astype(dtype),
            "b": jnp.zeros((dout,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def block(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "attn": {
                "q": lin(next(ks), d, d), "k": lin(next(ks), d, d),
                "v": lin(next(ks), d, d), "o": lin(next(ks), d, d),
            },
            "norm1": ln(),
            "ffn": {"fc1": lin(next(ks), d, 4 * d), "fc2": lin(next(ks), 4 * d, d)},
            "norm2": ln(),
        }

    blocks = [block(k) for k in jax.random.split(next(keys), nl)]
    return {
        "token_embedding": (jax.random.normal(next(keys), (cfg["vocab_size"], d), jnp.float32) * 0.02).astype(dtype),
        "pos_embedding": (jax.random.normal(next(keys), (cfg["max_text_len"], d), jnp.float32) * 0.02).astype(dtype),
        "type_embedding": (jax.random.normal(next(keys), (cfg["type_size"], d), jnp.float32) * 0.02).astype(dtype),
        "emb_norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "pad_id": cfg["pad_id"],
    }


def xlm_roberta_forward(
    params: Params, ids: jnp.ndarray, cfg=None
) -> jnp.ndarray:
    """[B, L] ids -> [B, L, dim] hidden states (post-norm transformer)."""
    cfg = cfg or XLM_ROBERTA_CFG
    d, nh = cfg["dim"], cfg["num_heads"]
    hd = d // nh
    b, L = ids.shape
    pad_id = cfg["pad_id"]
    mask = (ids != pad_id).astype(jnp.int32)
    # roberta position ids: pad positions stay at pad_id, others count up
    pos = jnp.cumsum(mask, axis=1) * mask + pad_id
    x = (
        params["token_embedding"][ids]
        + params["pos_embedding"][pos]
        + params["type_embedding"][jnp.zeros_like(ids)]
    )
    x = _ln(params["emb_norm"], x, cfg["norm_eps"])
    attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30).astype(jnp.float32)

    def body(x, bp):
        ap = bp["attn"]
        q = _lin(ap["q"], x).reshape(b, L, nh, hd)
        k = _lin(ap["k"], x).reshape(b, L, nh, hd)
        v = _lin(ap["v"], x).reshape(b, L, nh, hd)
        logits = (
            jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
            * hd**-0.5 + attn_bias
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, L, d)
        x = _ln(bp["norm1"], x + _lin(ap["o"], o), cfg["norm_eps"])
        h = jax.nn.gelu(_lin(bp["ffn"]["fc1"], x), approximate=False)
        x = _ln(bp["norm2"], x + _lin(bp["ffn"]["fc2"], h), cfg["norm_eps"])
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


class CLIPVisionEncoder:
    """i2v conditioning encoder (reference CLIPModel.visual, clip.py:527-541)."""

    def __init__(self, params: Optional[Params] = None, dtype=jnp.float32):
        if params is None:
            params = init_vit_params(jax.random.PRNGKey(0), dtype=dtype)
        self.params = params
        self.cfg = VIT_H_CFG
        self._fwd = jax.jit(lambda p, x: vit_forward(p, x, self.cfg, True))

    def __call__(self, videos: jnp.ndarray) -> jnp.ndarray:
        """videos [B, C, T, H, W] in [-1, 1] -> [B*T, 257, 1280]."""
        b, c, t, h, w = videos.shape
        frames = videos.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        size = self.cfg["image_size"]
        frames = jax.image.resize(frames, (b * t, c, size, size), "bicubic")
        mean = jnp.asarray(CLIP_IMAGE_MEAN, frames.dtype).reshape(1, 3, 1, 1)
        std = jnp.asarray(CLIP_IMAGE_STD, frames.dtype).reshape(1, 3, 1, 1)
        frames = (frames * 0.5 + 0.5 - mean) / std
        return self._fwd(self.params, frames)


def convert_clip_vision(sd, dtype=jnp.float32) -> Params:
    """torch open-clip-xlm-roberta-large-vit-huge-14 checkpoint (visual.*) ->
    param pytree."""
    import torch

    def np_(t):
        return t.detach().to(torch.float32).cpu().numpy()

    pe = np_(sd["visual.patch_embedding.weight"])  # [D, 3, 14, 14]
    d = pe.shape[0]
    blocks = []
    i = 0
    while f"visual.transformer.{i}.norm1.weight" in sd:
        b = f"visual.transformer.{i}"
        blocks.append(
            {
                "norm1": {
                    "scale": jnp.asarray(np_(sd[f"{b}.norm1.weight"]), dtype),
                    "bias": jnp.asarray(np_(sd[f"{b}.norm1.bias"]), dtype),
                },
                "attn": {
                    "qkv": {
                        "w": jnp.asarray(np_(sd[f"{b}.attn.to_qkv.weight"]).T, dtype),
                        "b": jnp.asarray(np_(sd[f"{b}.attn.to_qkv.bias"]), dtype),
                    },
                    "proj": {
                        "w": jnp.asarray(np_(sd[f"{b}.attn.proj.weight"]).T, dtype),
                        "b": jnp.asarray(np_(sd[f"{b}.attn.proj.bias"]), dtype),
                    },
                },
                "norm2": {
                    "scale": jnp.asarray(np_(sd[f"{b}.norm2.weight"]), dtype),
                    "bias": jnp.asarray(np_(sd[f"{b}.norm2.bias"]), dtype),
                },
                "mlp": {
                    "fc1": {
                        "w": jnp.asarray(np_(sd[f"{b}.mlp.0.weight"]).T, dtype),
                        "b": jnp.asarray(np_(sd[f"{b}.mlp.0.bias"]), dtype),
                    },
                    "fc2": {
                        "w": jnp.asarray(np_(sd[f"{b}.mlp.2.weight"]).T, dtype),
                        "b": jnp.asarray(np_(sd[f"{b}.mlp.2.bias"]), dtype),
                    },
                },
            }
        )
        i += 1
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)
    return {
        "patch_embedding": {
            "w": jnp.asarray(pe.reshape(d, -1).T, dtype)
        },
        "cls_embedding": jnp.asarray(np_(sd["visual.cls_embedding"]), dtype),
        "pos_embedding": jnp.asarray(np_(sd["visual.pos_embedding"]), dtype),
        "pre_norm": {
            "scale": jnp.asarray(np_(sd["visual.pre_norm.weight"]), dtype),
            "bias": jnp.asarray(np_(sd["visual.pre_norm.bias"]), dtype),
        },
        "blocks": stacked,
    }
