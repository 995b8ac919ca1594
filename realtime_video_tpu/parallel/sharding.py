"""Declarative tensor-parallel shardings for the Wan DiT (Megatron-style).

This replaces the reference's FSDP wrapper classes (wan/distributed/fsdp.py)
and xDiT sequence parallelism for the serving path (SURVEY §2.8): weights are
annotated once with NamedShardings and GSPMD emits the per-layer all-reduces
over ICI.

Pattern per transformer block (params stacked [L, ...]):
  * q/k/v and ffn.fc1 weights: shard the OUTPUT dim (heads / ffn columns);
  * o and ffn.fc2 weights: shard the INPUT dim -> all-reduce after;
  * norms / modulation / embeddings / head: replicated (tiny);
  * KV cache [L,B,S,N,Dh] and cross-attn cache: sharded on the head axis N,
    so decode attention is embarrassingly parallel across chips.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]


def _attn_pspecs(tp: str, fused: bool = False) -> Params:
    col_w, col_b = P(None, None, tp), P(None, tp)
    repl_b = P(None, None)
    specs = {
        "o": {"w": P(None, tp, None), "b": repl_b},
        "norm_q": {"scale": P(None, tp)},
        "norm_k": {"scale": P(None, tp)},
    }
    if fused:
        # fused [L, D, 3D]: replicate — head-interleaved column split of the
        # concatenated qkv would shard q/k/v inconsistently; GSPMD re-shards
        # after the split instead
        specs["qkv"] = {"w": P(None, None, tp), "b": P(None, tp)}
    else:
        for n in ("q", "k", "v"):
            specs[n] = {"w": col_w, "b": col_b}
    return specs


def wan_param_pspecs(params: Params, tp: str = "tp") -> Params:
    """PartitionSpec pytree matching a wan_dit param pytree."""
    blocks = {
        "self_attn": _attn_pspecs(tp, fused="qkv" in params["blocks"]["self_attn"]),
        "cross_attn": _attn_pspecs(tp),
        "ffn": {
            "fc1": {"w": P(None, None, tp), "b": P(None, tp)},
            "fc2": {"w": P(None, tp, None), "b": P(None, None)},
        },
        "modulation": P(None, None, None, None),
    }
    if "norm3" in params["blocks"]:
        blocks["norm3"] = {"scale": P(None, None), "bias": P(None, None)}
    if "k_img" in params["blocks"]["cross_attn"]:
        blocks["cross_attn"]["k_img"] = {"w": P(None, None, tp), "b": P(None, tp)}
        blocks["cross_attn"]["v_img"] = {"w": P(None, None, tp), "b": P(None, tp)}
        blocks["cross_attn"]["norm_k_img"] = {"scale": P(None, tp)}
    specs: Params = {
        "patch_embedding": {"w": P(None, None), "b": P(None)},
        "text_embedding": {
            "fc1": {"w": P(None, None), "b": P(None)},
            "fc2": {"w": P(None, None), "b": P(None)},
        },
        "time_embedding": {
            "fc1": {"w": P(None, None), "b": P(None)},
            "fc2": {"w": P(None, None), "b": P(None)},
        },
        "time_projection": {"fc": {"w": P(None, None), "b": P(None)}},
        "blocks": blocks,
        "head": {
            "head": {"w": P(None, None), "b": P(None)},
            "modulation": P(None, None, None),
        },
    }
    if "img_emb" in params:
        specs["img_emb"] = jax.tree.map(lambda _: P(), params["img_emb"])
    return _fixup_quantized(params, specs)


def _fixup_quantized(params: Params, specs: Params) -> Params:
    """Rewrite specs for int8-quantized linears (quantize_wan_linears):
    {w:[L,in,out], b} becomes {w_q:[L,in,out] i8, scale:[L,out],
    a_scale?:[L], b}. w_q inherits w's spec; scale keeps the out-dim
    sharding so the per-channel rescale stays local to the tp shard."""
    if isinstance(params, dict):
        if "w_q" in params and isinstance(specs, dict) and "w" in specs:
            w = specs["w"]
            fixed = {
                "w_q": w,
                "scale": P(w[0], w[2]) if len(w) == 3 else P(None, None),
            }
            if "a_scale" in params:
                fixed["a_scale"] = P(w[0]) if len(w) == 3 else P(None)
            if "b" in params and "b" in specs:
                fixed["b"] = specs["b"]
            return fixed
        if isinstance(specs, dict):
            return {
                k: _fixup_quantized(params[k], specs[k]) if k in params else v
                for k, v in specs.items()
            }
    return specs


def shard_wan_params(params: Params, mesh: Mesh, tp: str = "tp") -> Params:
    specs = wan_param_pspecs(params, tp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def kv_cache_sharding(mesh: Mesh, tp: str = "tp") -> Dict[str, NamedSharding]:
    """KV cache [L,B,S,N,Dh] sharded on heads; end indices replicated."""
    return {
        "k": NamedSharding(mesh, P(None, None, None, tp, None)),
        "v": NamedSharding(mesh, P(None, None, None, tp, None)),
        "global_end": NamedSharding(mesh, P()),
        "local_end": NamedSharding(mesh, P()),
    }


def crossattn_cache_sharding(mesh: Mesh, tp: str = "tp") -> Dict[str, NamedSharding]:
    return {
        "k": NamedSharding(mesh, P(None, None, None, tp, None)),
        "v": NamedSharding(mesh, P(None, None, None, tp, None)),
    }


def shard_kv_cache(kv: Params, mesh: Mesh, tp: str = "tp") -> Params:
    sh = kv_cache_sharding(mesh, tp)
    return {k: jax.device_put(v, sh[k]) for k, v in kv.items()}


def t5_param_pspecs(params: Params, tp: str = "tp") -> Params:
    blocks = {
        "norm1": {"scale": P(None, None)},
        "attn": {
            "q": {"w": P(None, None, tp)},
            "k": {"w": P(None, None, tp)},
            "v": {"w": P(None, None, tp)},
            "o": {"w": P(None, tp, None)},
        },
        "norm2": {"scale": P(None, None)},
        "ffn": {
            "gate": {"w": P(None, None, tp)},
            "fc1": {"w": P(None, None, tp)},
            "fc2": {"w": P(None, tp, None)},
        },
        "rel_emb": P(None, None, None),
    }
    return {
        "token_embedding": P(None, None),
        "blocks": blocks,
        "norm": {"scale": P(None)},
    }


def shard_t5_params(params: Params, mesh: Mesh, tp: str = "tp") -> Params:
    specs = t5_param_pspecs(params, tp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
