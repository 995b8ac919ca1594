"""Serving memory plan + sharding helpers for the 14B north-star config.

The reference serves the 14B on one B200 (weights ~28 GB bf16 + up to 25 GB
KV cache, README.md:31-32). On TPU the same model serves over a tp mesh
(v5p-8 or v5e-8): weights shard on heads/FFN columns, the KV cache on the
head axis (parallel/sharding.py). This module computes the per-chip memory
plan from `jax.eval_shape` + the actual PartitionSpecs — no device memory is
touched — so CI can assert the 14B fits before any hardware exists.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

from realtime_video_tpu.config import WanModelConfig
from realtime_video_tpu.models import wan_dit
from realtime_video_tpu.parallel import sharding as sh

Params = Dict[str, Any]

#: HBM per chip (bytes) for the parts we plan against
HBM_BYTES = {
    "v5e": 16 * 1024**3,
    "v5p": 95 * 1024**3,
}


def _per_chip_bytes(shapes: Params, pspecs: Params, axis_sizes: Dict[str, int]) -> int:
    """Sum of per-chip bytes for a pytree of ShapeDtypeStructs under pspecs."""
    total = 0
    for leaf, spec in zip(jax.tree.leaves(shapes), jax.tree.leaves(
            pspecs, is_leaf=lambda x: isinstance(x, PartitionSpec))):
        n = math.prod(leaf.shape) * leaf.dtype.itemsize
        div = 1
        for axes in spec:
            if axes is None:
                continue
            for ax in (axes if isinstance(axes, tuple) else (axes,)):
                div *= axis_sizes.get(ax, 1)
        total += n // div
    return total


@dataclasses.dataclass(frozen=True)
class ServingPlan:
    """Per-chip byte budget for serving one stream."""

    dit_params: int
    kv_cache: int
    crossattn_cache: int
    activations: int  # DiT forward high-water estimate
    total: int

    def fits(self, part: str, reserve_frac: float = 0.15) -> bool:
        """True if the plan fits `part` with a fraction reserved for XLA
        temporaries/fragmentation."""
        return self.total <= HBM_BYTES[part] * (1 - reserve_frac)

    def table(self) -> str:
        gb = 1024**3
        rows = [
            ("DiT params", self.dit_params),
            ("KV cache", self.kv_cache),
            ("cross-attn cache", self.crossattn_cache),
            ("activation high-water", self.activations),
            ("total / chip", self.total),
        ]
        return "\n".join(f"{k:22s} {v / gb:7.2f} GB" for k, v in rows)


def serving_memory_plan(
    cfg: WanModelConfig,
    tp: int,
    window_frames: int = 21,
    frame_seqlen: int = 1560,
    batch: int = 1,
    dtype=jnp.bfloat16,
) -> ServingPlan:
    """Per-chip plan for KV-cached block-causal serving on a tp-way mesh.

    window_frames=21 is the reference's worst-case global window (32760
    tokens, wan_wrapper.py:153 / README.md:32); the realtime server runs
    kv_cache_num_frames+3 = 6.
    """
    isz = jnp.dtype(dtype).itemsize
    axis = {"tp": tp}

    pshapes = jax.eval_shape(
        lambda k: wan_dit.init_wan_params(k, cfg, dtype), jax.random.PRNGKey(0)
    )
    pspecs = sh.wan_param_pspecs(pshapes)
    dit = _per_chip_bytes(pshapes, pspecs, axis)

    S = window_frames * frame_seqlen
    kv = 2 * cfg.num_layers * batch * S * cfg.num_heads * cfg.head_dim * isz // tp
    cross = 2 * cfg.num_layers * batch * cfg.text_len * cfg.num_heads * cfg.head_dim * isz // tp

    # forward high-water: per-layer live set at the 3-frame block
    #   x + 2 residual copies [B,L,D] replicated, qkv [B,L,3D/tp],
    #   ffn hidden [B,L,ffn/tp], attention window K/V slice [B,S,N/tp,Dh]
    L = 3 * frame_seqlen
    acts = batch * L * (
        3 * cfg.dim + (3 * cfg.dim + cfg.ffn_dim) // tp
    ) * isz + 2 * batch * S * cfg.num_heads * cfg.head_dim * isz // tp
    # f32 logits tile headroom for the attention kernel + unpatchify buffers
    acts = int(acts * 1.5)

    total = dit + kv + cross + acts
    return ServingPlan(dit, kv, cross, acts, total)


def shard_for_serving(
    params: Params,
    kv: Optional[Params],
    cross: Optional[Params],
    mesh: Mesh,
    tp: str = "tp",
):
    """Place (params, kv_cache, crossattn_cache) for tp serving on `mesh`.

    Used by bench.py and the server when more than one device is attached
    (the reference's analogue is whole-model replication, release_server.py:111
    — tp sharding is the TPU-native upgrade)."""
    params = sh.shard_wan_params(params, mesh, tp)
    if kv is not None:
        kv = sh.shard_kv_cache(kv, mesh, tp)
    if cross is not None:
        cs = sh.crossattn_cache_sharding(mesh, tp)
        cross = {k: jax.device_put(v, cs[k]) for k, v in cross.items()}
    return params, kv, cross
