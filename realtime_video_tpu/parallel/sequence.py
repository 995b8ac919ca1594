"""Ulysses-style sequence parallelism for the bidirectional teacher path.

The reference shards the 50-step teacher's 32760-token sequence across GPUs
with xDiT USP (wan/distributed/xdit_context_parallel.py:149-184 calls
xFuserLongContextAttention = Ulysses all-to-all + ring hybrid; the DiT forward
chunks the sequence per rank at :130-133 and all-gathers after the head at
:141-142; RoPE tables are padded/sliced per rank at :12-57).

TPU-native design: the sequence axis of every activation is sharded over a
mesh axis ("sp"); attention — the only op that mixes sequence positions —
runs under `shard_map` with two `all_to_all` collectives that ride ICI:

    [B, L/sp, N, D] --all_to_all--> [B, L, N/sp, D]   (gather seq, split heads)
        full-sequence attention on the local head group
    [B, L, N/sp, D] --all_to_all--> [B, L/sp, N, D]   (restore layout)

Everything else (linears, norms, modulation) is position-wise, so GSPMD keeps
it sharded on L with zero extra communication. RoPE needs no per-rank offset
plumbing (unlike pad_freqs at xdit_context_parallel.py:12-23): callers apply
RoPE *before* the shard_map boundary and GSPMD slices the tables with the
activations.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 (keyword-only API, check_rep renamed to check_vma)
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _local_attention(q, k, v, scale, mask=None):
    # plain fused attention on [B, L, n_local, D]; imported lazily to avoid a
    # circular import (ops.attention pulls in pallas on TPU)
    from realtime_video_tpu.ops.attention import xla_attention

    return xla_attention(q, k, v, mask=mask, scale=scale)


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
):
    """Attention over a sequence-sharded batch, inside `shard_map`.

    q/k/v: [B, L_local, N, D] with L sharded over `axis_name`. N must be
    divisible by the axis size. Returns [B, L_local, N, D] (still sharded).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # seq-sharded -> head-sharded (split heads, concat sequence)
    a2a = partial(
        jax.lax.all_to_all, axis_name=axis_name, split_axis=2, concat_axis=1,
        tiled=True,
    )
    qg, kg, vg = a2a(q), a2a(k), a2a(v)
    o = _local_attention(qg, kg, vg, scale, mask)
    # head-sharded -> seq-sharded
    return jax.lax.all_to_all(
        o, axis_name=axis_name, split_axis=1, concat_axis=2, tiled=True
    )


def make_sp_attention(mesh: Mesh, axis: str = "sp"):
    """Build a jittable full-sequence attention fn with Ulysses SP over `axis`.

    Returned fn takes q/k/v shaped [B, L, N, D] (global view; L divisible by
    the axis size, N divisible too) and computes exact full attention while
    only ever materialising L/sp tokens of activations per device.
    """
    spec = P(None, axis, None, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    def sp_attn(q, k, v):
        return ulysses_attention(q, k, v, axis_name=axis)

    return sp_attn


def shard_sequence(x: jnp.ndarray, mesh: Mesh, axis: str = "sp", dim: int = 1):
    """Place x with its `dim` axis sharded over the mesh `axis` (the
    xdit_context_parallel.py:130-133 per-rank chunking, declaratively)."""
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
