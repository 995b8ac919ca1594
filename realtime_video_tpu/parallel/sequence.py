"""Sequence parallelism (Ulysses, ring, and the USP hybrid) for the
bidirectional teacher path.

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


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    axis_size: int,
    scale: Optional[float] = None,
):
    """Exact full attention over a sequence-sharded batch via a KV ring.

    q/k/v: [B, L_local, N, D] with L sharded over `axis_name` (inside
    `shard_map`). Unlike Ulysses, heads need NOT be divisible by the axis —
    each device keeps ALL heads and rotates KV chunks around the ring with
    `ppermute` (the ring half of the reference's xFuserLongContextAttention
    hybrid, xdit_context_parallel.py:179-184), combining partial softmaxes
    flash-style (running max / rescaled accumulator).

    axis_size is static (mesh.shape[axis]); the ring unrolls to axis_size
    steps so XLA can overlap the ppermute of chunk i+1 with the matmul of
    chunk i over ICI.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, lq, n, d = q.shape
    # matmuls stay in the input dtype (bf16 MXU rate) with f32 accumulation —
    # the flash-kernel pattern; softmax statistics stay f32. Scale folds into
    # q (as ops/pallas_attention._prescale does).
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    m = jnp.full((b, n, lq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, n, lq, 1), jnp.float32)
    acc = jnp.zeros((b, n, lq, d), jnp.float32)
    k_cur, v_cur = k, v
    for step in range(axis_size):
        # [B, N, Lq, Lk_local], f32 accumulation
        s = jnp.einsum("blnd,bknd->bnlk", qs, k_cur,
                       preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bnlk,bknd->bnld", p.astype(v_cur.dtype), v_cur,
            preferred_element_type=jnp.float32,
        )
        m = m_new
        if step != axis_size - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
    out = acc / jnp.maximum(l, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # [B, Lq, N, D]


def usp_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    ulysses_axis: str,
    ring_axis: str,
    ring_size: int,
    scale: Optional[float] = None,
):
    """Hybrid USP attention (Ulysses all-to-all x ring), inside `shard_map`.

    The sequence axis is sharded over BOTH mesh axes. The Ulysses all-to-all
    gathers sequence within the ulysses group while splitting heads (heads
    need only be divisible by the ulysses degree, not the full sp size —
    exactly the constraint xFuserLongContextAttention relaxes); the residual
    sequence sharding over the ring group is handled by ring_attention.
    """
    a2a = partial(
        jax.lax.all_to_all, axis_name=ulysses_axis, split_axis=2,
        concat_axis=1, tiled=True,
    )
    qg, kg, vg = a2a(q), a2a(k), a2a(v)
    o = ring_attention(qg, kg, vg, ring_axis, ring_size, scale)
    return jax.lax.all_to_all(
        o, axis_name=ulysses_axis, split_axis=1, concat_axis=2, tiled=True
    )


def make_usp_attention(
    mesh: Mesh, ulysses_axis: str = "sp_u", ring_axis: str = "sp_r"
):
    """Build a jittable full-sequence attention fn with hybrid USP over the
    (ring, ulysses) mesh axes — the TPU answer to xFuserLongContextAttention.

    Returned fn takes q/k/v [B, L, N, D] (global view; L divisible by
    ring*ulysses, N divisible by the ulysses degree only) and computes exact
    full attention holding L/(ring*ulysses) tokens per device.
    """
    ring_size = mesh.shape[ring_axis]
    spec = P(None, (ring_axis, ulysses_axis), None, None)

    @partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )
    def sp_attn(q, k, v):
        return usp_attention(q, k, v, ulysses_axis, ring_axis, ring_size)

    return sp_attn


def make_ring_attention(mesh: Mesh, axis: str = "sp"):
    """Pure-ring variant: no head-divisibility constraint at all."""
    ring_size = mesh.shape[axis]
    spec = P(None, axis, None, None)

    @partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )
    def sp_attn(q, k, v):
        return ring_attention(q, k, v, axis, ring_size)

    return sp_attn


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
