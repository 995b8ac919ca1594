"""3D rotary position embeddings for the Wan DiT.

Mirrors the reference tables and application:
  * rope_params (wan/modules/model.py:28-35): per-axis angle tables with
    theta=10000, concatenated over [t | h | w] with head-dim split
    [d - 4*(d//6), 2*(d//6), 2*(d//6)] (causal_model.py:639-645).
  * causal_rope_apply (causal_model.py:143-171): temporal table offset by
    `start_frame` so cached frames keep absolute positions.
  * rope_params_riflex (causal_model.py:26-38): RIFLEx low-frequency patch
    for long-video extrapolation.

Tables are built in float64 on host then stored as float32; rotation math runs
in float32 (reference uses complex float64 — f64 is unavailable on TPU; the
model runs bf16 so fp32 rotation is lossless relative to it).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _angle_table(max_seq_len: int, dim: int, theta: float = 10000.0) -> np.ndarray:
    """Angles [max_seq_len, dim//2] = pos * theta^(-2i/dim)."""
    assert dim % 2 == 0
    inv = 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)
    return np.outer(np.arange(max_seq_len, dtype=np.float64), inv)


def _angle_table_riflex(
    max_seq_len: int, dim: int, theta: float = 10000.0, k: int = 0, L_test: int = None
) -> np.ndarray:
    """RIFLEx variant: pins intrinsic frequency k-1 to period 1/(0.9*L_test)
    (reference causal_model.py:26-38)."""
    inv = 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)
    if k:
        inv[k - 1] = 0.9 * 2 * np.pi / L_test
    return np.outer(np.arange(max_seq_len, dtype=np.float64), inv)


def rope_split(head_dim: int) -> Tuple[int, int, int]:
    """Pair-count split (t, h, w) of head_dim//2 (causal_model.py:147)."""
    c = head_dim // 2
    return c - 2 * (c // 3), c // 3, c // 3


@dataclasses.dataclass(frozen=True)
class RopeTables:
    """Per-axis cos/sin tables; safe to close over in jit."""

    cos_t: jnp.ndarray  # [max_seq, ct]
    sin_t: jnp.ndarray
    cos_h: jnp.ndarray  # [max_seq, ch]
    sin_h: jnp.ndarray
    cos_w: jnp.ndarray  # [max_seq, cw]
    sin_w: jnp.ndarray

    @classmethod
    def create(
        cls,
        head_dim: int,
        max_seq_len: int = 1024,
        theta: float = 10000.0,
        riflex_k: int = 0,
        riflex_L_test: int = None,
    ) -> "RopeTables":
        d = head_dim
        # sub-dims per axis (causal_model.py:639-645): t gets d-4*(d//6),
        # h and w get 2*(d//6) each
        dt, dh, dw = d - 4 * (d // 6), 2 * (d // 6), 2 * (d // 6)
        if riflex_k:
            at = _angle_table_riflex(max_seq_len, dt, theta, riflex_k, riflex_L_test)
        else:
            at = _angle_table(max_seq_len, dt, theta)
        ah = _angle_table(max_seq_len, dh, theta)
        aw = _angle_table(max_seq_len, dw, theta)
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
        return cls(
            cos_t=f32(np.cos(at)), sin_t=f32(np.sin(at)),
            cos_h=f32(np.cos(ah)), sin_h=f32(np.sin(ah)),
            cos_w=f32(np.cos(aw)), sin_w=f32(np.sin(aw)),
        )

    def fused(
        self, f: int, h: int, w: int, start_frame: jnp.ndarray | int = 0
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fused (cos, sin) of shape [f*h*w, head_dim//2] for a (f,h,w) grid.

        `start_frame` may be a traced scalar (dynamic temporal offset,
        causal_model.py:159).
        """
        ct = self.cos_t.shape[1]
        cos_t = jax.lax.dynamic_slice(self.cos_t, (start_frame, 0), (f, ct))
        sin_t = jax.lax.dynamic_slice(self.sin_t, (start_frame, 0), (f, ct))

        def grid(tab_t, tab_h, tab_w):
            gt = jnp.broadcast_to(tab_t[:, None, None, :], (f, h, w, tab_t.shape[-1]))
            gh = jnp.broadcast_to(
                tab_h[None, :h, None, :], (f, h, w, tab_h.shape[-1])
            )
            gw = jnp.broadcast_to(
                tab_w[None, None, :w, :], (f, h, w, tab_w.shape[-1])
            )
            return jnp.concatenate([gt, gh, gw], axis=-1).reshape(f * h * w, -1)

        return grid(cos_t, self.cos_h, self.cos_w), grid(
            sin_t, self.sin_h, self.sin_w
        )


def rope_apply_fused(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """rope_apply with precomputed fused (cos, sin) [L, d//2].

    Hoist tables.fused() OUT of per-layer loops: traced per layer it re-reads
    the small per-axis tables each iteration — measured ~37% of the denoise
    step lost to those latency-bound S(1) prefetches on v5e."""
    b, L, n, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, L, n, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    out = jnp.stack([r0, r1], axis=-1).reshape(b, L, n, d)
    return out.astype(x.dtype)


def rope_apply(
    x: jnp.ndarray,
    grid_fhw: Tuple[int, int, int],
    tables: RopeTables,
    start_frame: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """Rotate q/k of shape [B, L, N, D] where L == f*h*w.

    Pairs are interleaved (x[2i], x[2i+1]) as in torch.view_as_complex
    (causal_model.py:156).
    """
    f, h, w = grid_fhw
    b, L, n, d = x.shape
    assert L == f * h * w, (L, grid_fhw)
    cos, sin = tables.fused(f, h, w, start_frame)  # [L, d//2]
    xf = x.astype(jnp.float32).reshape(b, L, n, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    out = jnp.stack([r0, r1], axis=-1).reshape(b, L, n, d)
    return out.astype(x.dtype)


def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """[*, dim] = [cos(p * 10000^(-i/half)) | sin(...)] (model.py:15-24)."""
    assert dim % 2 == 0
    half = dim // 2
    p = position.astype(jnp.float32).reshape(-1)
    inv = jnp.power(
        10000.0, -jnp.arange(half, dtype=jnp.float32) / half
    )
    sinusoid = p[:, None] * inv[None, :]
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)
