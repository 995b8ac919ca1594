"""Pallas flash attention vs the XLA oracle (interpret mode on CPU; the same
kernel runs compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from realtime_video_tpu.ops import attention as attn_ops
from realtime_video_tpu.ops import pallas_attention as pat


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("lo,hi", [(0, 700), (100, 512), (0, 1024)])
def test_decode_window_matches_xla(lo, hi):
    b, lq, lk, n, d = 1, 200, 1024, 2, 128
    q, k, v = _rand((b, lq, n, d), 0), _rand((b, lk, n, d), 1), _rand((b, lk, n, d), 2)
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lk), 1)
    mask = ((kv_pos >= lo) & (kv_pos < hi))[None, None]
    want = attn_ops.xla_attention(q, k, v, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = pat.decode_attention(
            q, k, v, jnp.asarray(lo, jnp.int32), jnp.asarray(hi, jnp.int32)
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_prefill_block_causal_matches_xla():
    b, n, d = 1, 2, 128
    frame_seqlen, nfpb, frames = 64, 3, 6
    L = frames * frame_seqlen
    q, k, v = _rand((b, L, n, d), 3), _rand((b, L, n, d), 4), _rand((b, L, n, d), 5)
    mask = attn_ops.blockwise_causal_mask(frames, frame_seqlen, nfpb)[None, None]
    want = attn_ops.xla_attention(q, k, v, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = pat.prefill_attention(q, k, v, block_tokens=frame_seqlen * nfpb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_prefill_partial_block_local_window_matches_xla():
    """Trailing PARTIAL block + local window (the independent_first_frame /
    non-multiple context shape): the window start must use the UNCLAMPED
    block end so it cannot slide down and admit evicted keys (reference
    get_block_mask semantics, causal_model.py:108-141). For the last partial
    block here ends=576 > L=448 and window start = 448 — only the diagonal
    survives; a kv_len-clamped ends would re-admit keys from 320."""
    b, n, d = 1, 2, 128
    frame_seqlen, nfpb, frames = 64, 3, 7  # 7 % 3 != 0 -> partial last block
    local_frames = 2                       # window (128) < block span (192)
    L = frames * frame_seqlen
    q, k, v = _rand((b, L, n, d), 30), _rand((b, L, n, d), 31), _rand((b, L, n, d), 32)
    mask = attn_ops.blockwise_causal_mask(
        frames, frame_seqlen, nfpb, local_attn_size=local_frames
    )[None, None]
    want = attn_ops.xla_attention(q, k, v, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = pat.prefill_attention(
            q, k, v, block_tokens=frame_seqlen * nfpb,
            local_window=local_frames * frame_seqlen,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_unpadded_1560_token_frames():
    """Real serving shapes are not 128-aligned (fsl=1560) — padding must not
    leak into the softmax."""
    b, n, d = 1, 2, 64
    lq, lk = 312, 936  # 1560-style non-aligned lengths (scaled down)
    q, k, v = _rand((b, lq, n, d), 6), _rand((b, lk, n, d), 7), _rand((b, lk, n, d), 8)
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lk), 1)
    mask = ((kv_pos >= 0) & (kv_pos < 936))[None, None]
    want = attn_ops.xla_attention(q, k, v, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = pat.decode_attention(
            q, k, v, jnp.zeros((), jnp.int32), jnp.asarray(936, jnp.int32)
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("lo,hi", [(0, 700), (100, 512), (0, 1024)])
def test_skew_pipeline_matches_xla(monkeypatch, lo, hi):
    """RTV_ATTN_SKEW variant (V lags K by one grid step, double-buffered score
    scratch) must be numerically identical to the plain window kernel."""
    monkeypatch.setattr(pat, "SKEW", True)
    b, lq, lk, n, d = 1, 200, 1024, 2, 128
    q, k, v = _rand((b, lq, n, d), 0), _rand((b, lk, n, d), 1), _rand((b, lk, n, d), 2)
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lk), 1)
    mask = ((kv_pos >= lo) & (kv_pos < hi))[None, None]
    want = attn_ops.xla_attention(q, k, v, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = pat.decode_attention(
            q, k, v, jnp.asarray(lo, jnp.int32), jnp.asarray(hi, jnp.int32)
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("lo,hi", [(0, 700), (100, 512), (0, 1024)])
def test_staticmax_skew_matches_xla(monkeypatch, lo, hi):
    """RTV_ATTN_SKEW2 variant: static-max softmax + V-lags-K skew (no
    running-max chain at all — tile contributions are independent)."""
    monkeypatch.setattr(pat, "SKEW2", True)
    b, lq, lk, n, d = 1, 200, 1024, 2, 128
    q, k, v = _rand((b, lq, n, d), 0), _rand((b, lk, n, d), 1), _rand((b, lk, n, d), 2)
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lk), 1)
    mask = ((kv_pos >= lo) & (kv_pos < hi))[None, None]
    want = attn_ops.xla_attention(q, k, v, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = pat.decode_attention(
            q, k, v, jnp.asarray(lo, jnp.int32), jnp.asarray(hi, jnp.int32)
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("lo,hi", [(0, 700), (100, 512)])
def test_staticmax_matches_xla(monkeypatch, lo, hi):
    """RTV_ATTN_STATICMAX variant (bounded-logit softmax without a running
    max; the bound cancels exactly in acc/l)."""
    monkeypatch.setattr(pat, "STATIC_MAX", True)
    b, lq, lk, n, d = 1, 200, 1024, 2, 128
    q, k, v = _rand((b, lq, n, d), 0), _rand((b, lk, n, d), 1), _rand((b, lk, n, d), 2)
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lk), 1)
    mask = ((kv_pos >= lo) & (kv_pos < hi))[None, None]
    want = attn_ops.xla_attention(q, k, v, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = pat.decode_attention(
            q, k, v, jnp.asarray(lo, jnp.int32), jnp.asarray(hi, jnp.int32)
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("variant", ["staticmax", "flash", "skew2"])
@pytest.mark.parametrize("lq,lk,lo,hi", [
    (200, 936, 0, 936),     # one partial KV tile
    (200, 2400, 0, 2400),   # ceil grid: 2 tiles over 2400, both sub-tiles tail
    (312, 2400, 100, 2000), # window strictly inside the unpadded buffer
])
def test_nopad_kv_matches_padded(monkeypatch, variant, lq, lk, lo, hi):
    """RTV_ATTN_NOPAD: the ceil-grid KV sweep over an UNPADDED window (tail
    tile select-masked, tail V rows zeroed) must equal the padded path for
    the static-max, running-max, and skew2 kernels."""
    monkeypatch.setattr(pat, "STATIC_MAX", variant == "staticmax")
    monkeypatch.setattr(pat, "SKEW2", variant == "skew2")
    b, n, d = 1, 2, 128
    q, k, v = _rand((b, lq, n, d), 20), _rand((b, lk, n, d), 21), _rand((b, lk, n, d), 22)
    lo_t, hi_t = jnp.asarray(lo, jnp.int32), jnp.asarray(hi, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setattr(pat, "NOPAD", False)
        want = pat.decode_attention(q, k, v, lo_t, hi_t)
        monkeypatch.setattr(pat, "NOPAD", True)
        got = pat.decode_attention(q, k, v, lo_t, hi_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lk), 1)
    mask = ((kv_pos >= lo) & (kv_pos < hi))[None, None]
    oracle = attn_ops.xla_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), rtol=2e-3, atol=2e-3)


def test_int8_qk_tier_close_to_bf16(monkeypatch):
    """SageAttention-analog int8 QK^T (RTV_ATTN_INT8) stays within quantized
    tolerance of the fp path on decode-window shapes."""
    b, lq, lk, n, d = 1, 128, 512, 2, 128
    q, k, v = _rand((b, lq, n, d), 7), _rand((b, lk, n, d), 8), _rand((b, lk, n, d), 9)
    lo, hi = jnp.asarray(0, jnp.int32), jnp.asarray(512, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        want = pat.decode_attention(q, k, v, lo, hi)
        monkeypatch.setattr(pat, "INT8_QK", True)
        got = pat.decode_attention(q, k, v, lo, hi)
    err = np.max(np.abs(np.asarray(got) - np.asarray(want)))
    assert err < 3e-2, err
    # sanity: outputs are not identical (the int8 path actually ran)
    assert err > 1e-6
