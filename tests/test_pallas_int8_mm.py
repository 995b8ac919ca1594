"""Fused int8 linear kernel (ops/pallas_int8_mm.py) vs the XLA int8 path,
interpret mode: bit-identical quantised values (same static per-tensor
scale applied per tile), exact s32 accumulation, dequant+bias epilogue."""
import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.ops import pallas_int8_mm


def _xla_int8(x, w_q, w_scale, a_scale, bias):
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
                  ).astype(jnp.int8)
    yq = jnp.dot(xq, w_q, preferred_element_type=jnp.int32)
    y = yq.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def _mk(M, K, N, seed=0):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = (jax.random.normal(k1, (M, K), jnp.float32) * 0.3).astype(jnp.bfloat16)
    w_q = jax.random.randint(k2, (K, N), -127, 128).astype(jnp.int8)
    w_scale = jax.random.uniform(k3, (N,), jnp.float32, 1e-4, 3e-4)
    bias = jax.random.normal(k4, (N,), jnp.float32) * 0.01
    a_scale = jnp.float32(1.1 / 127.0)
    return x, w_q, w_scale, a_scale, bias


def test_int8_linear_matches_xla_path_single_k_block():
    x, w_q, w_scale, a_scale, bias = _mk(64, 128, 256)
    got = pallas_int8_mm.int8_linear(x, w_q, w_scale, a_scale, bias=bias,
                                     interpret=True)
    want = _xla_int8(x, w_q, w_scale, a_scale, bias)
    # identical quantised integers + exact s32 accumulate -> epilogue-only
    # float differences
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_int8_linear_multi_k_block_accumulates():
    # K > 2048 forces the k-grid accumulation path
    x, w_q, w_scale, a_scale, bias = _mk(16, 2560, 128, seed=1)
    got = pallas_int8_mm.int8_linear(x, w_q, w_scale, a_scale, bias=bias,
                                     interpret=True)
    want = _xla_int8(x, w_q, w_scale, a_scale, bias)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_int8_linear_leading_batch_dim_and_no_bias():
    x, w_q, w_scale, a_scale, _ = _mk(32, 128, 128, seed=2)
    got = pallas_int8_mm.int8_linear(x[None], w_q, w_scale, a_scale,
                                     interpret=True)
    assert got.shape == (1, 32, 128)
    want = _xla_int8(x, w_q, w_scale, a_scale, None)
    np.testing.assert_allclose(np.asarray(got[0], np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_int8_linear_untileable_returns_none():
    x = jnp.zeros((7, 100), jnp.bfloat16)  # K not a multiple of 128
    w_q = jnp.zeros((100, 128), jnp.int8)
    assert pallas_int8_mm.int8_linear(
        x, w_q, jnp.ones((128,), jnp.float32), jnp.float32(0.01),
        interpret=True) is None
