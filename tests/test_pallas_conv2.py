"""Element-window Pallas conv (ops/pallas_conv2.py) vs lax.conv equality,
interpret mode. Covers the bf16 and int8(int32-accumulate) tiers at
decoder-like channel ratios and the tile-size picker's fallback."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.ops import pallas_conv2


def _ref(x, w, preferred=None):
    kwargs = {} if preferred is None else {"preferred_element_type": preferred}
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kwargs,
    )


@pytest.mark.parametrize("N,H,W,C,Co", [(2, 8, 16, 24, 16), (1, 12, 8, 8, 40)])
def test_conv3x3_f32_matches_lax(N, H, W, C, Co):
    x = jax.random.normal(jax.random.PRNGKey(0), (N, H + 2, W + 2, C),
                          jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, Co), jnp.float32)
    y = pallas_conv2.conv3x3(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(x, w)),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_bf16_emits_bf16():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 12, 16), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 16, 8), jnp.bfloat16)
    y = pallas_conv2.conv3x3(x, w, interpret=True)
    assert y.dtype == jnp.bfloat16
    ref = _ref(x.astype(jnp.float32), w.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_conv3x3_int8_int32_accumulate_exact():
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.randint(k1, (2, 10, 12, 24), -127, 128).astype(jnp.int8)
    w = jax.random.randint(k2, (3, 3, 24, 16), -127, 128).astype(jnp.int8)
    y = pallas_conv2.conv3x3(x, w, preferred=jnp.int32, interpret=True)
    assert y.dtype == jnp.int32
    ref = _ref(x.astype(jnp.int32), w.astype(jnp.int32), preferred=jnp.int32)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_conv3x3_prime_height_falls_back():
    # H=7 has no tile divisor in the picker's menu -> caller must fall back
    x = jnp.zeros((1, 9, 10, 8), jnp.float32)
    w = jnp.zeros((3, 3, 8, 8), jnp.float32)
    assert pallas_conv2.conv3x3(x, w, interpret=True) is None


def test_spatial_conv_pallas_variant_falls_back_off_tpu(monkeypatch):
    """RTV_VAE_CONV=pallas must route to the conv engine on non-TPU backends
    (the kernel only compiles on TPU); production math is unchanged."""
    from realtime_video_tpu.models import vae as vae_mod

    monkeypatch.setattr(vae_mod, "_CONV_VARIANT", "pallas")
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 10, 12, 8), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(6), (3, 3, 8, 8), jnp.float32)
    got = vae_mod._spatial_conv(x, w)
    want = _ref(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
