"""TAEHV tiny autoencoder: shape laws + chunk-streaming == full-clip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.models import taehv


@pytest.fixture(scope="module")
def params():
    return taehv.init_taehv_params(jax.random.PRNGKey(0))


def test_decode_shapes(params):
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 8, 8)) * 0.2
    px, _ = taehv.taehv_decode(params, z)
    # 2x time upscale twice, 2x space three times
    assert px.shape == (1, 12, 3, 64, 64)
    assert taehv.frames_to_trim() == 3


def test_encode_shapes(params):
    v = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 3, 64, 64))
    z, _ = taehv.taehv_encode(params, v)
    assert z.shape == (1, 2, 16, 8, 8)


def test_streaming_decode_matches_full(params):
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 8, 8)) * 0.2
    full, _ = taehv.taehv_decode(params, z)
    p0, st = taehv.taehv_decode(params, z[:, :2], None)
    p1, st = taehv.taehv_decode(params, z[:, 2:], st)
    seq = jnp.concatenate([p0, p1], axis=1)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(full), rtol=1e-4, atol=1e-4)


def test_streaming_encode_matches_full(params):
    v = jax.random.uniform(jax.random.PRNGKey(4), (1, 8, 3, 32, 32))
    full, _ = taehv.taehv_encode(params, v)
    z0, st = taehv.taehv_encode(params, v[:, :4], None)
    z1, st = taehv.taehv_encode(params, v[:, 4:], st)
    seq = jnp.concatenate([z0, z1], axis=1)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(full), rtol=1e-4, atol=1e-4)
