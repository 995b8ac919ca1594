"""Pallas im2col conv vs the XLA conv3d oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from realtime_video_tpu.models import vae as vae_mod
from realtime_video_tpu.ops.pallas_conv import conv3x3


@pytest.mark.parametrize("kt,T,H,W,C,Co", [
    (3, 5, 8, 16, 8, 16),
    (1, 4, 8, 16, 16, 8),
    (3, 3, 12, 24, 4, 4),
])
def test_conv3x3_matches_xla(kt, T, H, W, C, Co):
    x = jax.random.normal(
        jax.random.PRNGKey(0), (T + (kt - 1), H + 2, W + 2, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (kt, 3, 3, C, Co), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (Co,), jnp.float32)
    want = vae_mod.conv3d({"w": w, "b": b}, x)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3(x, w, b, th=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
