"""EMA shadow weights (reference: utils/distributed.py:91-125 EMA_FSDP)."""
import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.training.ema import ema_params, ema_update, init_ema


def test_ema_converges_to_params():
    params = {"w": jnp.ones((4, 4), jnp.bfloat16) * 2.0, "b": jnp.zeros((4,))}
    shadow = init_ema(jax.tree_util.tree_map(jnp.zeros_like, params))
    for _ in range(200):
        shadow = ema_update(shadow, params, 0.9)
    np.testing.assert_allclose(np.asarray(shadow["w"]), 2.0, atol=1e-5)
    assert shadow["w"].dtype == jnp.float32  # fp32 shadow like EMA_FSDP


def test_ema_single_step_lerp():
    p = {"w": jnp.full((2,), 10.0)}
    s = init_ema({"w": jnp.zeros((2,))})
    s = ema_update(s, p, 0.75)
    np.testing.assert_allclose(np.asarray(s["w"]), 2.5)
    out = ema_params(s, {"w": jnp.zeros((2,), jnp.bfloat16)})
    assert out["w"].dtype == jnp.bfloat16
