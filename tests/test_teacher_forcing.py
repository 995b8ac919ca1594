"""Teacher-forcing forward: [clean | noisy] concat with repeated RoPE
positions and the two-interval mask (causal_model.py:676-762, 1060-1108)."""
import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.config import WanModelConfig
from realtime_video_tpu.models import wan_dit
from realtime_video_tpu.models.rope import RopeTables
from realtime_video_tpu.ops import attention as attn_ops

CFG = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
F, C, H, W = 6, 16, 8, 8
FSL = 16
NFPB = 3


def test_teacher_forcing_forward():
    params = wan_dit.init_wan_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    params["head"]["head"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(9), params["head"]["head"]["w"].shape) * 0.05
    )
    tables = RopeTables.create(CFG.head_dim)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 16, CFG.text_dim), jnp.float32)
    cross = wan_dit.compute_crossattn_cache(CFG, params, ctx)

    clean = jax.random.normal(jax.random.PRNGKey(2), (1, F, C, H, W), jnp.float32)
    noisy = jax.random.normal(jax.random.PRNGKey(3), (1, F, C, H, W), jnp.float32)
    x = jnp.concatenate([clean, noisy], axis=1)
    aug_t = jnp.zeros((1, F), jnp.float32)
    t = jnp.full((1, F), 700.0, jnp.float32)
    t_cat = jnp.concatenate([aug_t, t], axis=1)

    mask = attn_ops.teacher_forcing_mask(F, FSL, NFPB)
    flow, _ = wan_dit.dit_forward(
        CFG, params, x, t_cat, tables, cross,
        mode="train", attn_mask=mask, tf_concat=True,
    )
    assert flow.shape == (1, F, C, H, W)
    assert np.isfinite(np.asarray(flow)).all()

    # block 0's noisy prediction must not depend on later clean frames
    clean2 = clean.at[:, NFPB:].set(
        jax.random.normal(jax.random.PRNGKey(5), clean[:, NFPB:].shape)
    )
    x2 = jnp.concatenate([clean2, noisy], axis=1)
    flow2, _ = wan_dit.dit_forward(
        CFG, params, x2, t_cat, tables, cross,
        mode="train", attn_mask=mask, tf_concat=True,
    )
    np.testing.assert_allclose(
        np.asarray(flow[:, :NFPB]), np.asarray(flow2[:, :NFPB]), rtol=1e-4, atol=1e-4
    )
    # ...but later blocks DO see the earlier clean frames
    clean3 = clean.at[:, :NFPB].set(
        jax.random.normal(jax.random.PRNGKey(6), clean[:, :NFPB].shape)
    )
    x3 = jnp.concatenate([clean3, noisy], axis=1)
    flow3, _ = wan_dit.dit_forward(
        CFG, params, x3, t_cat, tables, cross,
        mode="train", attn_mask=mask, tf_concat=True,
    )
    assert not np.allclose(np.asarray(flow[:, NFPB:]), np.asarray(flow3[:, NFPB:]))
