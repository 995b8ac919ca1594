"""i2v conditioning path: image K/V branch + y-concat channels + CLIP tower."""
import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.config import WanModelConfig
from realtime_video_tpu.models import clip as clip_mod
from realtime_video_tpu.models import wan_dit
from realtime_video_tpu.models.rope import RopeTables
from realtime_video_tpu.ops import attention as attn_ops

I2V_TINY = WanModelConfig(
    model_type="i2v", dim=64, ffn_dim=128, num_heads=2, num_layers=2, in_dim=36
)


def test_i2v_forward_with_clip_features():
    params = wan_dit.init_wan_params(jax.random.PRNGKey(0), I2V_TINY, jnp.float32)
    # the reference zero-inits the head -> flow would be identically 0;
    # randomise it so conditioning differences are observable
    params["head"]["head"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(99), params["head"]["head"]["w"].shape) * 0.05
    )
    tables = RopeTables.create(I2V_TINY.head_dim)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 16, I2V_TINY.text_dim), jnp.float32)
    clip_fea = jax.random.normal(jax.random.PRNGKey(2), (1, 257, 1280), jnp.float32)
    cross = wan_dit.compute_crossattn_cache(I2V_TINY, params, ctx, clip_fea=clip_fea)
    assert "k_img" in cross and cross["k_img"].shape == (2, 1, 257, 2, 32)

    # x = latent(16) + y-concat condition(20) = 36 channels (i2v in_dim)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 36, 8, 8), jnp.float32)
    t = jnp.full((1, 3), 500.0, jnp.float32)
    mask = attn_ops.blockwise_causal_mask(3, 16, 3)
    flow, _ = wan_dit.dit_forward(
        I2V_TINY, params, x, t, tables, cross, mode="train", attn_mask=mask
    )
    assert flow.shape == (1, 3, 16, 8, 8)
    assert np.isfinite(np.asarray(flow)).all()

    # image branch must influence the output
    cross2 = dict(cross)
    cross2["k_img"] = jnp.zeros_like(cross["k_img"])
    cross2["v_img"] = jnp.zeros_like(cross["v_img"])
    flow2, _ = wan_dit.dit_forward(
        I2V_TINY, params, x, t, tables, cross2, mode="train", attn_mask=mask
    )
    assert not np.allclose(np.asarray(flow), np.asarray(flow2))


def test_clip_vision_tower_tiny():
    cfg = dict(image_size=28, patch_size=14, dim=64, mlp_ratio=2, num_heads=2,
               num_layers=2, norm_eps=1e-5)
    params = clip_mod.init_vit_params(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28), jnp.float32)
    feats = clip_mod.vit_forward(params, imgs, cfg, use_31_block=True)
    # 4 patches + cls = 5 tokens; one block dropped (use_31_block)
    assert feats.shape == (2, 5, 64)
    assert np.isfinite(np.asarray(feats)).all()
