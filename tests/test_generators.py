"""WanT2V / WanI2V generator facades on tiny models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import VAEConfig, WanModelConfig
from realtime_video_tpu.generators import WanI2V, WanT2V
from realtime_video_tpu.models import vae as vae_mod
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.models.vae_wrapper import VAEWrapper

VAE_TINY = VAEConfig(dim=8, z_dim=16, dim_mult=(1, 1, 2, 2), num_res_blocks=1)


class FakeTE:
    def __init__(self, dim):
        self.dim = dim

    def __call__(self, prompts):
        key = jax.random.PRNGKey(abs(hash(prompts[0])) % (2**31))
        return {"prompt_embeds": jax.random.normal(key, (1, 16, self.dim), jnp.float32)}


@pytest.fixture(scope="module")
def vae():
    return VAEWrapper(
        cfg=VAE_TINY, params=vae_mod.init_vae_params(jax.random.PRNGKey(7), VAE_TINY)
    )


def test_t2v_generate(vae):
    cfg = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
    gen = WanDiffusion(cfg=cfg, dtype=jnp.float32, is_causal=False)
    t2v = WanT2V(gen, FakeTE(cfg.text_dim), vae, sampling_steps=2)
    video = t2v.generate("a cat", size=(32, 32), frame_num=9, seed=0)
    # 9 pixel frames at 32x32, [-1, 1]
    assert video.shape == (9, 3, 32, 32)
    assert np.isfinite(video).all()


def test_i2v_generate(vae):
    cfg = WanModelConfig(
        model_type="i2v", dim=64, ffn_dim=128, num_heads=2, num_layers=2, in_dim=36
    )
    gen = WanDiffusion(cfg=cfg, dtype=jnp.float32, is_causal=False)
    i2v = WanI2V(gen, FakeTE(cfg.text_dim), vae, sampling_steps=2)
    i2v.config = dict(i2v.config, sampling_steps=2, guidance_scale=2.0)
    img = np.random.default_rng(0).standard_normal((3, 32, 32)).astype(np.float32) * 0.3
    video = i2v.generate("a cat", img, frame_num=9, seed=0)
    assert video.shape == (9, 3, 32, 32)
    assert np.isfinite(video).all()
