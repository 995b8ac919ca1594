"""Offline batch sampling API (reference: sample.py sample_videos) on tiny
models, including mp4/npy persistence fallback."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import VAEConfig, WanModelConfig, load_server_config
from realtime_video_tpu.models import vae as vae_mod
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.models.vae_wrapper import VAEWrapper
from realtime_video_tpu.pipelines import CausalInferencePipeline
from realtime_video_tpu.sample import sample_videos
from realtime_video_tpu.serving.models import Models
from realtime_video_tpu.serving.params import GenerateParams

WAN_TINY = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
VAE_TINY = VAEConfig(dim=8, z_dim=16, dim_mult=(1, 1, 2, 2), num_res_blocks=1)


def test_sample_videos_tiny(tmp_path):
    config = load_server_config(denoising_step_list=[1000, 500], num_frame_per_block=3)
    gen = WanDiffusion(cfg=WAN_TINY, dtype=jnp.bfloat16)
    vae = VAEWrapper(
        cfg=VAE_TINY,
        params=vae_mod.init_vae_params(jax.random.PRNGKey(7), VAE_TINY, jnp.bfloat16),
    )

    class TE:
        def __call__(self, text_prompts):
            key = jax.random.PRNGKey(abs(hash(text_prompts[0])) % (2**31))
            return {"prompt_embeds": jax.random.normal(key, (1, 64, WAN_TINY.text_dim), jnp.bfloat16)}

    te = TE()
    models = Models(te, gen, CausalInferencePipeline(config, gen, te, vae), vae, vae)
    params = GenerateParams(
        prompt="", width=64, height=64, seed=0, num_blocks=2, num_denoising_steps=2
    )
    vids = sample_videos(
        ["a cat", "a dog"], None, str(tmp_path), params, models, save_videos=True
    )
    assert len(vids) == 2
    # 2 blocks -> 6 + 12 = 18 frames each
    assert all(v.shape == (18, 3, 64, 64) for v in vids)
    assert all(np.isfinite(v).all() and v.min() >= 0 and v.max() <= 1 for v in vids)
    written = [f for f in os.listdir(tmp_path) if f.endswith((".mp4", ".npy"))]
    assert len(written) == 2
