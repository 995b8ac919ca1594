"""End-to-end CausalInferencePipeline on tiny random-weight models (CPU).

Mirrors the reference pipeline semantics: block loop, re-noise between steps,
context cache refresh, prefill from initial latents, final VAE decode
(pipeline/causal_inference.py:48-277).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import (
    VAEConfig,
    WanModelConfig,
    load_server_config,
)
from realtime_video_tpu.models import vae as vae_mod
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.models.vae_wrapper import VAEWrapper
from realtime_video_tpu.pipelines import CausalInferencePipeline

WAN_TINY = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
VAE_TINY = VAEConfig(dim=8, z_dim=16, dim_mult=(1, 1, 2, 2), num_res_blocks=1)
H = W = 4  # latent spatial dims -> 32x32 pixels


@pytest.fixture(scope="module")
def pipeline():
    config = load_server_config(
        denoising_step_list=[1000, 750, 500],
        num_frame_per_block=3,
        context_noise=0,
        warp_denoising_step=False,
    )
    gen = WanDiffusion(cfg=WAN_TINY, dtype=jnp.float32, timestep_shift=5.0)
    vae_params = vae_mod.init_vae_params(jax.random.PRNGKey(7), VAE_TINY)
    vae = VAEWrapper(cfg=VAE_TINY, params=vae_params)
    return CausalInferencePipeline(config, gen, vae=vae)


def _embeds(b=1):
    return jax.random.normal(
        jax.random.PRNGKey(3), (b, 16, WAN_TINY.text_dim), jnp.float32
    )


def test_t2v_end_to_end(pipeline):
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 16, H, W), jnp.float32)
    video, latents = pipeline.inference(
        noise, prompt_embeds=_embeds(), return_latents=True, seed=0
    )
    assert latents.shape == (1, 6, 16, H, W)
    # 6 latent frames -> 1 + 4*5 = 21 pixel frames at 8x spatial
    assert video.shape == (1, 21, 3, 8 * H, 8 * W)
    v = np.asarray(video)
    assert np.isfinite(v).all() and v.min() >= 0.0 and v.max() <= 1.0


def test_extension_with_initial_latent(pipeline):
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, H, W), jnp.float32)
    init = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 16, H, W), jnp.float32)
    video, latents = pipeline.inference(
        noise, prompt_embeds=_embeds(), initial_latent=init,
        return_latents=True, seed=1,
    )
    assert latents.shape == (1, 6, 16, H, W)
    # prefilled latents are passed through unchanged (causal_inference.py:161)
    np.testing.assert_allclose(np.asarray(latents[:, :3]), np.asarray(init))


def test_determinism_same_seed(pipeline):
    noise = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 16, H, W), jnp.float32)
    _, l1 = pipeline.inference(
        noise, prompt_embeds=_embeds(), return_latents=True, seed=42
    )
    _, l2 = pipeline.inference(
        noise, prompt_embeds=_embeds(), return_latents=True, seed=42
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-6)


def test_warp_denoising_step_config():
    """warp_denoising_step maps integer steps through the shifted schedule
    (causal_inference.py:29-32)."""
    config = load_server_config(
        denoising_step_list=[1000, 750, 500, 250],
        warp_denoising_step=True, num_frame_per_block=3,
    )
    gen = WanDiffusion(cfg=WAN_TINY, dtype=jnp.float32)
    pipe = CausalInferencePipeline(config, gen)
    steps = np.asarray(pipe.denoising_step_list)
    ts = np.asarray(gen.schedule.timesteps)
    np.testing.assert_allclose(
        steps, [ts[0], ts[250], ts[500], ts[750]], rtol=1e-5
    )


def test_pipeline_profile_smoke(pipeline, capsys):
    noise = jax.random.normal(jax.random.PRNGKey(8), (1, 3, 16, H, W), jnp.float32)
    pipeline.inference(noise, prompt_embeds=_embeds(), profile=True, seed=0)
    out = capsys.readouterr().out
    assert "Profiling results" in out and "VAE decoding time" in out
