"""CFG / many-step / bidirectional pipelines on tiny models (CPU).

Mirrors pipeline/causal_diffusion_inference.py, bidirectional_*.py semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import WanModelConfig, load_server_config
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.pipelines import (
    BidirectionalDiffusionInferencePipeline,
    BidirectionalInferencePipeline,
    CausalDiffusionInferencePipeline,
)

WAN_TINY = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
H = W = 4


@pytest.fixture(scope="module")
def gen():
    return WanDiffusion(cfg=WAN_TINY, dtype=jnp.float32)


def _embeds(key=3, b=1):
    return jax.random.normal(
        jax.random.PRNGKey(key), (b, 16, WAN_TINY.text_dim), jnp.float32
    )


def test_causal_diffusion_cfg(gen):
    config = load_server_config(
        num_frame_per_block=3, guidance_scale=3.0,
        sample_solver="unipc", sampling_steps=4,
    )
    pipe = CausalDiffusionInferencePipeline(config, gen)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 16, H, W), jnp.float32)
    _, latents = pipe.inference(
        noise, prompt_embeds=_embeds(), neg_prompt_embeds=_embeds(9),
        return_latents=True,
    )
    assert latents.shape == (1, 6, 16, H, W)
    assert np.isfinite(np.asarray(latents)).all()


def test_causal_diffusion_dpm_solver(gen):
    config = load_server_config(
        num_frame_per_block=3, guidance_scale=2.0,
        sample_solver="dpm++", sampling_steps=3,
    )
    pipe = CausalDiffusionInferencePipeline(config, gen)
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, H, W), jnp.float32)
    _, latents = pipe.inference(
        noise, prompt_embeds=_embeds(), neg_prompt_embeds=_embeds(9),
        return_latents=True,
    )
    assert latents.shape == (1, 3, 16, H, W)
    assert np.isfinite(np.asarray(latents)).all()


def test_bidirectional_diffusion(gen):
    config = load_server_config(guidance_scale=3.0, sampling_steps=3)
    pipe = BidirectionalDiffusionInferencePipeline(config, gen)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 16, H, W), jnp.float32)
    _, latents = pipe.inference(
        noise, prompt_embeds=_embeds(), neg_prompt_embeds=_embeds(9),
        return_latents=True,
    )
    assert latents.shape == (1, 3, 16, H, W)
    assert np.isfinite(np.asarray(latents)).all()


def test_bidirectional_fewstep(gen):
    config = load_server_config(denoising_step_list=[1000, 500])
    pipe = BidirectionalInferencePipeline(config, gen)
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 16, H, W), jnp.float32)
    _, latents = pipe.inference(noise, prompt_embeds=_embeds(), return_latents=True)
    assert latents.shape == (1, 3, 16, H, W)
    assert np.isfinite(np.asarray(latents)).all()


def test_causal_diffusion_with_initial_latent(gen):
    config = load_server_config(
        num_frame_per_block=3, guidance_scale=2.0, sampling_steps=2,
    )
    pipe = CausalDiffusionInferencePipeline(config, gen)
    noise = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 16, H, W), jnp.float32)
    init = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 16, H, W), jnp.float32)
    _, latents = pipe.inference(
        noise, prompt_embeds=_embeds(), neg_prompt_embeds=_embeds(9),
        initial_latent=init, return_latents=True,
    )
    assert latents.shape == (1, 6, 16, H, W)
    np.testing.assert_allclose(np.asarray(latents[:, :3]), np.asarray(init))


def test_bidirectional_diffusion_usp_matches_single(gen):
    """Teacher sampling under hybrid USP (sp_mesh over 8 devices, heads=2 so
    ulysses=2 x ring=4) == the unsharded pipeline (same solver trajectory)."""
    from jax.sharding import Mesh

    config = load_server_config(guidance_scale=3.0, sampling_steps=2)
    noise = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 16, H, W), jnp.float32)
    ref_pipe = BidirectionalDiffusionInferencePipeline(config, gen)
    _, ref = ref_pipe.inference(
        noise, prompt_embeds=_embeds(), neg_prompt_embeds=_embeds(9),
        return_latents=True,
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    sp_pipe = BidirectionalDiffusionInferencePipeline(config, gen, sp_mesh=mesh)
    _, got = sp_pipe.inference(
        noise, prompt_embeds=_embeds(), neg_prompt_embeds=_embeds(9),
        return_latents=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_bidirectional_diffusion_usp_21_frames(gen):
    """The canonical teacher frame count (21) is NOT divisible by the 8-device
    sp mesh — only the token axis is. The USP path must not require
    frame-divisibility (reshard happens at the shard_map token boundary)."""
    from jax.sharding import Mesh

    config = load_server_config(guidance_scale=3.0, sampling_steps=1)
    # lat 8x8 -> fsl=16 tokens/frame; 21 frames -> 336 tokens (divisible by 8)
    noise = jax.random.normal(jax.random.PRNGKey(8), (1, 21, 16, 8, 8), jnp.float32)
    ref_pipe = BidirectionalDiffusionInferencePipeline(config, gen)
    _, ref = ref_pipe.inference(
        noise, prompt_embeds=_embeds(), neg_prompt_embeds=_embeds(9),
        return_latents=True,
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    sp_pipe = BidirectionalDiffusionInferencePipeline(config, gen, sp_mesh=mesh)
    _, got = sp_pipe.inference(
        noise, prompt_embeds=_embeds(), neg_prompt_embeds=_embeds(9),
        return_latents=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
