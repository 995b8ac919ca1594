"""Few-step distilled bidirectional sampler: denoise -> re-noise chain over
the full clip (reference pipeline/bidirectional_inference.py:52-71).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion


class BidirectionalInferencePipeline:
    def __init__(self, config, generator: WanDiffusion, text_encoder=None, vae=None):
        self.generator = generator
        self.text_encoder = text_encoder
        self.vae = vae
        self.denoising_step_list: Tuple[float, ...] = tuple(
            float(s) for s in config.denoising_step_list
        )

    def inference(
        self,
        noise: jnp.ndarray,  # [B, F, C, h, w]
        text_prompts: Optional[List[str]] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        return_latents: bool = False,
        seed: int = 0,
    ):
        b, f, c, h, w = noise.shape
        fsl = self.generator.cfg.frame_seq_length(h, w)
        if prompt_embeds is None:
            prompt_embeds = self.text_encoder(text_prompts)["prompt_embeds"]
        cross = self.generator.compute_crossattn_cache(
            self.generator.params, prompt_embeds.astype(jnp.bfloat16)
        )
        full_mask = jnp.ones((f * fsl, f * fsl), bool)
        gen = self.generator
        schedule = gen.schedule
        steps = self.denoising_step_list

        def run(params, cross, noisy, rng):
            x0 = noisy
            for i, t_val in enumerate(steps):
                t = jnp.full((b, f), t_val, jnp.float32)
                _, x0, _ = gen.forward(
                    params, noisy, cross, t, mode="train", attn_mask=full_mask
                )
                if i < len(steps) - 1:
                    rng, sub = jax.random.split(rng)
                    nz = jax.random.normal(sub, x0.shape, jnp.float32).astype(x0.dtype)
                    noisy = schedule.add_noise(
                        x0, nz, jnp.full((b, f), steps[i + 1], jnp.float32)
                    )
            return x0

        latent = jax.jit(run)(gen.params, cross, noise, jax.random.PRNGKey(seed))
        video = None
        if self.vae is not None:
            video = self.vae.decode_to_pixel(latent)
            video = jnp.clip(video * 0.5 + 0.5, 0.0, 1.0)
        if return_latents:
            return video, latent
        return video
