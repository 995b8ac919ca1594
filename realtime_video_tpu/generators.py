"""Upstream-Wan2.1-style generator facades (compat tier).

Mirrors the reference wan/text2video.py (WanT2V.generate, :110-266) and
wan/image2video.py (WanI2V.generate) — the 50-step CFG teacher generators kept
for compatibility; the realtime product path is the causal pipeline. Sequence
parallelism for these full-clip teachers maps to the tp mesh shardings
(parallel/sharding.py) instead of xDiT USP.
"""
from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.config import (
    SAMPLE_NEG_PROMPT,
    VAE_STRIDE,
    WanModelConfig,
    load_server_config,
)
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.pipelines.bidirectional_diffusion_inference import (
    BidirectionalDiffusionInferencePipeline,
)

log = logging.getLogger(__name__)


class WanT2V:
    """Text-to-video 50-step CFG generator (wan/text2video.py:110-266)."""

    def __init__(
        self,
        generator: WanDiffusion,
        text_encoder,
        vae,
        sample_solver: str = "unipc",
        sampling_steps: int = 50,
        guidance_scale: float = 5.0,
        shift: float = 5.0,
    ):
        config = load_server_config(
            sample_solver=sample_solver, sampling_steps=sampling_steps,
            guidance_scale=guidance_scale, timestep_shift=shift,
        )
        self.pipeline = BidirectionalDiffusionInferencePipeline(
            config, generator, text_encoder, vae
        )
        self.vae = vae

    def generate(
        self,
        input_prompt: str,
        size: Tuple[int, int] = (832, 480),
        frame_num: int = 81,
        n_prompt: str = "",
        seed: int = -1,
        offload_model: bool = False,  # API parity; HBM managed by XLA
    ) -> np.ndarray:
        """Returns [T, 3, H, W] pixels in [-1, 1] (text2video.py:110-266)."""
        del offload_model
        w, h = size
        lat_h, lat_w = h // VAE_STRIDE[1], w // VAE_STRIDE[2]
        lat_f = (frame_num - 1) // VAE_STRIDE[0] + 1
        if seed < 0:
            seed = 0
        noise = jax.random.normal(
            jax.random.PRNGKey(seed), (1, lat_f, 16, lat_h, lat_w), jnp.float32
        ).astype(jnp.bfloat16)
        neg = n_prompt if n_prompt else SAMPLE_NEG_PROMPT
        neg_embeds = None
        if self.pipeline.text_encoder is not None:
            neg_embeds = self.pipeline.text_encoder([neg])["prompt_embeds"]
        video, latents = self.pipeline.inference(
            noise, text_prompts=[input_prompt], neg_prompt_embeds=neg_embeds,
            return_latents=True,
        )
        if video is None:
            return np.asarray(latents)
        # pipeline returns [0,1]; Wan generators return [-1,1]
        return np.asarray(video[0] * 2.0 - 1.0)


class WanI2V:
    """Image-to-video generator (wan/image2video.py): CLIP features condition
    the i2v cross attention; the first frame anchors the latent sequence."""

    def __init__(
        self,
        generator: WanDiffusion,
        text_encoder,
        vae,
        clip_encoder=None,
        sampling_steps: int = 50,
        guidance_scale: float = 5.0,
        shift: float = 5.0,
    ):
        assert generator.cfg.model_type == "i2v", "WanI2V needs an i2v model"
        config = load_server_config(
            sampling_steps=sampling_steps, guidance_scale=guidance_scale,
            timestep_shift=shift,
        )
        self.generator = generator
        self.text_encoder = text_encoder
        self.vae = vae
        self.clip_encoder = clip_encoder
        self.config = config

    def generate(
        self,
        input_prompt: str,
        img: np.ndarray,  # [3, H, W] in [-1, 1]
        frame_num: int = 81,
        n_prompt: str = "",
        seed: int = -1,
    ) -> np.ndarray:
        raise NotImplementedError(
            "i2v generation requires the i2v-14B checkpoint plumbing "
            "(clip_fea + y-concat conditioning); the model-side support "
            "(WanI2VCrossAttention params, img_emb MLP, CLIP tower) is in "
            "place — wiring lands with the i2v checkpoint loader."
        )
