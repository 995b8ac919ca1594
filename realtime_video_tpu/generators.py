"""Upstream-Wan2.1-style generator facades (compat tier).

Mirrors the reference wan/text2video.py (WanT2V.generate, :110-266) and
wan/image2video.py (WanI2V.generate) — the 50-step CFG teacher generators kept
for compatibility; the realtime product path is the causal pipeline. Sequence
parallelism for these full-clip teachers maps to the tp mesh shardings
(parallel/sharding.py) instead of xDiT USP.
"""
from __future__ import annotations

import logging
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.config import (
    SAMPLE_NEG_PROMPT,
    VAE_STRIDE,
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
        sample_solver: str = "unipc",
    ) -> np.ndarray:
        """i2v sampling (image2video.py:150-300): first-frame mask + encoded
        image latents concatenated as 20 extra channels, CLIP features through
        the image cross-attention branch, CFG over text."""
        import jax
        import jax.numpy as jnp

        from realtime_video_tpu.solvers import (
            FlowDPMSolverMultistep,
            FlowUniPCMultistep,
        )

        h, w = int(img.shape[1]), int(img.shape[2])
        lat_h, lat_w = h // VAE_STRIDE[1], w // VAE_STRIDE[2]
        lat_f = (frame_num - 1) // VAE_STRIDE[0] + 1
        if seed < 0:
            seed = 0
        gen_cfg = self.generator.cfg
        fsl = gen_cfg.frame_seq_length(lat_h, lat_w)

        noise = jax.random.normal(
            jax.random.PRNGKey(seed), (1, lat_f, 16, lat_h, lat_w), jnp.float32
        ).astype(jnp.bfloat16)

        # first-frame mask with 4x temporal grouping (image2video.py:207-214)
        msk = np.zeros((frame_num + 3, lat_h, lat_w), np.float32)
        msk[:4] = 1.0  # first pixel frame repeated 4x
        msk = msk.reshape(lat_f, 4, lat_h, lat_w).transpose(1, 0, 2, 3)  # [4,Tz,h,w]
        msk = jnp.asarray(msk)[None].transpose(0, 2, 1, 3, 4)  # [1,Tz,4,h,w]

        # encoded [img | 80 zero frames] (image2video.py:237-246)
        pixels = np.concatenate(
            [img[None, None], np.zeros((1, frame_num - 1, 3, h, w), np.float32)],
            axis=1,
        )
        y_lat = self.vae.encode_to_latent(jnp.asarray(pixels, jnp.bfloat16))
        y = jnp.concatenate([msk.astype(jnp.bfloat16), y_lat.astype(jnp.bfloat16)], axis=2)

        # CLIP features condition the image cross-attention branch
        clip_fea = None
        if self.clip_encoder is not None:
            clip_fea = self.clip_encoder(
                jnp.asarray(img, jnp.float32)[None, :, None]
            )
        embeds = self.text_encoder([input_prompt])["prompt_embeds"].astype(jnp.bfloat16)
        neg = n_prompt if n_prompt else SAMPLE_NEG_PROMPT
        neg_embeds = self.text_encoder([neg])["prompt_embeds"].astype(jnp.bfloat16)
        from realtime_video_tpu.models import wan_dit

        cross_c = wan_dit.compute_crossattn_cache(
            gen_cfg, self.generator.params, embeds, clip_fea=clip_fea
        )
        cross_u = wan_dit.compute_crossattn_cache(
            gen_cfg, self.generator.params, neg_embeds, clip_fea=clip_fea
        )

        full_mask = jnp.ones((lat_f * fsl, lat_f * fsl), bool)

        def fwd(params, cross, x, t):
            xin = jnp.concatenate([x, y], axis=2)  # 16 + 20 = 36 channels
            flow, _ = wan_dit.dit_forward(
                gen_cfg, params, xin, t, self.generator.rope, cross,
                mode="train", attn_mask=full_mask,
            )
            return flow

        fwd = jax.jit(fwd)
        solver = (
            FlowUniPCMultistep(shift=self.config.get("timestep_shift", 5.0))
            if sample_solver == "unipc"
            else FlowDPMSolverMultistep(shift=self.config.get("timestep_shift", 5.0))
        )
        solver.set_timesteps(int(self.config.get("sampling_steps", 40)))
        scale = float(self.config.get("guidance_scale", 5.0))

        latent = noise
        for t_val in solver.timesteps:
            t = jnp.full((1, lat_f), float(t_val), jnp.float32)
            flow_c = fwd(self.generator.params, cross_c, latent, t)
            flow_u = fwd(self.generator.params, cross_u, latent, t)
            flow = flow_u + scale * (flow_c - flow_u)
            latent = solver.step(flow, float(t_val), latent)

        video = self.vae.decode_to_pixel(latent)
        return np.asarray(video[0])
