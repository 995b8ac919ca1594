"""Training model scaffold (reference: model/base.py BaseModel /
SelfForcingModel).

Holds generator (causal) + frozen real_score + trainable fake_score + text
encoder + VAE, the block-consistent timestep sampler, and `_run_generator`:
a random-length autoregressive rollout whose randomness is synchronised
across data-parallel workers by a SHARED host RNG seed (replacing
dist.broadcast, base.py:139-141). Rollouts longer than max_rollout_frames are
re-anchored by decoding the last frame to pixels and re-encoding it as an
image latent (base.py:156-167) and gradient-truncated to the final window.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.pipelines.self_forcing_training import (
    SelfForcingTrainingPipeline,
)
from realtime_video_tpu.training.losses import sample_block_timesteps

Params = Dict[str, Any]


class SelfForcingModel:
    def __init__(
        self,
        generator: WanDiffusion,
        real_score: WanDiffusion,
        fake_score: WanDiffusion,
        config,
        text_encoder=None,
        vae=None,
    ):
        self.generator = generator
        self.real_score = real_score
        self.fake_score = fake_score
        self.text_encoder = text_encoder
        self.vae = vae
        self.config = config
        self.num_frame_per_block = config.get("num_frame_per_block", 3)
        self.num_training_frames = int(config.get("num_training_frames", 21))
        self.max_rollout_frames = 21  # gradient window (base.py:137)
        self.same_step_across_blocks = config.get("same_step_across_blocks", True)
        self.pipeline = SelfForcingTrainingPipeline(
            config.get("denoising_step_list", [1000, 750, 500, 250]),
            generator.schedule,
            generator,
            num_frame_per_block=self.num_frame_per_block,
            same_step_across_blocks=self.same_step_across_blocks,
            last_step_only=config.get("last_step_only", False),
            context_noise=config.get("context_noise", 0),
        )

    # -- timestep sampling (base.py:48-95) --------------------------------

    def _get_timestep(
        self, rng: jax.Array, batch: int, num_frames: int, min_t: int = 0
    ) -> jnp.ndarray:
        return sample_block_timesteps(
            rng, batch, num_frames, self.num_frame_per_block, min_t=min_t
        )

    # -- rollout (base.py:103-180) ----------------------------------------

    def rollout_num_blocks(self, step_seed: int) -> int:
        """Random rollout length in blocks, identical on every dp worker
        (shared seed replaces dist.broadcast)."""
        max_blocks = self.num_training_frames // self.num_frame_per_block
        host = np.random.RandomState(step_seed)
        return int(host.randint(1, max_blocks + 1))

    def _run_generator(
        self,
        gen_params: Params,
        noise: jnp.ndarray,  # [B, F_total, C, h, w]
        crossattn_cache: Dict[str, jnp.ndarray],
        rng: jax.Array,
        step_seed: int = 0,
        initial_latent: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (pred [B, F_roll, C, h, w], exit_flags). F_roll is the
        host-chosen random length (static per step, bounded retrace set)."""
        nb = self.rollout_num_blocks(step_seed)
        f_roll = nb * self.num_frame_per_block
        sliced = noise[:, :f_roll]
        pred, flags = self.pipeline.inference_with_trajectory(
            gen_params, sliced, crossattn_cache, rng
        )
        if pred.shape[1] > self.max_rollout_frames and self.vae is not None:
            # re-anchor: decode the last frame, re-encode as an image latent,
            # keep gradient only on the last window (base.py:156-167)
            tail = pred[:, -(self.max_rollout_frames - 1) :]
            last_pixels = self.vae.decode_to_pixel(
                jax.lax.stop_gradient(pred[:, -1:])
            )
            anchor = self.vae.encode_to_latent(last_pixels)[:, :1]
            pred = jnp.concatenate(
                [jax.lax.stop_gradient(anchor.astype(pred.dtype)), tail], axis=1
            )
        return pred, flags
