"""Training-time autoregressive rollout ("backward simulation").

Mirrors the reference `SelfForcingTrainingPipeline`
(pipeline/self_forcing_training.py): roll the causal generator block by block
with the KV cache, keep gradients only at ONE randomly chosen denoising step
per block (:136-204), refresh the cache with context-noise-corrupted clean
latents after each block (:226-272), truncate gradient history to the last
21 frames (:137).

JAX notes: rank-consistent randomness comes from a shared PRNG key instead of
dist.broadcast (:41-58); conditional gradient flow is
`where(keep, x, stop_gradient(x))`; the whole rollout is jit-able and
differentiable w.r.t. params.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.ops import kv_cache as kvc


class SelfForcingTrainingPipeline:
    def __init__(
        self,
        denoising_step_list,
        scheduler,
        generator: WanDiffusion,
        num_frame_per_block: int = 3,
        independent_first_frame: bool = False,
        same_step_across_blocks: bool = True,
        last_step_only: bool = False,
        context_noise: float = 0.0,
        kv_cache_frames: int = 21,
        max_num_context_frames: int = 21,
    ):
        self.denoising_step_list = tuple(float(t) for t in denoising_step_list)
        self.scheduler = scheduler
        self.generator = generator
        self.num_frame_per_block = num_frame_per_block
        self.independent_first_frame = independent_first_frame
        self.same_step_across_blocks = same_step_across_blocks
        self.last_step_only = last_step_only
        self.context_noise = float(context_noise)
        self.kv_cache_frames = kv_cache_frames
        self.max_num_context_frames = max_num_context_frames

    def sample_exit_flags(
        self, rng: jax.Array, num_blocks: int
    ) -> jnp.ndarray:
        """Random denoise-step index at which each block keeps gradient
        (generate_and_sync_list, self_forcing_training.py:41-58). Shared PRNG
        key replaces dist.broadcast for cross-rank consistency."""
        n = len(self.denoising_step_list)
        if self.last_step_only:
            return jnp.full((num_blocks,), n - 1, jnp.int32)
        flags = jax.random.randint(rng, (num_blocks,), 0, n)
        if self.same_step_across_blocks:
            flags = jnp.full((num_blocks,), flags[0], jnp.int32)
        return flags

    def inference_with_trajectory(
        self,
        params: Dict[str, Any],
        noise: jnp.ndarray,  # [B, F, C, h, w]
        crossattn_cache: Dict[str, jnp.ndarray],
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (pred_image [B,F,C,h,w] with gradient at the chosen steps,
        denoised_timestep_flags [num_blocks] int32)."""
        gen = self.generator
        b, f, c, h, w = noise.shape
        fsl = gen.cfg.frame_seq_length(h, w)
        assert f % self.num_frame_per_block == 0
        num_blocks = f // self.num_frame_per_block
        cache_size = self.kv_cache_frames * fsl
        max_attn = self.max_num_context_frames * fsl

        rng, flag_rng = jax.random.split(rng)
        exit_flags = self.sample_exit_flags(flag_rng, num_blocks)

        kv = kvc.init_kv_cache(
            gen.cfg.num_layers, b, cache_size, gen.cfg.num_heads, gen.cfg.head_dim,
            noise.dtype,
        )
        outputs = []
        steps = self.denoising_step_list
        for blk in range(num_blocks):
            lo = blk * self.num_frame_per_block
            noisy = noise[:, lo : lo + self.num_frame_per_block]
            # the reference breaks out of the denoise loop at the randomly
            # chosen exit step (:155-204); under jit we run all (static) steps
            # and select the chosen step's prediction — same value/gradient,
            # bounded extra compute
            x0_sel = jnp.zeros_like(noisy)
            for i, t_val in enumerate(steps):
                keep = exit_flags[blk] == i
                t = jnp.full((b, self.num_frame_per_block), t_val, jnp.float32)
                _, x0_i, kv = gen.forward(
                    params, noisy, crossattn_cache, t,
                    kv_cache=kv, current_start=lo * fsl,
                    mode="decode", max_attention_size=max_attn,
                    rolling=True,
                )
                x0_sel = jnp.where(keep, x0_i, x0_sel)
                if i < len(steps) - 1:
                    rng, sub = jax.random.split(rng)
                    nz = jax.random.normal(sub, x0_i.shape, jnp.float32).astype(x0_i.dtype)
                    t_next = jnp.full(
                        (b, self.num_frame_per_block), steps[i + 1], jnp.float32
                    )
                    # no backprop through earlier steps (:155-204)
                    noisy = self.scheduler.add_noise(
                        jax.lax.stop_gradient(x0_i), nz, t_next
                    )
            x0 = x0_sel
            outputs.append(x0)

            # cache refresh with context-noise-corrupted clean latents
            # (:226-272); no gradient into the cache
            refresh_in = jax.lax.stop_gradient(x0)
            if self.context_noise > 0:
                rng, sub = jax.random.split(rng)
                nz = jax.random.normal(sub, refresh_in.shape, jnp.float32).astype(
                    refresh_in.dtype
                )
                t_ctx = jnp.full(
                    (b, self.num_frame_per_block), self.context_noise, jnp.float32
                )
                refresh_in = self.scheduler.add_noise(refresh_in, nz, t_ctx)
                t_arr = t_ctx
            else:
                t_arr = jnp.zeros((b, self.num_frame_per_block), jnp.float32)
            _, _, kv = gen.forward(
                params, refresh_in, crossattn_cache, t_arr,
                kv_cache=kv, current_start=lo * fsl,
                mode="decode", max_attention_size=max_attn,
                rolling=True,
            )
        pred = jnp.concatenate(outputs, axis=1)
        return pred, exit_flags
