"""Distribution Matching Distillation (DMD) and relatives.

Mirrors the reference training losses:
  * model/base.py — generator (causal) + frozen real_score + trainable
    fake_score (both bidirectional), block-consistent timestep sampling;
  * model/dmd.py — KL-gradient = fake - real score (with CFG on real),
    normalised by ||x0 - real||, applied via the MSE-to-(x0 - grad) trick
    (:117-195); critic trains the fake score with the flow denoising loss
    (:238-333);
  * model/ode_regression.py — regression onto precomputed ODE trajectories.

All losses are pure functions of the trainable params (jit/grad-able).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.pipelines.self_forcing_training import (
    SelfForcingTrainingPipeline,
)
from realtime_video_tpu.training.losses import sample_block_timesteps

Params = Dict[str, Any]


def _full_mask(f: int, fsl: int) -> jnp.ndarray:
    return jnp.ones((f * fsl, f * fsl), bool)


def _score_x0(
    score: WanDiffusion, params: Params, noisy: jnp.ndarray, t: jnp.ndarray,
    cross: Dict[str, jnp.ndarray], fsl: int,
) -> jnp.ndarray:
    mask = _full_mask(noisy.shape[1], fsl)
    _, x0, _ = score.forward(params, noisy, cross, t, mode="train", attn_mask=mask)
    return x0


class DMD:
    """Holds the three networks + hyperparameters; exposes generator_loss and
    critic_loss as pure functions of the trainable params."""

    def __init__(
        self,
        generator: WanDiffusion,
        real_score: WanDiffusion,
        fake_score: WanDiffusion,
        config,
    ):
        self.generator = generator
        self.real_score = real_score
        self.fake_score = fake_score
        self.guidance_scale = float(config.get("guidance_scale", 3.0))
        self.min_step = int(0.02 * 1000)
        self.max_step = int(0.98 * 1000)
        self.num_frame_per_block = config.get("num_frame_per_block", 3)
        self.pipeline = SelfForcingTrainingPipeline(
            config.get("denoising_step_list", [1000, 750, 500, 250]),
            generator.schedule,
            generator,
            num_frame_per_block=self.num_frame_per_block,
            same_step_across_blocks=config.get("same_step_across_blocks", True),
            last_step_only=config.get("last_step_only", False),
            context_noise=config.get("context_noise", 0),
        )

    # -- distribution matching loss (dmd.py:129-195) -------------------------

    def distribution_matching_loss(
        self,
        x0_gen: jnp.ndarray,  # generator output [B,F,C,h,w] (grad flows here)
        cross_cond: Dict[str, jnp.ndarray],
        cross_uncond: Dict[str, jnp.ndarray],
        fake_params: Params,
        rng: jax.Array,
    ) -> jnp.ndarray:
        b, f, c, h, w = x0_gen.shape
        fsl = self.generator.cfg.frame_seq_length(h, w)
        r_t, r_n = jax.random.split(rng)
        t = sample_block_timesteps(
            r_t, b, f, self.num_frame_per_block, min_t=self.min_step
        )
        t = jnp.clip(t, self.min_step, self.max_step)
        noise = jax.random.normal(r_n, x0_gen.shape, jnp.float32).astype(x0_gen.dtype)
        sched = self.generator.schedule
        noisy = sched.add_noise(jax.lax.stop_gradient(x0_gen), noise, t)

        pred_fake = _score_x0(self.fake_score, fake_params, noisy, t, cross_cond, fsl)
        pred_real_cond = _score_x0(
            self.real_score, self.real_score.params, noisy, t, cross_cond, fsl
        )
        pred_real_uncond = _score_x0(
            self.real_score, self.real_score.params, noisy, t, cross_uncond, fsl
        )
        pred_real = pred_real_cond + self.guidance_scale * (
            pred_real_cond - pred_real_uncond
        )
        grad = (pred_fake - pred_real).astype(jnp.float32)
        # per-sample normaliser (dmd.py:117-121)
        normalizer = jnp.mean(
            jnp.abs(x0_gen.astype(jnp.float32) - pred_real.astype(jnp.float32)),
            axis=(1, 2, 3, 4), keepdims=True,
        )
        grad = grad / jnp.maximum(normalizer, 1e-6)
        grad = jnp.nan_to_num(grad)
        # MSE trick: d/dx 0.5||x - sg(x - grad)||^2 = grad (dmd.py:189-195)
        target = jax.lax.stop_gradient(x0_gen.astype(jnp.float32) - grad)
        return 0.5 * jnp.mean((x0_gen.astype(jnp.float32) - target) ** 2)

    # -- generator loss (dmd.py:197-236) --------------------------------------

    def generator_loss(
        self,
        gen_params: Params,
        fake_params: Params,
        noise: jnp.ndarray,
        cross_cond: Dict[str, jnp.ndarray],
        cross_uncond: Dict[str, jnp.ndarray],
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        r_roll, r_dmd = jax.random.split(rng)
        x0_gen, _flags = self.pipeline.inference_with_trajectory(
            gen_params, noise, cross_cond, r_roll
        )
        loss = self.distribution_matching_loss(
            x0_gen, cross_cond, cross_uncond, fake_params, r_dmd
        )
        return loss, {"dmd_loss": loss}

    # -- critic loss (dmd.py:238-333) ------------------------------------------

    def critic_loss(
        self,
        fake_params: Params,
        gen_params: Params,
        noise: jnp.ndarray,
        cross_cond: Dict[str, jnp.ndarray],
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        r_roll, r_t, r_n = jax.random.split(rng, 3)
        x0_gen, _ = self.pipeline.inference_with_trajectory(
            gen_params, noise, cross_cond, r_roll
        )
        x0_gen = jax.lax.stop_gradient(x0_gen)
        b, f, c, h, w = x0_gen.shape
        fsl = self.generator.cfg.frame_seq_length(h, w)
        t = sample_block_timesteps(r_t, b, f, self.num_frame_per_block)
        nz = jax.random.normal(r_n, x0_gen.shape, jnp.float32).astype(x0_gen.dtype)
        sched = self.fake_score.schedule
        noisy = sched.add_noise(x0_gen, nz, t)
        mask = _full_mask(f, fsl)
        flow_pred, _, _ = self.fake_score.forward(
            fake_params, noisy, cross_cond, t, mode="train", attn_mask=mask
        )
        target = sched.training_target(x0_gen, nz, t)
        weights = sched.training_weight(t)
        w_ = weights.reshape(weights.shape + (1,) * (flow_pred.ndim - weights.ndim))
        loss = jnp.mean(
            w_ * (flow_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        )
        return loss, {"critic_loss": loss}


class SiD(DMD):
    """Score identity Distillation (model/sid.py): loss =
    (real - fake) * ((real - x0) - alpha * (real - fake)) / normalizer."""

    def __init__(self, generator, real_score, fake_score, config):
        super().__init__(generator, real_score, fake_score, config)
        self.sid_alpha = float(config.get("sid_alpha", 1.0))

    def distribution_matching_loss(
        self, x0_gen, cross_cond, cross_uncond, fake_params, rng
    ) -> jnp.ndarray:
        b, f, c, h, w = x0_gen.shape
        fsl = self.generator.cfg.frame_seq_length(h, w)
        r_t, r_n = jax.random.split(rng)
        t = sample_block_timesteps(
            r_t, b, f, self.num_frame_per_block, min_t=self.min_step
        )
        t = jnp.clip(t, self.min_step, self.max_step)
        noise = jax.random.normal(r_n, x0_gen.shape, jnp.float32).astype(x0_gen.dtype)
        sched = self.generator.schedule
        noisy = sched.add_noise(jax.lax.stop_gradient(x0_gen), noise, t)

        pred_fake = _score_x0(self.fake_score, fake_params, noisy, t, cross_cond, fsl)
        pred_real_cond = _score_x0(
            self.real_score, self.real_score.params, noisy, t, cross_cond, fsl
        )
        pred_real_uncond = _score_x0(
            self.real_score, self.real_score.params, noisy, t, cross_uncond, fsl
        )
        pred_real = pred_real_cond + self.guidance_scale * (
            pred_real_cond - pred_real_uncond
        )
        pr = pred_real.astype(jnp.float32)
        pf = pred_fake.astype(jnp.float32)
        x0 = x0_gen.astype(jnp.float32)
        sid = (pr - pf) * ((pr - x0) - self.sid_alpha * (pr - pf))
        normalizer = jax.lax.stop_gradient(
            jnp.mean(jnp.abs(x0 - pr), axis=(1, 2, 3, 4), keepdims=True)
        )
        sid = jnp.nan_to_num(sid / jnp.maximum(normalizer, 1e-6))
        return jnp.mean(sid)


class CausVid(DMD):
    """CausVid (model/causvid.py): DMD variant whose generator inputs are
    forward-simulated (noise added to CLEAN data) instead of autoregressive
    rollout — one blockwise-causal masked forward predicts x0."""

    def run_generator(
        self,
        gen_params: Params,
        clean_latent: jnp.ndarray,  # [B,F,C,h,w] data
        cross_cond: Dict[str, jnp.ndarray],
        rng: jax.Array,
    ) -> jnp.ndarray:
        from realtime_video_tpu.ops import attention as attn_ops

        b, f, c, h, w = clean_latent.shape
        fsl = self.generator.cfg.frame_seq_length(h, w)
        r_t, r_n = jax.random.split(rng)
        steps = jnp.asarray(self.pipeline.denoising_step_list, jnp.float32)
        idx = jax.random.randint(r_t, (b, f // self.num_frame_per_block), 0, len(steps))
        t = jnp.repeat(steps[idx], self.num_frame_per_block, axis=1)
        noise = jax.random.normal(r_n, clean_latent.shape, jnp.float32).astype(
            clean_latent.dtype
        )
        noisy = self.generator.schedule.add_noise(clean_latent, noise, t)
        mask = attn_ops.blockwise_causal_mask(f, fsl, self.num_frame_per_block)
        _, x0, _ = self.generator.forward(
            gen_params, noisy, cross_cond, t, mode="train", attn_mask=mask
        )
        return x0

    def generator_loss(
        self, gen_params, fake_params, noise, cross_cond, cross_uncond, rng,
        clean_latent: Optional[jnp.ndarray] = None,
    ):
        assert clean_latent is not None, "CausVid needs clean data latents"
        r_gen, r_dmd = jax.random.split(rng)
        x0_gen = self.run_generator(gen_params, clean_latent, cross_cond, r_gen)
        loss = self.distribution_matching_loss(
            x0_gen, cross_cond, cross_uncond, fake_params, r_dmd
        )
        return loss, {"dmd_loss": loss}


def ode_regression_loss(
    generator: WanDiffusion,
    params: Params,
    noisy_input: jnp.ndarray,  # [B,F,C,h,w] trajectory point at sampled step
    target_x0: jnp.ndarray,  # [B,F,C,h,w] final ODE point
    timestep: jnp.ndarray,  # [B,F]
    crossattn_cache: Dict[str, jnp.ndarray],
    num_frame_per_block: int = 3,
) -> jnp.ndarray:
    """Regression onto precomputed ODE pairs (model/ode_regression.py:56-138):
    causal generator predicts the trajectory endpoint from an intermediate
    point, trained with MSE on x0."""
    from realtime_video_tpu.ops import attention as attn_ops

    b, f, c, h, w = noisy_input.shape
    fsl = generator.cfg.frame_seq_length(h, w)
    mask = attn_ops.blockwise_causal_mask(f, fsl, num_frame_per_block)
    _, x0, _ = generator.forward(
        params, noisy_input, crossattn_cache, timestep, mode="train", attn_mask=mask
    )
    return jnp.mean((x0.astype(jnp.float32) - target_x0.astype(jnp.float32)) ** 2)
