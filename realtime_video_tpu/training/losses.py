"""Denoising losses (reference: utils/loss.py:27-81 registry and
model/diffusion.py CausalDiffusion flow-matching pretraining loss).

The server config uses denoising_loss_type: flow
(configs/self_forcing_server_14b.yaml:14): target v = noise - x0.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.ops import attention as attn_ops


def _mse(pred, target, weights=None):
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if weights is not None:
        err = err * weights.reshape(weights.shape + (1,) * (err.ndim - weights.ndim))
    return jnp.mean(err)


def denoising_loss(
    loss_type: str, pred, target, xt=None, timestep=None, schedule=None, weights=None
):
    """x0 / noise / velocity(flow) losses (utils/loss.py:27-81)."""
    if loss_type in ("flow", "v"):
        return _mse(pred, target, weights)
    if loss_type == "x0":
        return _mse(pred, target, weights)
    if loss_type == "noise":
        return _mse(pred, target, weights)
    raise ValueError(loss_type)


def sample_block_timesteps(
    rng: jax.Array,
    batch: int,
    num_frames: int,
    num_frame_per_block: int,
    num_train_timesteps: int = 1000,
    min_t: int = 0,
) -> jnp.ndarray:
    """Block-consistent random timesteps [B, F]: all frames in a block share
    one timestep (model/base.py:48-95 _get_timestep, same_step_across_blocks
    handled by the caller)."""
    nb = num_frames // num_frame_per_block
    t = jax.random.randint(rng, (batch, nb), min_t, num_train_timesteps)
    return jnp.repeat(t, num_frame_per_block, axis=1).astype(jnp.float32)


def causal_flow_matching_loss(
    gen: WanDiffusion,
    params: Dict[str, Any],
    latents: jnp.ndarray,  # [B, F, C, H, W] clean
    prompt_embeds: jnp.ndarray,  # [B, T, text_dim]
    rng: jax.Array,
    num_frame_per_block: int = 3,
    loss_type: str = "flow",
    context_noise_max: int = 0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Causal diffusion pretraining loss (model/diffusion.py:86-113):
    blockwise-causal masked forward on noised latents, flow target.

    Note: gradients flow into `params` (passed separately from gen.params so
    jax.grad differentiates w.r.t. the argument).
    """
    b, f, c, h, w = latents.shape
    fsl = gen.cfg.frame_seq_length(h, w)
    r_t, r_n = jax.random.split(rng)
    t = sample_block_timesteps(r_t, b, f, num_frame_per_block)
    noise = jax.random.normal(r_n, latents.shape, jnp.float32).astype(latents.dtype)
    noisy = gen.schedule.add_noise(latents, noise, t)

    mask = attn_ops.blockwise_causal_mask(f, fsl, num_frame_per_block)
    cross = gen.compute_crossattn_cache(params, prompt_embeds)
    from realtime_video_tpu.models import wan_dit

    flow_pred, _ = wan_dit.dit_forward(
        gen.cfg, params, noisy, t, gen.rope, cross, mode="train", attn_mask=mask
    )
    target = gen.schedule.training_target(latents, noise, t)
    weights = gen.schedule.training_weight(t)
    loss = denoising_loss(loss_type, flow_pred, target, weights=weights)
    return loss, {"loss": loss, "mean_timestep": jnp.mean(t)}
