"""Sharded training step: dp over batch (DCN), tp over heads/FFN (ICI).

Replaces the reference's FSDP training scaffold (utils/distributed.py,
wan/distributed/fsdp.py) with declarative shardings — grads reduce over "dp"
automatically because the loss averages over the dp-sharded batch axis.
"""
from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.parallel.sharding import shard_wan_params
from realtime_video_tpu.training.losses import causal_flow_matching_loss


def make_train_state(
    gen: WanDiffusion, mesh: Mesh, learning_rate: float = 1e-5, weight_decay: float = 0.01
):
    """(sharded params, optimizer, sharded opt state)."""
    params = shard_wan_params(gen.params, mesh)
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    opt_state = tx.init(params)  # inherits param shardings leaf-wise
    return params, tx, opt_state


def make_train_step(
    gen: WanDiffusion,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    num_frame_per_block: int = 3,
    ema_decay: float | None = None,
):
    """If `ema_decay` is set, the step also maintains an fp32 EMA shadow of
    the params (EMA_FSDP analog, utils/distributed.py:91-125) — pass/return
    it as the optional `ema` argument."""
    data_sharding = NamedSharding(mesh, P("dp"))

    def step(params, opt_state, ema, latents, prompt_embeds, rng):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: causal_flow_matching_loss(
                gen, p, latents, prompt_embeds, rng,
                num_frame_per_block=num_frame_per_block,
            ),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay is not None:
            ema = jax.tree_util.tree_map(
                lambda s, p: s * ema_decay + p.astype(s.dtype) * (1.0 - ema_decay),
                ema, params,
            )
        return params, opt_state, ema, metrics

    jitted = jax.jit(step, donate_argnums=(0, 1, 2))

    def run(params, opt_state, latents, prompt_embeds, rng, ema=None):
        latents = jax.device_put(latents, data_sharding)
        prompt_embeds = jax.device_put(prompt_embeds, data_sharding)
        params, opt_state, ema, metrics = jitted(
            params, opt_state, ema, latents, prompt_embeds, rng
        )
        if ema_decay is None:
            return params, opt_state, metrics
        return params, opt_state, ema, metrics

    return run
