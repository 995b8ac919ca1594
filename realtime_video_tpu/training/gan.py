"""Adversarial distillation (reference: model/gan.py).

The fake score doubles as a discriminator: a classifier branch taps DiT
features at three layers, register tokens cross-attend to them
(model.py:775-795 + GanAttentionBlock/RegisterTokens), a small MLP predicts
real/fake logits. Generator gets a non-saturating GAN term on top of DMD;
the critic gets relativistic or standard adversarial loss with optional
R1/R2 noise-perturbation penalties (gan.py:57-62).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from realtime_video_tpu.config import WanModelConfig
from realtime_video_tpu.models import wan_dit
from realtime_video_tpu.training.distillation import DMD
from realtime_video_tpu.training.losses import sample_block_timesteps

Params = Dict[str, Any]

DEFAULT_TAPS = (13, 21, 29)  # reference feature taps (model.py:785)


def init_gan_head_params(
    key: jax.Array,
    cfg: WanModelConfig,
    num_class: int = 1,
    num_registers: int = 3,
    concat_time: bool = False,
    dtype=jnp.float32,
) -> Params:
    """Register tokens + GanAttentionBlocks + cls MLP
    (wan_wrapper.py:159-177 adding_cls_branch)."""
    d = cfg.dim
    keys = iter(jax.random.split(key, 8 * num_registers + 8))

    def lin(k, din, dout, bias=True):
        lim = math.sqrt(6.0 / (din + dout))
        p = {"w": jax.random.uniform(k, (din, dout), jnp.float32, -lim, lim).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def gan_block(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "norm3": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "cross_attn": {
                "q": lin(next(ks), d, d),
                "k": lin(next(ks), d, d),
                "v": lin(next(ks), d, d),
                "o": lin(next(ks), d, d),
                "norm_q": {"scale": jnp.ones((d,), dtype)},
                "norm_k": {"scale": jnp.ones((d,), dtype)},
            },
            "ffn": {
                "fc1": lin(next(ks), d, cfg.ffn_dim),
                "fc2": lin(next(ks), cfg.ffn_dim, d),
            },
        }

    in_dim = num_registers * d + (d if concat_time else 0)
    return {
        "register_tokens": (
            jax.random.normal(next(keys), (num_registers, d), jnp.float32) * 0.02
        ).astype(dtype),
        "register_norm": {"scale": jnp.ones((d,), dtype)},
        "blocks": [gan_block(k) for k in jax.random.split(next(keys), num_registers)],
        "cls_head": {
            "norm": {"scale": jnp.ones((in_dim,), dtype), "bias": jnp.zeros((in_dim,), dtype)},
            "fc1": lin(next(keys), in_dim, d),
            "fc2": lin(next(keys), d, num_class),
        },
    }


class GAN(DMD):
    """DMD + adversarial term (model/gan.py)."""

    def __init__(self, generator, real_score, fake_score, config, gan_params=None):
        super().__init__(generator, real_score, fake_score, config)
        self.gan_g_weight = float(config.get("gan_g_weight", 1e-2))
        self.gan_d_weight = float(config.get("gan_d_weight", 1e-2))
        self.r1_weight = float(config.get("r1_weight", 0.0))
        self.r2_weight = float(config.get("r2_weight", 0.0))
        self.r1_sigma = float(config.get("r1_sigma", 0.01))
        self.r2_sigma = float(config.get("r2_sigma", 0.01))
        self.relativistic = bool(config.get("relativistic_discriminator", False))
        self.concat_time = bool(config.get("concat_time_embeddings", False))
        nl = fake_score.cfg.num_layers
        self.taps = tuple(
            tl for tl in config.get("gan_taps", DEFAULT_TAPS) if tl < nl
        ) or (nl - 1,)
        if gan_params is None:
            gan_params = init_gan_head_params(
                jax.random.PRNGKey(7), fake_score.cfg,
                num_class=int(config.get("num_class", 1)),
                num_registers=len(self.taps),
                concat_time=self.concat_time,
            )
        self.gan_params = gan_params

    def _logits(self, fake_params, gan_params, x0, t, cross, rng):
        noise = jax.random.normal(rng, x0.shape, jnp.float32).astype(x0.dtype)
        noisy = self.fake_score.schedule.add_noise(x0, noise, t)
        return wan_dit.dit_classify(
            self.fake_score.cfg, fake_params, noisy, t, self.fake_score.rope,
            cross, gan_params, taps=self.taps, concat_time=self.concat_time,
        )


    def generator_loss(
        self, gen_params, fake_params, noise, cross_cond, cross_uncond, rng,
    ):
        r_roll, r_dmd, r_t, r_n = jax.random.split(rng, 4)
        x0_gen, _ = self.pipeline.inference_with_trajectory(
            gen_params, noise, cross_cond, r_roll
        )
        dmd = self.distribution_matching_loss(
            x0_gen, cross_cond, cross_uncond, fake_params, r_dmd
        )
        b, f = x0_gen.shape[:2]
        t = sample_block_timesteps(r_t, b, f, self.num_frame_per_block)
        logits = self._logits(fake_params, self.gan_params, x0_gen, t, cross_cond, r_n)
        # non-saturating generator loss: -log sigmoid(logits)
        g_adv = jnp.mean(jax.nn.softplus(-logits))
        loss = dmd + self.gan_g_weight * g_adv
        return loss, {"dmd_loss": dmd, "gan_g_loss": g_adv}

    def critic_loss(
        self, fake_and_gan_params, gen_params, noise, cross_cond, rng,
        real_latent: Optional[jnp.ndarray] = None,
    ):
        fake_params, gan_params = fake_and_gan_params
        r_roll, r_t, r_f, r_r, r_c = jax.random.split(rng, 5)
        x0_gen, _ = self.pipeline.inference_with_trajectory(
            gen_params, noise, cross_cond, r_roll
        )
        x0_gen = jax.lax.stop_gradient(x0_gen)
        b, f = x0_gen.shape[:2]
        t = sample_block_timesteps(r_t, b, f, self.num_frame_per_block)
        fake_logits = self._logits(fake_params, gan_params, x0_gen, t, cross_cond, r_f)

        # flow-matching critic loss (keeps the fake score a valid score net)
        base, _ = super().critic_loss(fake_params, gen_params, noise, cross_cond, r_c)

        if real_latent is not None:
            real_logits = self._logits(
                fake_params, gan_params, real_latent, t, cross_cond, r_r
            )
            if self.relativistic:
                d_adv = jnp.mean(jax.nn.softplus(-(real_logits - fake_logits)))
            else:
                d_adv = jnp.mean(jax.nn.softplus(-real_logits)) + jnp.mean(
                    jax.nn.softplus(fake_logits)
                )
            # R1/R2: penalise logit drift under small input perturbations
            penalties = 0.0
            if self.r1_weight > 0:
                pert = real_latent + self.r1_sigma * jax.random.normal(
                    r_r, real_latent.shape, jnp.float32
                ).astype(real_latent.dtype)
                pl = self._logits(fake_params, gan_params, pert, t, cross_cond, r_r)
                penalties += self.r1_weight * jnp.mean((real_logits - pl) ** 2)
            if self.r2_weight > 0:
                pert = x0_gen + self.r2_sigma * jax.random.normal(
                    r_f, x0_gen.shape, jnp.float32
                ).astype(x0_gen.dtype)
                pl = self._logits(fake_params, gan_params, pert, t, cross_cond, r_f)
                penalties += self.r2_weight * jnp.mean((fake_logits - pl) ** 2)
            loss = base + self.gan_d_weight * d_adv + penalties
            return loss, {"critic_loss": base, "gan_d_loss": d_adv}
        loss = base + self.gan_d_weight * jnp.mean(jax.nn.softplus(fake_logits))
        return loss, {"critic_loss": base}
