"""GAN distillation: classify branch + adversarial losses on tiny models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import WanModelConfig, load_server_config
from realtime_video_tpu.models import wan_dit
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.training.gan import GAN, init_gan_head_params

WAN_TINY = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
H = W = 4
F = 3


@pytest.fixture(scope="module")
def nets():
    gen = WanDiffusion(cfg=WAN_TINY, dtype=jnp.float32, seed=0)
    real = WanDiffusion(cfg=WAN_TINY, dtype=jnp.float32, is_causal=False, seed=1)
    fake = WanDiffusion(cfg=WAN_TINY, dtype=jnp.float32, is_causal=False, seed=2)
    cross = gen.compute_crossattn_cache(
        gen.params,
        jax.random.normal(jax.random.PRNGKey(3), (1, 16, WAN_TINY.text_dim), jnp.float32),
    )
    return gen, real, fake, cross


def test_classify_logits(nets):
    gen, _, fake, cross = nets
    gp = init_gan_head_params(
        jax.random.PRNGKey(0), WAN_TINY, num_class=4, num_registers=2
    )
    noisy = jax.random.normal(jax.random.PRNGKey(1), (1, F, 16, H, W), jnp.float32)
    t = jnp.full((1, F), 500.0, jnp.float32)
    logits = wan_dit.dit_classify(
        WAN_TINY, fake.params, noisy, t, fake.rope, cross, gp, taps=(0, 1)
    )
    assert logits.shape == (1, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_gan_losses_and_grads(nets):
    gen, real, fake, cross = nets
    config = load_server_config(
        denoising_step_list=[1000, 500], num_frame_per_block=3,
        gan_taps=[0, 1], num_class=1,
    )
    gan = GAN(gen, real, fake, config)
    noise = jax.random.normal(jax.random.PRNGKey(4), (1, F, 16, H, W), jnp.float32)

    (loss, aux), grads = jax.value_and_grad(
        lambda p: gan.generator_loss(
            p, fake.params, noise, cross, cross, jax.random.PRNGKey(5)
        ),
        has_aux=True,
    )(gen.params)
    assert np.isfinite(float(loss))
    assert "gan_g_loss" in aux

    real_latent = jax.random.normal(jax.random.PRNGKey(6), (1, F, 16, H, W), jnp.float32)
    (closs, caux), cgrads = jax.value_and_grad(
        lambda fp: gan.critic_loss(
            fp, gen.params, noise, cross, jax.random.PRNGKey(7),
            real_latent=real_latent,
        ),
        has_aux=True,
    )((fake.params, gan.gan_params))
    assert np.isfinite(float(closs))
    assert "gan_d_loss" in caux
    gn = sum(
        float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(cgrads[1])
    )
    assert gn > 0  # discriminator-branch params receive gradient
