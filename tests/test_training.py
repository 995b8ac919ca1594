"""Training losses: finite values + nonzero grads on tiny models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import WanModelConfig, load_server_config
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.pipelines.self_forcing_training import (
    SelfForcingTrainingPipeline,
)
from realtime_video_tpu.training.distillation import DMD, CausVid, SiD, ode_regression_loss

WAN_TINY = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
H = W = 4
F = 6


def _unzero_head(gen, key):
    """The reference zero-inits the output head (causal_model.py:1173), which
    makes fresh fake/real scores IDENTICAL (flow=0) and the DMD gradient
    exactly zero — randomise heads so the losses are non-degenerate."""
    w = gen.params["head"]["head"]["w"]
    gen.params["head"]["head"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(key), w.shape, jnp.float32) * 0.05
    )
    return gen


@pytest.fixture(scope="module")
def nets():
    gen = _unzero_head(WanDiffusion(cfg=WAN_TINY, dtype=jnp.float32, seed=0), 20)
    real = _unzero_head(
        WanDiffusion(cfg=WAN_TINY, dtype=jnp.float32, is_causal=False, seed=1), 21
    )
    fake = _unzero_head(
        WanDiffusion(cfg=WAN_TINY, dtype=jnp.float32, is_causal=False, seed=2), 22
    )
    cross = gen.compute_crossattn_cache(
        gen.params,
        jax.random.normal(jax.random.PRNGKey(3), (1, 16, WAN_TINY.text_dim), jnp.float32),
    )
    cross_u = gen.compute_crossattn_cache(
        gen.params,
        jax.random.normal(jax.random.PRNGKey(4), (1, 16, WAN_TINY.text_dim), jnp.float32),
    )
    return gen, real, fake, cross, cross_u


def _grad_norm(g):
    leaves = jax.tree.leaves(g)
    return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves))


def test_self_forcing_rollout_shapes_and_grad_gating(nets):
    gen, _, _, cross, _ = nets
    pipe = SelfForcingTrainingPipeline(
        [1000, 750, 500], gen.schedule, gen, num_frame_per_block=3,
    )
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, F, 16, H, W), jnp.float32)
    pred, flags = pipe.inference_with_trajectory(gen.params, noise, cross, jax.random.PRNGKey(1))
    assert pred.shape == noise.shape
    assert flags.shape == (F // 3,)
    assert np.isfinite(np.asarray(pred)).all()


def test_dmd_generator_and_critic_losses(nets):
    gen, real, fake, cross, cross_u = nets
    config = load_server_config(
        denoising_step_list=[1000, 500], num_frame_per_block=3, guidance_scale=2.0
    )
    dmd = DMD(gen, real, fake, config)
    noise = jax.random.normal(jax.random.PRNGKey(5), (1, F, 16, H, W), jnp.float32)

    (loss, _), grads = jax.value_and_grad(
        lambda p: dmd.generator_loss(p, fake.params, noise, cross, cross_u, jax.random.PRNGKey(6)),
        has_aux=True,
    )(gen.params)
    assert np.isfinite(float(loss))
    assert _grad_norm(grads) > 0

    (closs, _), cgrads = jax.value_and_grad(
        lambda p: dmd.critic_loss(p, gen.params, noise, cross, jax.random.PRNGKey(7)),
        has_aux=True,
    )(fake.params)
    assert np.isfinite(float(closs))
    assert _grad_norm(cgrads) > 0


def test_sid_loss_finite(nets):
    gen, real, fake, cross, cross_u = nets
    config = load_server_config(
        denoising_step_list=[1000, 500], num_frame_per_block=3, sid_alpha=1.0
    )
    sid = SiD(gen, real, fake, config)
    noise = jax.random.normal(jax.random.PRNGKey(8), (1, F, 16, H, W), jnp.float32)
    (loss, _), grads = jax.value_and_grad(
        lambda p: sid.generator_loss(p, fake.params, noise, cross, cross_u, jax.random.PRNGKey(9)),
        has_aux=True,
    )(gen.params)
    assert np.isfinite(float(loss))
    assert _grad_norm(grads) > 0


def test_causvid_forward_simulated(nets):
    gen, real, fake, cross, cross_u = nets
    config = load_server_config(denoising_step_list=[1000, 500], num_frame_per_block=3)
    cv = CausVid(gen, real, fake, config)
    clean = jax.random.normal(jax.random.PRNGKey(10), (1, F, 16, H, W), jnp.float32)
    noise = jnp.zeros_like(clean)
    (loss, _), grads = jax.value_and_grad(
        lambda p: cv.generator_loss(
            p, fake.params, noise, cross, cross_u, jax.random.PRNGKey(11),
            clean_latent=clean,
        ),
        has_aux=True,
    )(gen.params)
    assert np.isfinite(float(loss))
    assert _grad_norm(grads) > 0


def test_ode_regression_loss(nets):
    gen, _, _, cross, _ = nets
    noisy = jax.random.normal(jax.random.PRNGKey(12), (1, F, 16, H, W), jnp.float32)
    target = jax.random.normal(jax.random.PRNGKey(13), (1, F, 16, H, W), jnp.float32)
    t = jnp.full((1, F), 500.0, jnp.float32)
    loss, grads = jax.value_and_grad(
        lambda p: ode_regression_loss(gen, p, noisy, target, t, cross)
    )(gen.params)
    assert np.isfinite(float(loss))
    assert _grad_norm(grads) > 0
