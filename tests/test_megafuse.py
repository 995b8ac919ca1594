"""The mega-fused block program (bench.py RTV_BENCH_MEGAFUSE; one jit per
block: re-encode + prefill + denoise + lax.scan over per-latent VAE decodes)
must compute the same math as the dispatch-per-stage path it replaces.

The fusion exists because the axon tunnel taxes every dispatch (round-4
flavor: ~32 ms/dispatch on fresh executables — bench/stall_probe.py), and
one-program-per-block is the natural XLA serving shape regardless.
"""
import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.config import VAEConfig, WanModelConfig
from realtime_video_tpu.models import vae as vae_mod
from realtime_video_tpu.models import wan_dit
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.ops import kv_cache as kvc

CFG = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
VCFG = VAEConfig(dim=8, z_dim=16, dim_mult=(1, 1, 2, 2), num_res_blocks=1)
LAT_H = LAT_W = 8
NFPB = 3
KV_FRAMES = 6
STEPS = (1000.0, 500.0)


def _setup():
    gen = WanDiffusion(cfg=CFG, dtype=jnp.float32, timestep_shift=5.0)
    vparams = vae_mod.init_vae_params(jax.random.PRNGKey(1), VCFG, jnp.float32)
    fsl = CFG.frame_seq_length(LAT_H, LAT_W)
    cache_size = KV_FRAMES * fsl
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, CFG.text_dim), jnp.float32)
    cross = gen.compute_crossattn_cache(gen.params, ctx)
    kv = kvc.init_kv_cache(CFG.num_layers, 1, cache_size, CFG.num_heads, CFG.head_dim,
                           dtype=jnp.float32)
    denoise = gen.make_denoise_block_fn(STEPS, cache_size, refresh_t=None)

    def block_step(params, kv, cross, clean_ctx, noisy, current_start, rng):
        kv = kvc.reset_kv_cache(kv)
        kv = wan_dit.context_prefill(
            gen.cfg, params, clean_ctx, gen.rope, cross, kv,
            block_tokens=fsl * NFPB, max_attention_size=cache_size,
        )
        return denoise(params, kv, cross, noisy, current_start, rng)

    return gen, vparams, fsl, cross, kv, denoise, block_step


def test_mega_block_matches_dispatch_per_stage():
    gen, vparams, fsl, cross, kv0, denoise, block_step = _setup()
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (1, NFPB, 16, LAT_H, LAT_W), jnp.float32)
    ctx_rest = jax.random.normal(
        jax.random.PRNGKey(4), (1, KV_FRAMES - NFPB, 16, LAT_H, LAT_W), jnp.float32)
    px_tail = jax.random.uniform(
        jax.random.PRNGKey(5), (1, 1, LAT_H * 8, LAT_W * 8, 3), jnp.float32,
        minval=-1.0, maxval=1.0)
    # warm VAE cache: decode one latent from a fresh stream
    z_warm = jax.random.normal(
        jax.random.PRNGKey(6), (1, 1, LAT_H, LAT_W, 16), jnp.float32)
    _, vcache0 = vae_mod.decode_chunks(VCFG, vparams, z_warm, None, first=True, chunk=1)
    rng = jax.random.PRNGKey(7)
    start = (KV_FRAMES - NFPB) * fsl

    # --- reference: one dispatch per stage (the bench's non-mega path) ----
    first_lat, _ = vae_mod.encode_chunks(VCFG, vparams, px_tail, None, stream=False)
    ctx_in = jnp.concatenate(
        [first_lat.transpose(0, 1, 4, 2, 3), ctx_rest[:, 1:]], axis=1)
    x0, kv_a, rng_a = jax.jit(block_step)(
        gen.params, kv0, cross, ctx_in, noise, start, rng)
    pxs_ref, vc = [], vcache0
    for i in range(NFPB):
        z1 = x0[:, i:i + 1].transpose(0, 1, 3, 4, 2)
        px, vc = vae_mod.decode_chunks(VCFG, vparams, z1, vc, first=False, chunk=1)
        pxs_ref.append(np.asarray(px))

    # --- mega: everything in ONE jitted program (bench.py mega_block) -----
    def mega_block(params, kv, cross, vparams, vcache, px_tail, ctx_rest,
                   noisy, current_start, rng):
        first_lat, _ = vae_mod.encode_chunks(VCFG, vparams, px_tail, None,
                                             stream=False)
        ctx_in = jnp.concatenate(
            [first_lat.transpose(0, 1, 4, 2, 3).astype(ctx_rest.dtype),
             ctx_rest[:, 1:]], axis=1)
        x0, kv, rng = block_step(params, kv, cross, ctx_in, noisy,
                                 current_start, rng)
        z = x0.transpose(0, 1, 3, 4, 2)

        def dec(c, z1):
            px1, c = vae_mod.decode_chunks(VCFG, vparams, z1[:, None], c,
                                           first=False, chunk=1)
            return c, px1

        vcache, pxs = jax.lax.scan(dec, vcache, jnp.moveaxis(z, 1, 0))
        return pxs, kv, vcache, rng, pxs[-1, :, -1:]

    pxs_mega, kv_b, _, rng_b, tail = jax.jit(mega_block)(
        gen.params, kv0, cross, vparams, vcache0, px_tail, ctx_rest,
        noise, start, rng)

    assert pxs_mega.shape == (NFPB,) + pxs_ref[0].shape
    for i in range(NFPB):
        np.testing.assert_allclose(
            np.asarray(pxs_mega[i]), pxs_ref[i], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rng_b), np.asarray(rng_a))
    np.testing.assert_allclose(
        np.asarray(kv_b["k"]), np.asarray(kv_a["k"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(tail), np.asarray(pxs_mega[-1][:, -1:]))


def test_mega_block0_matches_dispatch_per_stage():
    gen, vparams, fsl, cross, kv0, denoise, _ = _setup()
    noise = jax.random.normal(
        jax.random.PRNGKey(8), (1, NFPB, 16, LAT_H, LAT_W), jnp.float32)
    rng = jax.random.PRNGKey(9)

    x0, kv_a, _ = jax.jit(
        lambda p, kv, c, n, r: denoise(p, kvc.reset_kv_cache(kv), c, n, 0, r)
    )(gen.params, kv0, cross, noise, rng)
    z1 = x0[:, :1].transpose(0, 1, 3, 4, 2)
    px_ref, _ = vae_mod.decode_chunks(VCFG, vparams, z1, None, first=True, chunk=1)

    def mega_block0(params, kv, cross, vparams, noisy, rng):
        x0, kv, rng = denoise(params, kvc.reset_kv_cache(kv), cross, noisy, 0, rng)
        z1 = x0[:, :1].transpose(0, 1, 3, 4, 2)
        px1, vc = vae_mod.decode_chunks(VCFG, vparams, z1, None, first=True, chunk=1)
        return px1, kv, vc, rng

    px_mega, _, _, _ = jax.jit(mega_block0)(
        gen.params, kv0, cross, vparams, noise, rng)
    np.testing.assert_allclose(
        np.asarray(px_mega), np.asarray(px_ref), rtol=2e-4, atol=2e-4)
