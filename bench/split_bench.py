"""Block-time split: fused DiT block step (reset+prefill+4-step denoise) vs
streaming VAE decode, at the same shapes/config bench.py uses.

Round-1 split: 843 ms DiT (186 prefill + 4x165 denoise) + 728 ms VAE per
12-frame block = 7.64 fps.

Usage (ONE TPU process at a time): python bench/split_bench.py [--no-int8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")
os.environ.setdefault("RTV_STRICT_KERNELS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--only", choices=["dit", "prefill", "denoise", "vae", "all"],
                    default="all", help="compile/measure one stage (tunnel "
                    "compiles are minutes; run stages separately so each "
                    "lands in the persistent cache)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a device trace of the timed loop into DIR "
                    "(uses only cached executables; read with "
                    "bench/read_trace.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.rtv_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from realtime_video_tpu.config import VAE_CONFIGS, WanModelConfig
    from realtime_video_tpu.models import vae as vae_mod
    from realtime_video_tpu.models import wan_dit
    from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
    from realtime_video_tpu.models.vae_wrapper import VAEWrapper
    from realtime_video_tpu.ops import kv_cache as kvc

    cfg = WanModelConfig(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30)
    lat_h, lat_w = 60, 104
    vae_cfg = VAE_CONFIGS["wan2.1"]
    int8 = not args.no_int8
    steps = (1000.0, 937.0, 833.0, 625.0)
    nfpb, kv_frames = 3, 6
    fsl = cfg.frame_seq_length(lat_h, lat_w)
    cache_size = kv_frames * fsl

    gen = WanDiffusion(cfg=cfg, dtype=jnp.bfloat16, timestep_shift=5.0,
                       fuse_qkv=True, quantize_linears=int8)
    vae = VAEWrapper(cfg=vae_cfg, params=vae_mod.init_vae_params(
        jax.random.PRNGKey(1), vae_cfg, jnp.bfloat16))
    if int8:
        vae.params = vae_mod.quantize_vae_params(vae.params)

    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 512, cfg.text_dim), jnp.bfloat16)
    cross = gen.compute_crossattn_cache(gen.params, ctx)
    kv = kvc.init_kv_cache(cfg.num_layers, 1, cache_size, cfg.num_heads, cfg.head_dim)
    denoise = gen.make_denoise_block_fn(steps, cache_size, refresh_t=None)

    def block_step(params, kv, cross, clean_ctx, noisy, current_start, rng):
        kv = kvc.reset_kv_cache(kv)
        t0 = jnp.zeros(clean_ctx.shape[:2], jnp.float32)
        _, kv = wan_dit.dit_forward(
            cfg, params, clean_ctx, t0, gen.rope, cross,
            mode="prefill", kv_cache=kv, prefill_block_tokens=fsl * nfpb,
        )
        return denoise(params, kv, cross, noisy, current_start, rng)

    step_fn = jax.jit(block_step, donate_argnums=(1,))

    # prefill-only and single-denoise-forward for the finer split
    def prefill_only(params, kv, cross, clean_ctx):
        kv = kvc.reset_kv_cache(kv)
        t0 = jnp.zeros(clean_ctx.shape[:2], jnp.float32)
        _, kv = wan_dit.dit_forward(
            cfg, params, clean_ctx, t0, gen.rope, cross,
            mode="prefill", kv_cache=kv, prefill_block_tokens=fsl * nfpb,
        )
        return kv
    prefill_fn = jax.jit(prefill_only, donate_argnums=(1,))

    rng = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, nfpb, 16, lat_h, lat_w), jnp.bfloat16)
    ctx_frames = jax.random.normal(
        jax.random.PRNGKey(4), (1, kv_frames - nfpb, 16, lat_h, lat_w), jnp.bfloat16)

    # ---- DiT block step ----
    dit_ms = prefill_ms = vae_ms = float("nan")
    x0 = jax.random.normal(jax.random.PRNGKey(9), (1, nfpb, 16, lat_h, lat_w), jnp.bfloat16)
    if args.only in ("dit", "all"):
        x0, kv, rng = step_fn(gen.params, kv, cross, ctx_frames, noise,
                          (kv_frames - nfpb) * fsl, rng)
        jax.device_get(x0[0, 0, 0, 0, :2])
        print("dit compiled", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            x0, kv, rng = step_fn(gen.params, kv, cross, ctx_frames, x0.astype(noise.dtype),
                                  (kv_frames - nfpb) * fsl, rng)
        jax.device_get(x0[0, -1, -1, -1, :2])
        dit_ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"DiT block step : {dit_ms:7.1f} ms", flush=True)

    # ---- prefill alone ----
    if args.only in ("prefill", "all"):
        kv = prefill_fn(gen.params, kv, cross, ctx_frames)
        jax.device_get(kv["k"][0, 0, 0, 0, :2])
        print("prefill compiled", flush=True)
        t0 = time.perf_counter()
        for i in range(args.iters):
            kv = prefill_fn(gen.params, kv, cross,
                            (ctx_frames + kv["k"][0, 0, 0, 0, 0] * 1e-6).astype(ctx_frames.dtype))
        jax.device_get(kv["k"][-1, 0, -1, 0, :2])
        prefill_ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"prefill        : {prefill_ms:7.1f} ms", flush=True)

    # ---- 4-step denoise alone (no prefill) ----
    if args.only == "denoise":
        dn_fn = jax.jit(denoise, donate_argnums=(1,))
        x0, kv, rng = dn_fn(gen.params, kv, cross, noise,
                            (kv_frames - nfpb) * fsl, rng)
        jax.device_get(x0[0, 0, 0, 0, :2])
        print("denoise compiled", flush=True)
        if args.profile:
            jax.profiler.start_trace(args.profile)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            x0, kv, rng = dn_fn(gen.params, kv, cross, x0.astype(noise.dtype),
                                (kv_frames - nfpb) * fsl, rng)
        jax.device_get(x0[0, -1, -1, -1, :2])
        dn_ms = (time.perf_counter() - t0) / args.iters * 1e3
        if args.profile:
            jax.profiler.stop_trace()
        print(f"4-step denoise : {dn_ms:7.1f} ms ({dn_ms/4:.1f}/step)", flush=True)
        return

    # ---- VAE decode (streamed per latent, 3 latents like one block) ----
    if args.only not in ("vae", "all"):
        return
    px, vc = vae.decode_block(x0[:, :1].astype(jnp.bfloat16))
    px, vc = vae.decode_block(x0[:, 1:2].astype(jnp.bfloat16), vc)
    jax.device_get(px[0, -1, 0, :2])
    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    z = x0.astype(jnp.bfloat16)
    for i in range(args.iters):
        for j in range(3):
            px, vc = vae.decode_block(
                (z[:, j:j+1] + px[0, -1, 0, 0, 0].astype(z.dtype) * 1e-6), vc)
    jax.device_get(px[0, -1, -1, ::128, :2])
    vae_ms = (time.perf_counter() - t0) / args.iters * 1e3
    if args.profile:
        jax.profiler.stop_trace()
    print(f"VAE decode     : {vae_ms:7.1f} ms / 3 latents (12 frames)", flush=True)

    if args.only == "all":
        denoise_ms = dit_ms - prefill_ms
        print(f"(prefill {prefill_ms:.1f} + 4-step denoise {denoise_ms:.1f} "
              f"= {denoise_ms/4:.1f}/step)")
        total = dit_ms + vae_ms
        print(f"block total    : {total:7.1f} ms -> {12.0 / (total/1e3):.2f} fps ceiling")


if __name__ == "__main__":
    main()
