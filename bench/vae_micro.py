"""VAE decoder stage-bisect microbenchmark.

Times steady-state streaming decode (1 latent frame -> 4 pixel frames at
480x832) truncated after each decoder stage, so per-stage deltas localise the
cost. Round-1 baseline: ~728 ms per 12-frame block (= 3 latent decodes +
first-frame handling) at ~5% of the chip's matmul roofline.

Usage (ONE TPU process at a time):
    python bench/vae_micro.py [--int8] [--iters 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--lat", type=int, nargs=2, default=(60, 104))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.rtv_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from realtime_video_tpu.config import VAE_CONFIGS
    from realtime_video_tpu.models import vae as vae_mod

    cfg = VAE_CONFIGS["wan2.1"]
    params = vae_mod.init_vae_params(jax.random.PRNGKey(1), cfg, jnp.bfloat16)
    if args.int8:
        params = vae_mod.quantize_vae_params(params)

    _, full_plan = vae_mod._decoder_plan(cfg)
    lh, lw = args.lat

    def partial_decoder(x, cache, first, n_stages):
        """decoder_apply truncated after n_stages plan entries (head skipped
        for truncated runs — channel counts differ mid-plan)."""
        io = vae_mod._CacheIO(cache)
        x = vae_mod.causal_conv3d(params["conv1"], x, io.get(), io)
        x = vae_mod.residual_block(params["middle_res1"], x, io)
        x = vae_mod.attention_block(params["middle_attn"], x)
        x = vae_mod.residual_block(params["middle_res2"], x, io)
        for spec, p in list(zip(full_plan, params["upsamples"]))[:n_stages]:
            if spec[0] == "res":
                x = vae_mod.residual_block(p, x, io)
            else:
                x = vae_mod.resample(p, spec[1], x, io, first)
        if n_stages == len(full_plan):
            x = vae_mod.rms_norm_image(params["head_norm"], x)
            x = jax.nn.silu(x)
            x = vae_mod.causal_conv3d(params["head_conv"], x, io.get(), io)
        return x, tuple(io.out)

    z0 = jax.random.normal(jax.random.PRNGKey(0), (1, lh, lw, cfg.z_dim), jnp.bfloat16)

    stage_marks = [0]
    for i, spec in enumerate(full_plan):
        if spec[0] == "resample":
            stage_marks.append(i + 1)
    stage_marks.append(len(full_plan))

    prev = 0.0
    for n in stage_marks:
        first_fn = jax.jit(lambda z: partial_decoder(z, None, True, n))
        rest_fn = jax.jit(
            lambda z, c: partial_decoder(z, c, False, n), donate_argnums=(1,)
        )
        _, cache = first_fn(z0)
        out, cache = rest_fn(z0, cache)
        jax.device_get(out[0, 0, 0, :2])  # compile barrier

        _, cache = first_fn(z0)
        t0 = time.perf_counter()
        z = z0
        for _ in range(args.iters):
            out, cache = rest_fn(z, cache)
            # evolve input from the output so the tunnel can't dedupe
            z = (z0 + out[:1, : lh, : lw, : cfg.z_dim].astype(z0.dtype) * 0.01
                 ) if out.shape[1] >= lh and out.shape[-1] >= cfg.z_dim else z0
        jax.device_get(out[0, -1, -1, :2])
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        shape = tuple(out.shape)
        print(f"stages<={n:2d}: {dt:8.2f} ms/latent  (+{dt - prev:7.2f})  out={shape}")
        prev = dt


if __name__ == "__main__":
    main()
