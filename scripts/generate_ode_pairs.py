"""Dump teacher ODE trajectories for ODE-regression distillation.

Reference: scripts/generate_ode_pairs.py — a torch.distributed job running the
48-step bidirectional teacher and saving (trajectory, prompt) pairs. Here the
teacher is the jitted BidirectionalDiffusionInferencePipeline; data-parallel
sharding over prompts comes from jax process count (or --shard/--num-shards).

Usage:
  python scripts/generate_ode_pairs.py --prompts prompts.txt --out ode_shards/ \
      --steps 48 --num-frames 21 [--tiny]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--num-frames", type=int, default=21)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--shard-size", type=int, default=16)
    ap.add_argument("--tiny", action="store_true", help="tiny model smoke mode")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from realtime_video_tpu.config import WanModelConfig, load_server_config
    from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
    from realtime_video_tpu.pipelines import BidirectionalDiffusionInferencePipeline
    from realtime_video_tpu.serving.models import load_text_encoder
    from realtime_video_tpu.utils.dataset import TextDataset, save_ode_shard
    from realtime_video_tpu.solvers import FlowUniPCMultistep

    cfg_kw = {}
    if args.tiny:
        wan_cfg = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
        lat_h, lat_w = 4, 4
        gen = WanDiffusion(cfg=wan_cfg, dtype=jnp.float32, is_causal=False)
    else:
        wan_cfg = None
        lat_h, lat_w = args.height // 8, args.width // 8
        config = load_server_config()
        gen = WanDiffusion(
            checkpoint_path=config.get("teacher_checkpoint_path", ""),
            model_name=config.get("model_name", "t2v-1.3B"), is_causal=False,
        )
    config = load_server_config(sampling_steps=args.steps, **cfg_kw)
    text_encoder = load_text_encoder(config)
    pipe = BidirectionalDiffusionInferencePipeline(config, gen, text_encoder)

    prompts = TextDataset(args.prompts)
    os.makedirs(args.out, exist_ok=True)
    records = []
    shard_idx = 0
    for i in range(args.shard, len(prompts), args.num_shards):
        prompt = prompts[i]["prompts"]
        noise = jax.random.normal(
            jax.random.PRNGKey(i), (1, args.num_frames, 16, lat_h, lat_w), jnp.float32
        )
        # capture the full trajectory: re-run solver stepping, recording samples
        embeds = text_encoder([prompt])["prompt_embeds"]
        cross = gen.compute_crossattn_cache(gen.params, embeds.astype(jnp.bfloat16))
        solver = FlowUniPCMultistep(shift=float(config.get("timestep_shift", 5.0)))
        solver.set_timesteps(args.steps)
        import numpy as _np

        from realtime_video_tpu.ops import attention as attn_ops

        fsl = gen.cfg.frame_seq_length(lat_h, lat_w)
        full_mask = jnp.ones((args.num_frames * fsl,) * 2, bool)
        fwd = jax.jit(
            lambda p, cr, x, t: gen.forward(p, x, cr, t, mode="train", attn_mask=full_mask)[0]
        )
        latent = noise
        traj = [np.asarray(latent, np.float16)]
        for t_val in solver.timesteps:
            t = jnp.full((1, args.num_frames), float(t_val), jnp.float32)
            flow = fwd(gen.params, cross, latent, t)
            latent = solver.step(flow, float(t_val), latent)
            traj.append(np.asarray(latent, np.float16))
        records.append({"ode_latent": np.stack(traj), "prompts": prompt})
        print(f"[{args.shard}] prompt {i}: trajectory {records[-1]['ode_latent'].shape}")
        if len(records) >= args.shard_size:
            save_ode_shard(
                os.path.join(args.out, f"shard_{args.shard}_{shard_idx:04d}.npz"), records
            )
            records, shard_idx = [], shard_idx + 1
    if records:
        save_ode_shard(
            os.path.join(args.out, f"shard_{args.shard}_{shard_idx:04d}.npz"), records
        )


if __name__ == "__main__":
    main()
