"""Checkpoint-sweep quality harness (reference: sweep_sample.py).

For each checkpoint: load weights into the transformer, sample a fixed prompt
battery at a fixed seed into a per-checkpoint directory, optionally composite
a side-by-side grid for human A/B review.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

SWEEP_PROMPTS = [
    "a cat surfing a wave at sunset, cinematic lighting",
    "a timelapse of a city skyline at night",
    "a golden retriever running through a field of flowers",
    "macro shot of a butterfly landing on a flower",
    "a steaming cup of coffee on a rainy window sill",
    "fireworks exploding over a mountain lake",
    "a robot walking through a neon-lit alley",
    "waves crashing on a rocky coastline, aerial view",
    "a chef flipping a pancake in a rustic kitchen",
    "snow falling on a quiet forest trail",
    "a hot air balloon drifting over desert dunes",
    "a street musician playing violin in the rain",
    "northern lights dancing over a frozen lake",
    "a skateboarder doing tricks in an empty pool",
    "a painter's brush adding color to a canvas",
]


def load_ckpt(models, ckpt_path: str) -> None:
    """Load new transformer weights into the live Models (reference
    sweep_sample.py:7-21 strips the 'model.' prefix before loading)."""
    from realtime_video_tpu.utils.checkpoint import load_wan_dit

    cfg, params = load_wan_dit(ckpt_path)
    assert cfg.dim == models.transformer.cfg.dim, "checkpoint/model dim mismatch"
    models.transformer.params = params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoints", nargs="+", help="checkpoint files to sweep")
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default="sweep_outputs")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--num-blocks", type=int, default=3)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--first-n", type=int, default=len(SWEEP_PROMPTS))
    ap.add_argument("--grid", action="store_true")
    args = ap.parse_args()

    from realtime_video_tpu.config import load_server_config
    from realtime_video_tpu.sample import create_grid, sample_videos
    from realtime_video_tpu.serving.models import load_all
    from realtime_video_tpu.serving.params import GenerateParams

    config = load_server_config(args.config)
    models = load_all(config)
    prompts = SWEEP_PROMPTS[: args.first_n]

    for ckpt in args.checkpoints:
        name = os.path.splitext(os.path.basename(ckpt))[0]
        out_dir = os.path.join(args.out, name)
        if os.path.exists(ckpt):
            load_ckpt(models, ckpt)
        params = GenerateParams(
            prompt="", seed=args.seed, num_blocks=args.num_blocks,
            num_denoising_steps=args.steps,
        )
        sample_videos(prompts, args.config, out_dir, params, models)
        if args.grid:
            vids = sorted(
                os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".mp4")
            )
            if vids:
                create_grid(vids, os.path.join(out_dir, "grid.mp4"))


if __name__ == "__main__":
    main()
