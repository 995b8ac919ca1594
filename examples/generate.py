"""Example: offline text-to-video generation (reference: generate.ipynb).

Runs the causal few-step pipeline end to end. Without checkpoints under
MODEL_FOLDER this uses random weights (structure/perf demo only).

  python examples/generate.py --prompt "a cat surfing" --blocks 3 --steps 4
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="a cat surfing a wave at sunset")
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default="generated.mp4")
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--input-video", default=None, help="v2v source")
    ap.add_argument("--strength", type=float, default=1.0)
    args = ap.parse_args()

    from realtime_video_tpu.sample import sample_videos
    from realtime_video_tpu.serving.params import GenerateParams

    params = GenerateParams(
        prompt=args.prompt, width=args.width, height=args.height,
        seed=args.seed, num_blocks=args.blocks, num_denoising_steps=args.steps,
        input_video=args.input_video, strength=args.strength,
    )
    out_dir = os.path.dirname(args.out) or "."
    videos = sample_videos(
        [args.prompt], args.config, out_dir, params, save_videos=False
    )
    from realtime_video_tpu.sample import save_video_direct

    save_video_direct(videos[0], args.out)
    print(f"wrote {args.out}: {videos[0].shape[0]} frames")


if __name__ == "__main__":
    main()
