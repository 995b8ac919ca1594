"""Example: video-to-video restyling (reference: sample_example.ipynb).

Encodes an input clip, mixes noise at `strength`, and regenerates with a new
prompt through the causal pipeline.

  python examples/sample_example.py --video in.mp4 --prompt "anime style" \
      --strength 0.7 --out restyled.mp4
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", required=True)
    ap.add_argument("--prompt", default="cinematic, high quality")
    ap.add_argument("--strength", type=float, default=0.7)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--blocks", type=int, default=9)
    ap.add_argument("--out", default="restyled.mp4")
    ap.add_argument("--config", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    from realtime_video_tpu.config import load_server_config
    from realtime_video_tpu.serving.models import load_all
    from realtime_video_tpu.serving.params import GenerateParams
    from realtime_video_tpu.serving.session import GenerationSession
    from realtime_video_tpu.sample import save_video_direct

    config = load_server_config(args.config)
    models = load_all(config)
    params = GenerateParams(
        prompt=args.prompt, seed=args.seed, strength=args.strength,
        num_blocks=args.blocks, num_denoising_steps=args.steps,
        input_video=args.video,
    )
    collected = []
    session = GenerationSession(
        params, config,
        frame_callback=lambda p, i, e: collected.append(
            np.clip((np.asarray(p, np.float32) + 1) * 0.5, 0, 1)
        ),
        models=models,
    )
    for _ in range(session.num_blocks):
        session.generate_block(models)
    frames = np.concatenate(collected, axis=1)[0]
    save_video_direct(frames, args.out)
    print(f"wrote {args.out}: {frames.shape[0]} frames")


if __name__ == "__main__":
    main()
