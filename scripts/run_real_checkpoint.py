"""One-shot real-weight integration run (reference: release_server.py:150-188).

Loads the actual Wan checkpoints (DiT safetensors, VAE .pth, umT5 encoder)
from MODEL_FOLDER through utils/checkpoint.py, generates a short fixed-seed
clip via the serving session, and prints a frame checksum so runs are
comparable across machines/rounds. Degrades gracefully (exit 0 with a clear
message) when the ~30 GB weight set is absent.

Usage:
    MODEL_FOLDER=~/models python scripts/run_real_checkpoint.py \
        [--prompt "..."] [--blocks 3] [--steps 4] [--out outputs/real.mp4]

Checkpoint layout expected under MODEL_FOLDER (the reference's, README.md:53):
    Wan2.1-T2V-1.3B/Wan2.1_VAE.pth
    Wan2.1-T2V-1.3B/models_t5_umt5-xxl-enc-bf16.safetensors
    Wan2.1-T2V-1.3B/google/umt5-xxl/  (tokenizer files)
    <checkpoint_path from config — e.g. krea-realtime-video-14b.safetensors
     or a 1.3B self-forcing checkpoint; autodetected 1.3B vs 14B>
"""
from __future__ import annotations

import argparse
import glob
import hashlib
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "")
# capture the caller's platform choice NOW: the axon TPU plugin stomps
# JAX_PLATFORMS during jax import, so an env var alone does not stick
# (CLAUDE.md) — it must be re-applied via jax.config.update after import
_WANT_PLATFORM = os.environ["JAX_PLATFORMS"]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_dit_checkpoint(model_folder: str) -> str | None:
    """The serving config's checkpoint_path, else any top-level safetensors
    that looks like a DiT (release_server.py:162-165 autodetects size from
    weight shapes — load_wan_dit does the same)."""
    for pattern in ("*.safetensors", "*/*.safetensors"):
        for p in sorted(glob.glob(os.path.join(model_folder, pattern))):
            base = os.path.basename(p)
            if "t5" in base or "umt5" in base or "clip" in base.lower():
                continue
            return p
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="a corgi running on a beach at sunset")
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--out", default="outputs/real_checkpoint.mp4")
    ap.add_argument("--checkpoint", default=None, help="DiT safetensors path")
    args = ap.parse_args()

    from realtime_video_tpu.config import MODEL_FOLDER

    dit_ckpt = args.checkpoint or find_dit_checkpoint(MODEL_FOLDER)
    vae_ckpt = os.path.join(MODEL_FOLDER, "Wan2.1-T2V-1.3B", "Wan2.1_VAE.pth")
    t5_ckpt = os.path.join(
        MODEL_FOLDER, "Wan2.1-T2V-1.3B",
        "models_t5_umt5-xxl-enc-bf16.safetensors",
    )
    missing = [p for p in (dit_ckpt, vae_ckpt, t5_ckpt)
               if not (p and os.path.exists(p))]
    if missing:
        print("real-checkpoint run SKIPPED — weights not present:")
        for p in missing:
            print(f"  missing: {p or '<no DiT safetensors under MODEL_FOLDER>'}")
        print(f"(MODEL_FOLDER={MODEL_FOLDER}; see module docstring for layout)")
        return 0

    import jax

    if _WANT_PLATFORM:
        jax.config.update("jax_platforms", _WANT_PLATFORM)

    import numpy as np

    from realtime_video_tpu.config import load_server_config
    from realtime_video_tpu.sample import sample_videos, save_video_direct
    from realtime_video_tpu.serving.models import load_all
    from realtime_video_tpu.serving.params import GenerateParams

    config = load_server_config(
        checkpoint_path=dit_ckpt,
        num_denoising_steps=args.steps,
    )
    models = load_all(config)
    params = GenerateParams(
        prompt=args.prompt, width=args.width, height=args.height,
        seed=args.seed, num_blocks=args.blocks,
        num_denoising_steps=args.steps,
    )
    vids = sample_videos(
        [args.prompt], params=params, models=models, save_videos=False,
        output_dir=os.path.dirname(args.out) or ".",
    )
    frames = vids[0]  # [T, 3, H, W] float [0, 1]
    u8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    digest = hashlib.sha256(u8.tobytes()).hexdigest()[:16]
    print(f"frames: {frames.shape}  checksum(sha256/16): {digest}")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    try:
        save_video_direct(frames, args.out)
        print(f"saved: {args.out}")
    except Exception as e:  # noqa: BLE001 — ffmpeg-less machines still get the checksum
        np.save(args.out.replace(".mp4", ".npy"), frames)
        print(f"mp4 save failed ({e}); saved .npy instead")
    return 0


if __name__ == "__main__":
    sys.exit(main())
