"""Manual WebSocket smoke client (reference: test_client.py).

Connects to /session/{id}, sends GenerateParams, counts received JPEG frames;
optionally pushes an image periodically (webcam emulation).

Usage: python test_client.py [ws://localhost:8000] [--image path] [--prompt ...]
"""
from __future__ import annotations

import argparse
import asyncio
import time

import websockets
from msgpack import packb


async def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("url", nargs="?", default="ws://localhost:8000")
    ap.add_argument("--prompt", default="a cat surfing a wave, cinematic")
    ap.add_argument("--image", default=None, help="push this image every 3s")
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    uri = f"{args.url}/session/test123"
    params = {
        "prompt": args.prompt,
        "width": 832,
        "height": 480,
        "seed": 0,
        "num_blocks": args.blocks,
        "num_denoising_steps": args.steps,
        "kv_cache_num_frames": 3,
    }

    async with websockets.connect(uri, max_size=None) as ws:
        print("connected", uri)
        frames = 0
        t0 = time.time()
        sent_params = False
        image_task = None

        async def push_images():
            with open(args.image, "rb") as f:
                data = f.read()
            while True:
                await asyncio.sleep(3)
                await ws.send(packb({"image": data, "strength": 0.7,
                                     "timestamp": time.time() * 1000}))
                print("pushed image")

        async for msg in ws:
            if isinstance(msg, (bytes, bytearray)):
                frames += 1
                if frames % 12 == 0:
                    dt = time.time() - t0
                    print(f"{frames} frames, {frames/dt:.2f} fps")
            else:
                print("server:", msg)
                if not sent_params:
                    await ws.send(packb(params))
                    sent_params = True
                    t0 = time.time()
                    if args.image:
                        image_task = asyncio.create_task(push_images())
                if '"completed"' in str(msg) and sent_params and frames:
                    break
        if image_task:
            image_task.cancel()
        print(f"done: {frames} frames in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    asyncio.run(main())
