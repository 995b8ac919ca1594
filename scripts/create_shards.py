"""Pack loose ODE-pair .npy/.npz records into training shards.

Replaces the reference's scripts/create_lmdb_iterative.py /
create_lmdb_14b_shards.py (LMDB packing) with the native npz-shard tier; use
--lmdb to write LMDB when the package is available.

  python scripts/create_shards.py --src ode_dumps/ --out shards/ --shard-size 64
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_video_tpu.utils.dataset import save_ode_shard  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="dir of per-item .npz dumps")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shard-size", type=int, default=64)
    ap.add_argument("--lmdb", action="store_true")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.src, "*.npz")))
    os.makedirs(args.out, exist_ok=True)
    records, shard_idx = [], 0
    for f in files:
        data = np.load(f, allow_pickle=True)
        n = int(data["num_items"]) if "num_items" in data else 1
        for i in range(n):
            records.append({
                "ode_latent": data[f"ode_latent_{i}"] if n > 1 else data["ode_latent"],
                "prompts": str(data[f"prompts_{i}"] if n > 1 else data["prompts"]),
            })
            if len(records) >= args.shard_size:
                _flush(records, args, shard_idx)
                records, shard_idx = [], shard_idx + 1
    if records:
        _flush(records, args, shard_idx)
    print(f"wrote {shard_idx + 1} shards to {args.out}")


def _flush(records, args, shard_idx):
    if args.lmdb:
        import lmdb

        from realtime_video_tpu.utils.lmdb_io import store_arrays_to_lmdb

        path = os.path.join(args.out, f"shard{shard_idx:04d}")
        env = lmdb.open(path, map_size=1 << 40)
        store_arrays_to_lmdb(
            env,
            {
                "latents": np.stack([r["ode_latent"] for r in records]),
                "prompts": [r["prompts"] for r in records],
            },
        )
        with env.begin(write=True) as txn:
            txn.put(b"length", str(len(records)).encode())
        env.close()
    else:
        save_ode_shard(os.path.join(args.out, f"shard_{shard_idx:04d}.npz"), records)


if __name__ == "__main__":
    main()
