"""Decode-attention kernel microbenchmark at serving shapes.

One DiT layer's self-attention at 832x480 serving shapes: q [1,4680,12,128]
over a 9360-token KV window. Round-1 baseline: 4.78 ms/layer-forward at 29%
MXU (VPU-serialized online softmax). Roofline: ~1.4 ms pure MXU.

Usage (ONE TPU process at a time):
    python bench/attn_micro.py [--xla] [--iters 50]
Tile sizes via RTV_ATTN_BQ / RTV_ATTN_BKM / RTV_ATTN_BK before import.

Timing rules for the axon tunnel (see CLAUDE.md): the whole iteration chain
runs inside ONE jit with evolving inputs (donation-chained), and the final
output is fetched to host — per-call timings of independent dispatches lie.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--xla", action="store_true", help="bench the XLA fallback")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--lq", type=int, default=4680)
    p.add_argument("--lk", type=int, default=9360)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--cross", action="store_true",
                   help="cross-attn shapes: 512-token KV, mask-free")
    p.add_argument("--prefill", action="store_true",
                   help="block-causal prefill shapes: Lq=Lk=4680, one block")
    args = p.parse_args()
    if args.cross:
        args.lk = 512
    if args.prefill:
        args.lk = args.lq

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.rtv_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from realtime_video_tpu.ops import attention as attn_ops
    from realtime_video_tpu.ops import pallas_attention as pat

    b, n, d = 1, args.heads, 128
    lq, lk = args.lq, args.lk
    key = jax.random.PRNGKey(0)
    q0 = jax.random.normal(key, (b, lq, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, lk, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, lk, n, d), jnp.bfloat16)
    lo = jnp.zeros((), jnp.int32)
    hi = jnp.asarray(lk, jnp.int32)

    if args.xla and args.cross:
        def attn(q):
            return attn_ops.xla_attention(q, k, v)  # mask-free cross-attn
        label = "xla-cross"
    elif args.xla:
        def attn(q):
            num_kv = k.shape[1]
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, num_kv), 1)
            valid = (kv_pos >= lo) & (kv_pos < hi)
            return attn_ops.xla_attention(q, k, v, mask=valid[None, None, :, :])
        label = "xla"
    elif args.prefill:
        def attn(q):
            return pat.prefill_attention(q, k, v, block_tokens=4680)
        label = f"pallas-prefill bq={pat.BQ} bkm={pat.BKM} bk={pat.BK}"
    else:
        def attn(q):
            return pat.decode_attention(q, k, v, lo, hi)
        label = f"pallas bq={pat.BQ} bkm={pat.BKM} bk={pat.BK}"

    @jax.jit
    def chain(q, iters):
        def body(_, qc):
            out = attn(qc)
            # evolve inputs so the tunnel's dispatch dedupe can't fire
            return (qc * 0.999 + out.astype(qc.dtype) * 0.01).astype(qc.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    # warmup / compile
    jax.device_get(chain(q0, 2)[0, -1, -1, :2])
    t0 = time.perf_counter()
    out = chain(q0, args.iters)
    jax.device_get(out[0, -1, -1, :2])
    dt = time.perf_counter() - t0
    per = dt / args.iters * 1e3
    flops = 2 * 2 * lq * lk * d * n  # useful flops (QK^T + PV)
    print(f"{label}: {per:.3f} ms/layer-attn  "
          f"({flops / (per * 1e-3) / 1e12:.1f} TFLOP/s useful, "
          f"{args.iters} iters, total {dt:.3f}s)")


if __name__ == "__main__":
    main()
