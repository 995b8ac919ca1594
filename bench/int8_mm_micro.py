"""DiT int8 linear microbench: the fused Pallas kernel (quantise + s8 dot +
dequant in one kernel, ops/pallas_int8_mm.py) vs the production XLA path
(quantise-write fusion -> s8 matmul -> dequant epilogue) at the serving
linear shapes (1.3B dims, 3-frame block = 4680 tokens).

Usage (ONE TPU process at a time):
    python bench/int8_mm_micro.py --shape fc1 --variant pallas [--iters 30]

Timing rules (CLAUDE.md): whole chain in one jit, evolving inputs, final
host fetch. --salt forces a fresh compile of a cached arm (fresh-vs-fresh
is the only valid ranking inside a poisoned-compile window).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    # M, K, N — block-linear shapes at 1.3B serving dims (dim 1536, ffn 8960)
    "qkv": (4680, 1536, 4608),
    "o": (4680, 1536, 1536),
    "fc1": (4680, 1536, 8960),
    "fc2": (4680, 8960, 1536),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--shape", choices=list(SHAPES), default="fc1")
    p.add_argument("--variant", choices=["xla", "pallas", "bf16"],
                   default="pallas")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--salt", type=float, default=0.0)
    p.add_argument("--check", action="store_true")
    args = p.parse_args()

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.rtv_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from realtime_video_tpu.ops import pallas_int8_mm

    M, K, N = SHAPES[args.shape]
    if args.check:
        M, K, N = 64, 128, 256
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    x0 = (jax.random.normal(k1, (M, K), jnp.float32) * 0.3).astype(jnp.bfloat16)
    w_q = jax.random.randint(k2, (K, N), -127, 128).astype(jnp.int8)
    w_bf = (w_q.astype(jnp.float32) * 2e-4).astype(jnp.bfloat16)
    w_scale = jax.random.uniform(k3, (N,), jnp.float32, 1e-4, 3e-4)
    bias = jax.random.normal(k4, (N,), jnp.float32) * 0.01
    a_scale = jnp.float32(1.1 / 127.0)

    if args.variant == "xla":
        def lin(x):
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                          -127, 127).astype(jnp.int8)
            yq = jnp.dot(xq, w_q, preferred_element_type=jnp.int32)
            return (yq.astype(jnp.float32) * (a_scale * w_scale) + bias
                    ).astype(x.dtype)
    elif args.variant == "bf16":
        def lin(x):
            return (jnp.dot(x, w_bf) + bias.astype(jnp.bfloat16)).astype(x.dtype)
    else:
        def lin(x):
            y = pallas_int8_mm.int8_linear(x, w_q, w_scale, a_scale,
                                           bias=bias, interpret=args.check)
            assert y is not None, "shapes do not tile"
            return y

    if args.check:
        import numpy as np

        xq = jnp.clip(jnp.round(x0.astype(jnp.float32) / a_scale),
                      -127, 127).astype(jnp.int8)
        want = (jnp.dot(xq, w_q, preferred_element_type=jnp.int32
                        ).astype(jnp.float32) * (a_scale * w_scale) + bias)
        got = lin(x0)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-2, atol=2e-2)
        print(f"{args.variant}: check ok")
        return

    # see conv_micro.py: a salt below one bf16 ulp is canonicalized away at
    # trace time and does NOT force a fresh compile; quantize up to >=0.004
    salt = args.salt
    if salt != 0.0:
        import math
        salt = math.copysign(max(1, round(abs(salt) / 0.004)) * 0.004, salt)
    blend = 0.98 - salt

    @jax.jit
    def chain(x, iters):
        def body(_, xc):
            y = lin(xc)
            # consume y cheaply (keeps the linear live + evolves the input)
            yk = y[:, :K] if N >= K else jnp.pad(y, ((0, 0), (0, K - N)))
            return (xc * blend + yk.astype(xc.dtype) * 0.02).astype(xc.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    xw = chain(x0, args.iters)
    jax.device_get(xw[0, :2])
    t0 = time.perf_counter()
    out = chain(xw, args.iters)
    jax.device_get(out[-1, :2])
    dt = time.perf_counter() - t0
    per = dt / args.iters * 1e3
    flops = 2 * M * K * N
    print(f"{args.shape} {args.variant}: {per:.3f} ms/linear "
          f"({flops / (per * 1e-3) / 1e12:.1f} TFLOP/s, iters {args.iters})")


if __name__ == "__main__":
    main()
