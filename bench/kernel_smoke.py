"""On-chip compile smoke for the round-5 Pallas kernels at IN-MODEL shapes.

The micros compiled at their own shapes, but the fused benches failed
(pallasmm: JaxRuntimeError; pallasconv: MosaicError) somewhere inside the
block-0 program. This sweeps the kernels standalone over every shape the
model actually routes to them, printing the first failing shape + error.

Usage:  python bench/kernel_smoke.py [mm|conv|all]
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (M, K, N) for every static-scale linear in the 1.3B serving block program
MM_SHAPES = [
    ("qkv_dec", 4680, 1536, 4608),
    ("o_dec", 4680, 1536, 1536),
    ("fc1_dec", 4680, 1536, 8960),
    ("fc2_dec", 4680, 8960, 1536),
    ("xattn_q", 4680, 1536, 1536),
    ("xattn_kv_text", 512, 1536, 3072),
    ("t_emb", 3, 256, 1536),
    ("t_proj", 3, 1536, 1536),
    ("adaln", 3, 1536, 9216),
    ("head", 4680, 1536, 64),
]

# (T, Hpad, Wpad, Cin, Cout) for the decoder/encoder 3x3 spatial convs after
# temporal-tap merge (Cin = 3*C at merged taps, = C at pure-2D resblock taps)
CONV_SHAPES = [
    ("dec384_t2", 2, 122, 210, 1152, 384),
    ("dec384_t1", 1, 122, 210, 1152, 384),
    ("dec384_2d", 2, 122, 210, 384, 384),
    ("dec192", 4, 242, 418, 576, 192),
    ("dec96", 4, 482, 834, 288, 96),
    ("dec96_2d", 4, 482, 834, 96, 96),
    ("enc96", 1, 482, 834, 288, 96),
    ("out3", 4, 482, 834, 96, 3),
]


def smoke_mm():
    from realtime_video_tpu.ops import pallas_int8_mm

    ok = fail = routed_away = 0
    for name, M, K, N in MM_SHAPES:
        x = jnp.asarray(np.random.randn(M, K) * 0.1, jnp.bfloat16)
        w_q = jnp.asarray(np.random.randint(-127, 128, (K, N)), jnp.int8)
        ws = jnp.asarray(np.random.rand(N) * 0.01 + 1e-3, jnp.float32)
        asc = jnp.asarray(0.02, jnp.float32)
        b = jnp.asarray(np.random.randn(N) * 0.01, jnp.float32)
        try:
            fn = jax.jit(lambda x, w_q, ws, asc, b: pallas_int8_mm.int8_linear(
                x, w_q, ws, asc, bias=b))
            y = fn(x, w_q, ws, asc, b)
            if y is None:
                print(f"mm {name} ({M}x{K}x{N}): routed to XLA (no tile)")
                routed_away += 1
                continue
            jax.block_until_ready(y)
            print(f"mm {name} ({M}x{K}x{N}): OK")
            ok += 1
        except Exception as e:  # noqa: BLE001
            print(f"mm {name} ({M}x{K}x{N}): FAIL {type(e).__name__}")
            traceback.print_exc(limit=6)
            fail += 1
    print(f"mm: {ok} ok, {routed_away} routed-away, {fail} fail")


def smoke_conv():
    from realtime_video_tpu.ops import pallas_conv2

    ok = fail = routed_away = 0
    int8 = "--int8" in sys.argv  # the production VAE tier: s8 x s8 -> s32
    for name, T, Hp, Wp, Ci, Co in CONV_SHAPES:
        if int8:
            x = jnp.asarray(np.random.randint(-127, 128, (T, Hp, Wp, Ci)),
                            jnp.int8)
            w = jnp.asarray(np.random.randint(-127, 128, (3, 3, Ci, Co)),
                            jnp.int8)
            fn = jax.jit(lambda x, w: pallas_conv2.conv3x3(
                x, w, preferred=jnp.int32))
        else:
            x = jnp.asarray(np.random.randn(T, Hp, Wp, Ci) * 0.1, jnp.bfloat16)
            w = jnp.asarray(np.random.randn(3, 3, Ci, Co) * 0.02, jnp.bfloat16)
            fn = jax.jit(lambda x, w: pallas_conv2.conv3x3(x, w))
        try:
            y = fn(x, w)
            if y is None:
                print(f"conv {name} (T{T} {Hp}x{Wp} {Ci}->{Co}): routed to XLA (no tile)")
                routed_away += 1
                continue
            jax.block_until_ready(y)
            print(f"conv {name} (T{T} {Hp}x{Wp} {Ci}->{Co}): OK")
            ok += 1
        except Exception as e:  # noqa: BLE001
            print(f"conv {name} (T{T} {Hp}x{Wp} {Ci}->{Co}): FAIL {type(e).__name__}")
            traceback.print_exc(limit=6)
            fail += 1
    print(f"conv: {ok} ok, {routed_away} routed-away, {fail} fail")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("mm", "all"):
        smoke_mm()
    if mode in ("conv", "all"):
        smoke_conv()
