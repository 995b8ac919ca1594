"""Compiled-on-TPU numerics check: static-max decode kernel vs the XLA oracle
at serving shapes (interpret-mode tests cover CPU; this validates the Mosaic
compilation)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.rtv_jax_cache"))

from realtime_video_tpu.ops import attention as attn_ops
from realtime_video_tpu.ops import pallas_attention as pat


def main():
    b, lq, lk, n, d = 1, 4680, 9360, 12, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (b, lq, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, lk, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, lk, n, d), jnp.bfloat16)
    lo, hi = jnp.asarray(0, jnp.int32), jnp.asarray(9000, jnp.int32)

    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lk), 1)
    mask = ((kv_pos >= lo) & (kv_pos < hi))[None, None]
    want = jax.jit(lambda q, k, v: attn_ops.xla_attention(q, k, v, mask=mask))(q, k, v)

    for name, flag in [("staticmax", True), ("runningmax", False)]:
        pat.STATIC_MAX = flag
        got = jax.jit(lambda q, k, v: pat.decode_attention(q, k, v, lo, hi))(q, k, v)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        print(f"{name}: max abs err vs xla = {err:.5f}")
        assert err < 2e-2, err  # bf16 i/o tolerance
    print("COMPILED NUMERICS OK")


if __name__ == "__main__":
    main()
