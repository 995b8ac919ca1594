"""Compile-service health probe.

Compiles a UNIQUE (per-invocation salt) 2k-matmul chain and times compile +
execution. Healthy: compile < ~60s, execution > 100 TFLOP/s. The failure
mode this detects (seen 2026-08-16 23:43+): compiles take 10+ min AND the
produced executables run ~16x slow, while earlier-compiled programs still
execute at full speed. Until a probe comes back healthy, do not trust any
freshly compiled measurement and purge cache entries it created:
  find ~/.rtv_jax_cache -newermt <window-start> -delete
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")


def main() -> None:
    salt = float(sys.argv[1]) if len(sys.argv) > 1 else time.time() % 1000
    import jax
    import jax.numpy as jnp

    # NOTE: deliberately no persistent cache — each probe must compile fresh
    n = 2048
    w = jax.random.normal(jax.random.PRNGKey(5), (n, n), jnp.bfloat16) * 0.01
    c = 1.0 + salt * 1e-9

    @jax.jit
    def chain(a, iters):
        return jax.lax.fori_loop(
            0, iters, lambda _, ac: (ac @ w * c).astype(ac.dtype), a
        )

    a0 = jax.random.normal(jax.random.PRNGKey(6), (n, n), jnp.bfloat16)
    t0 = time.time()
    aw = chain(a0, 100)
    jax.device_get(aw[0, :2])
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    out = chain(aw, 100)
    jax.device_get(out[0, :2])
    dt = time.perf_counter() - t0
    tf = 2 * n**3 * 100 / dt / 1e12
    healthy = compile_s < 120 and tf > 80
    print(f"compile {compile_s:.1f}s, exec {tf:.0f} TFLOP/s -> "
          f"{'HEALTHY' if healthy else 'SICK'}")


if __name__ == "__main__":
    main()
