"""Characterize the compile-service sickness flavor (round 4).

Observed 2026-08-18/19: fresh 2k-matmul fori_loop chains read ~45 TFLOP/s
while fresh 4k chains read ~132 — both consistent with chips at full speed
PLUS a fixed ~300 us stall per LOOP ITERATION in freshly compiled
executables. This probe tests that model directly on one fresh executable:

  1. time chain(x, iters) for iters in {1, 10, 100} -> fit t = a + b*iters;
     b >> the 90 us MXU time for a 2k matmul means per-iteration stall.
  2. compile a FULLY UNROLLED 100-matmul program (no fori_loop) fresh and
     time it: if it runs at ~full speed, sick-window compiles can be dodged
     by unrolling hot scans (RTV_DIT_UNROLL for the DiT layer scan).

Usage: python bench/stall_probe.py   (ONE TPU process at a time!)
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")


def main() -> None:
    import jax
    import jax.numpy as jnp

    n = 2048
    mxu_s = 2 * n**3 / 190e12  # ~90 us: one 2k matmul at calibrated peak
    salt = 1.0 + (time.time() % 1000.0) * 1e-9
    w = jax.random.normal(jax.random.PRNGKey(5), (n, n), jnp.bfloat16) * 0.01

    @jax.jit
    def chain(a, iters):
        return jax.lax.fori_loop(
            0, iters, lambda _, ac: (ac @ w * salt).astype(ac.dtype), a
        )

    a0 = jax.random.normal(jax.random.PRNGKey(6), (n, n), jnp.bfloat16)
    t0 = time.time()
    x = chain(a0, 100)
    jax.device_get(x[0, :2])
    print(f"loop-chain fresh compile: {time.time() - t0:.1f}s")

    # evolving inputs (dispatch-dedupe rule); each timing forces a readback
    times = {}
    for iters in (1, 10, 100, 100, 10, 1):
        t0 = time.perf_counter()
        x = chain(x, iters)
        jax.device_get(x[0, :2])
        dt = time.perf_counter() - t0
        times.setdefault(iters, []).append(dt)
    t1 = min(times[1])
    t10 = min(times[10])
    t100 = min(times[100])
    per_iter = (t100 - t10) / 90.0
    print(f"loop t1={t1*1e3:.1f}ms t10={t10*1e3:.1f}ms t100={t100*1e3:.1f}ms")
    print(f"per-iteration cost {per_iter*1e6:.0f}us (MXU ideal ~{mxu_s*1e6:.0f}us)"
          f" -> stall {max(0.0, per_iter - mxu_s)*1e6:.0f}us/iter")

    salt2 = salt + 1e-9

    @jax.jit
    def unrolled(a):
        for _ in range(100):
            a = (a @ w * salt2).astype(a.dtype)
        return a

    t0 = time.time()
    y = unrolled(a0)
    jax.device_get(y[0, :2])
    print(f"unrolled fresh compile: {time.time() - t0:.1f}s")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y = unrolled(y)
        jax.device_get(y[0, :2])
        best = min(best, time.perf_counter() - t0)
    tf = 2 * n**3 * 100 / best / 1e12
    print(f"unrolled 100-matmul: {best*1e3:.1f}ms = {tf:.0f} TFLOP/s "
          f"(loop-form equivalent: {2*n**3*100/t100/1e12:.0f})")
    if tf > 1.5 * (2 * n**3 * 100 / t100 / 1e12):
        print("VERDICT: stall is per-loop-iteration — unrolling dodges it")
    else:
        print("VERDICT: unrolling does not dodge the degradation")


if __name__ == "__main__":
    main()
