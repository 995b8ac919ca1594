"""Smoke-test the two driver-facing artifacts nothing else in the suite runs:

- bench.py (tiny CPU tier): must print exactly one parseable JSON line with
  the fps metric, a positive value, and the ttff_ms field (BASELINE.md north
  star #2) even when the full-size path is unavailable.
- __graft_entry__.entry(): must return a jittable fn + example args (the
  driver compile-checks this single-chip every round).

Both run in subprocesses: bench.py and __graft_entry__ set platform/env at
import time, which must not leak into (or inherit from) the suite's jax
config.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_tiny_cpu_emits_metric_json(tmp_path):
    env = dict(
        os.environ,
        RTV_BENCH_CPU="1",
        RTV_BENCH_TINY="1",
        JAX_PLATFORMS="",
        PYTHONPATH=REPO,
        # keep the suite's CPU programs out of the TPU program cache (its
        # timestamps drive the sick-window purge forensics)
        RTV_JAX_CACHE_DIR=str(tmp_path / "jax_cache"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, f"expected ONE JSON line, got: {out.stdout!r}"
    rec = json.loads(lines[0])
    assert rec["unit"] == "fps" and rec["value"] > 0
    assert "t2v_fps" in rec["metric"] and "tiny" in rec["metric"]
    assert rec["ttff_ms"] > 0
    # vs_baseline comes from the UNROUNDED fps; recomputing from the rounded
    # value can differ in the last digit, so compare with tolerance
    assert rec["vs_baseline"] > 0
    assert abs(rec["vs_baseline"] - rec["value"] / 11.0) < 1e-3


def test_graft_entry_jits():
    code = (
        "import os; os.environ['JAX_PLATFORMS']='';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import __graft_entry__ as g;"
        "fn, args = g.entry();"
        "x0, kv = jax.jit(fn)(*args);"
        "assert x0.shape == args[3].shape, x0.shape;"
        "print('OK')"
    )
    env = dict(os.environ, RTV_GRAFT_TINY="1", PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().endswith("OK")


def test_run_real_checkpoint_graceful_skip(tmp_path):
    """scripts/run_real_checkpoint.py must exit 0 with a clear message when
    the ~30 GB weight set is absent (the documented degrade path)."""
    env = dict(os.environ, MODEL_FOLDER=str(tmp_path), PYTHONPATH=REPO,
               JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_real_checkpoint.py")],
        env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert out.returncode == 0, (out.stdout[-500:], out.stderr[-500:])
    blob = (out.stdout + out.stderr).lower()
    assert "checkpoint" in blob or "weight" in blob
