"""14B-scale readiness (VERDICT item 4 round-1 gap): prove the north-star
config is runnable, not just the toy dims.

  * eval_shape memory plan: the full 14B (dim 5120, ffn 13824, 40x40,
    wan_t2v_14B.py:22-27) sharded tp=8 fits a v5p chip AND a v5e chip,
    at the worst-case 21-frame attention window (README.md:32).
  * a real sharded forward at 14B layer dims (2 layers) on the 8-device CPU
    mesh — the per-layer matmul/attention shapes and collectives of the
    north-star config compile and execute.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import WAN_CONFIGS, WanModelConfig
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.ops import kv_cache as kvc
from realtime_video_tpu.parallel.mesh import make_mesh
from realtime_video_tpu.parallel.plan import (
    HBM_BYTES,
    serving_memory_plan,
    shard_for_serving,
)


def test_14b_plan_fits_v5p_and_v5e_at_tp8():
    cfg = WAN_CONFIGS["t2v-14B"]
    plan = serving_memory_plan(cfg, tp=8, window_frames=21)
    # sanity: full model ~28 GB bf16 (README.md:31) -> ~3.5 GB/chip at tp=8
    assert 2.5e9 < plan.dit_params < 4.5e9, plan.table()
    # KV at the 21-frame window: reference quotes up to 25 GB unsharded
    assert 8 * plan.kv_cache > 20e9, plan.table()
    assert plan.fits("v5p"), plan.table()
    assert plan.fits("v5e"), plan.table()


def test_14b_plan_does_not_fit_one_chip():
    """Cross-check the plan isn't vacuous: tp=1 must NOT fit a v5e."""
    cfg = WAN_CONFIGS["t2v-14B"]
    plan = serving_memory_plan(cfg, tp=1, window_frames=21)
    assert plan.total > HBM_BYTES["v5e"], plan.table()


def test_14b_layer_dims_sharded_forward_runs():
    """One decode forward at true 14B layer dims (dim 5120, ffn 13824,
    40 heads) x 2 layers, tp=8, tiny spatial dims — executes on the CPU mesh
    and matches the single-device result."""
    assert jax.device_count() >= 8
    cfg = WanModelConfig(dim=5120, ffn_dim=13824, num_heads=40, num_layers=2)
    gen = WanDiffusion(cfg=cfg, dtype=jnp.float32, seed=0)
    F, C, H, W = 3, 16, 8, 8
    fsl = cfg.frame_seq_length(H, W)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, cfg.text_dim), jnp.float32)
    cross = gen.compute_crossattn_cache(gen.params, ctx)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, F, C, H, W), jnp.float32) * 0.1
    t = jnp.full((1, F), 500.0, jnp.float32)
    kv = kvc.init_kv_cache(cfg.num_layers, 1, 2 * F * fsl, cfg.num_heads,
                           cfg.head_dim, jnp.float32)

    def run(p, k, c):
        _, x0, new_kv = gen.forward(
            p, x, c, t, kv_cache=k, current_start=0,
            mode="decode", max_attention_size=2 * F * fsl,
        )
        return x0, new_kv

    ref_x0, _ = jax.jit(run)(gen.params, kv, cross)

    mesh = make_mesh({"tp": 8})
    sp, skv, scross = shard_for_serving(gen.params, kv, cross, mesh)
    got_x0, new_kv = jax.jit(run)(sp, skv, scross)
    np.testing.assert_allclose(np.asarray(got_x0), np.asarray(ref_x0),
                               rtol=2e-4, atol=2e-4)
    assert "tp" in str(new_kv["k"].sharding)
