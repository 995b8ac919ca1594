"""int8 DiT linears: dynamic vs calibrated-static activation scales
(reference analog: torchao quant configs, release_server.py:179-182)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import WanModelConfig
from realtime_video_tpu.models import wan_dit
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.ops import kv_cache as kvc

CFG = WanModelConfig(dim=128, ffn_dim=256, num_heads=2, num_layers=3)
STEPS = (1000.0, 625.0)
LAT = 8
NFPB = 3
KV_FRAMES = 6


def _mk(fuse_qkv):
    return WanDiffusion(cfg=CFG, dtype=jnp.bfloat16, timestep_shift=5.0,
                        fuse_qkv=fuse_qkv, seed=3)


def _fwd(gen, params):
    fsl = CFG.frame_seq_length(LAT, LAT)
    cache = KV_FRAMES * fsl
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 512, CFG.text_dim),
                            jnp.bfloat16)
    cross = gen.compute_crossattn_cache(params, ctx)
    kv = kvc.init_kv_cache(CFG.num_layers, 1, cache, CFG.num_heads, CFG.head_dim)
    noisy = jax.random.normal(jax.random.PRNGKey(2), (1, NFPB, 16, LAT, LAT),
                              jnp.bfloat16)
    tt = jnp.full((1, NFPB), 625.0, jnp.float32)
    flow, x0, _ = gen.forward(params, noisy, cross, tt, kv_cache=kv,
                              current_start=(KV_FRAMES - NFPB) * fsl,
                              mode="decode", max_attention_size=cache)
    return np.asarray(x0, np.float32)


@pytest.mark.parametrize("fuse_qkv", [True, False])
def test_static_scales_attach_and_match(fuse_qkv):
    gen = _mk(fuse_qkv)
    ref = _fwd(gen, gen.params)

    scales = gen.calibrate_act_scales(STEPS, lat_h=LAT, lat_w=LAT,
                                      kv_frames=KV_FRAMES, nfpb=NFPB)
    n_sites = 6 if fuse_qkv else 8
    assert len(scales) == n_sites
    for (g, name), amax in scales.items():
        assert amax.shape == (CFG.num_layers,)
        assert (amax > 0).all(), (g, name)

    q_static = wan_dit.quantize_wan_linears(gen.params, act_scales=scales)
    # every calibrated site carries a stacked per-layer a_scale
    for (g, name) in scales:
        p = q_static["blocks"][g][name]
        assert "a_scale" in p and p["a_scale"].shape == (CFG.num_layers,)
    # cross-attn k/v (once-per-prompt) are quantized but NOT static-scaled
    assert "a_scale" not in q_static["blocks"]["cross_attn"]["k"]

    q_dyn = wan_dit.quantize_wan_linears(gen.params)
    out_dyn = _fwd(gen, q_dyn)
    out_static = _fwd(gen, q_static)

    def corr(a, b):
        a, b = a.ravel(), b.ravel()
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert corr(ref, out_dyn) > 0.99
    assert corr(ref, out_static) > 0.99
    # static should track dynamic closely (same weights, bounded act scales)
    assert corr(out_dyn, out_static) > 0.995


@pytest.mark.parametrize("fuse_qkv", [True, False])
def test_jit_calibration_matches_eager(fuse_qkv, monkeypatch):
    """The jit-mode calibration (amaxes as lax.scan outputs, one compiled
    program) must reproduce the eager per-layer loop's scales. The forward
    activations themselves differ by ~1 bf16 ulp between eager and compiled
    execution (XLA fusion changes intermediate rounding), so the amaxes can
    drift ~0.4% per ulp — far under the 1.5x quantisation margin."""
    gen = _mk(fuse_qkv)
    monkeypatch.setenv("RTV_CAL_JIT", "0")
    eager = gen.calibrate_act_scales(STEPS, lat_h=LAT, lat_w=LAT,
                                     kv_frames=KV_FRAMES, nfpb=NFPB)
    monkeypatch.setenv("RTV_CAL_JIT", "1")
    jitted = gen.calibrate_act_scales(STEPS, lat_h=LAT, lat_w=LAT,
                                      kv_frames=KV_FRAMES, nfpb=NFPB)
    assert set(eager) == set(jitted)
    for site in eager:
        np.testing.assert_allclose(jitted[site], eager[site],
                                   rtol=2e-2, err_msg=str(site))


def test_calibration_requires_float_params():
    gen = _mk(True)
    gen.params = wan_dit.quantize_wan_linears(gen.params)
    with pytest.raises(AssertionError):
        gen.calibrate_act_scales(STEPS, lat_h=LAT, lat_w=LAT)


def test_rcp_quantize_matches_divide(monkeypatch):
    """RTV_Q_RCP (reciprocal-multiply quantise) tracks the divide form:
    identical up to 1-LSB rounding flips at exact-half quanta."""
    gen = _mk(True)
    scales = gen.calibrate_act_scales(STEPS, lat_h=LAT, lat_w=LAT,
                                      kv_frames=KV_FRAMES, nfpb=NFPB)
    q = wan_dit.quantize_wan_linears(gen.params, act_scales=scales)

    out_div = _fwd(gen, q)
    monkeypatch.setattr(wan_dit, "_Q_RCP", True)
    jax.clear_caches()  # the flag is read at trace time
    out_rcp = _fwd(gen, q)
    jax.clear_caches()

    def corr(a, b):
        a, b = a.ravel(), b.ravel()
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert corr(out_div, out_rcp) > 0.9999


def test_bf16_quantize_tracks_f32(monkeypatch):
    """RTV_Q_BF16 (bf16-arithmetic quantise) tracks the f32 form: the scaled
    value carries <=0.4% relative error before rounding, so quanta can shift
    1 LSB — same order as the quantisation noise itself."""
    gen = _mk(True)
    scales = gen.calibrate_act_scales(STEPS, lat_h=LAT, lat_w=LAT,
                                      kv_frames=KV_FRAMES, nfpb=NFPB)
    q = wan_dit.quantize_wan_linears(gen.params, act_scales=scales)

    out_f32 = _fwd(gen, q)
    monkeypatch.setattr(wan_dit, "_Q_BF16", True)
    jax.clear_caches()  # the flag is read at trace time
    out_bf16 = _fwd(gen, q)
    jax.clear_caches()

    def corr(a, b):
        a, b = a.ravel(), b.ravel()
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert corr(out_f32, out_bf16) > 0.999
