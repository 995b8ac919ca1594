"""int8 VAE tier: quantized decode tracks the bf16 decode closely and the
streaming-cache property still holds under quantization."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import VAEConfig
from realtime_video_tpu.models import vae as vae_mod

CFG = VAEConfig(dim=8, z_dim=16, dim_mult=(1, 1, 2, 2), num_res_blocks=1)


@pytest.fixture(scope="module")
def params():
    return vae_mod.init_vae_params(jax.random.PRNGKey(0), CFG)


def test_int8_decode_tracks_fp(params):
    q = vae_mod.quantize_vae_params(params)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4, 4, CFG.z_dim)) * 0.1
    full, _ = vae_mod.decode_chunks(CFG, params, z, None, first=True)
    quant, _ = vae_mod.decode_chunks(CFG, q, z, None, first=True)
    a, b = np.asarray(full), np.asarray(quant)
    assert a.shape == b.shape
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.99, corr


def test_int8_streaming_consistency(params):
    q = vae_mod.quantize_vae_params(params)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 4, 4, CFG.z_dim)) * 0.1
    full, _ = vae_mod.decode_chunks(CFG, q, z, None, first=True)
    p0, cache = vae_mod.decode_chunks(CFG, q, z[:, :3], None, first=True)
    p1, cache = vae_mod.decode_chunks(CFG, q, z[:, 3:], cache, first=False)
    seq = jnp.concatenate([p0, p1], axis=1)
    # activation scales are per-call (chunk boundaries shift them slightly)
    a, b = np.asarray(seq), np.asarray(full)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.995


def test_quantize_preserves_structure(params):
    q = vae_mod.quantize_vae_params(params)
    # 3x3 convs quantized, 1x1 untouched
    assert "w_q" in q["decoder"]["conv1"]
    assert "w" in q["conv2"]  # 1x1x1 stays fp
    assert q["decoder"]["conv1"]["w_q"].dtype == jnp.int8


def test_int8_static_act_scales(params):
    """Calibrated static activation scales (the TRT-calibration analog):
    quantize with act_scales -> every quantized conv carries a_scale, no
    dynamic amax pass runs, and the decode still tracks the float output."""
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 4, 4, CFG.z_dim)) * 0.1
    scales = vae_mod.calibrate_vae_act_scales(CFG, params, z)
    assert scales and all(v > 0 for v in scales.values())
    q = vae_mod.quantize_vae_params(params, act_scales=scales)
    assert "a_scale" in q["decoder"]["conv1"]

    quant, _ = vae_mod.decode_chunks(CFG, q, z, None, first=True)
    full, _ = vae_mod.decode_chunks(CFG, params, z, None, first=True)
    a, b = np.asarray(full), np.asarray(quant)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99

    # streaming continuation exercises the static path with a warm cache
    p0, cache = vae_mod.decode_chunks(CFG, q, z[:, :1], None, first=True)
    p1, _ = vae_mod.decode_chunks(CFG, q, z[:, 1:], cache, first=False)
    assert np.isfinite(np.asarray(p1)).all()


def test_qcat_toggle_bit_exact(params, monkeypatch):
    """Quantize-before-tap-concat (_QCAT, default on) is bit-for-bit equal to
    concat-then-quantize: per-tensor quantisation is pointwise and every
    frame appears in at least one tap, so amax is unchanged. bench's
    poisoning probe relies on this to flip _QCAT off losslessly."""
    q = vae_mod.quantize_vae_params(params)
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 6, 4, 4, CFG.z_dim)) * 0.1
    monkeypatch.setattr(vae_mod, "_QCAT", True)
    on, _ = vae_mod.decode_chunks(CFG, q, z, None, first=True)
    monkeypatch.setattr(vae_mod, "_QCAT", False)
    off, _ = vae_mod.decode_chunks(CFG, q, z, None, first=True)
    np.testing.assert_array_equal(np.asarray(on), np.asarray(off))


def test_rcp_quantize_act_matches_divide(monkeypatch):
    """vae._Q_RCP reciprocal-multiply quantise tracks the divide form."""
    import numpy as np

    from realtime_video_tpu.models import vae as vae_mod

    x = jax.random.normal(jax.random.PRNGKey(7), (4, 32, 32, 16), jnp.float32) * 3
    p = {"a_scale": jnp.float32(3.0 / 127.0)}
    xq_div, s_div = vae_mod._quantize_act(p, x)
    monkeypatch.setattr(vae_mod, "_Q_RCP", True)
    xq_rcp, s_rcp = vae_mod._quantize_act(p, x)
    assert float(s_div) == float(s_rcp)
    diff = np.abs(np.asarray(xq_div, np.int32) - np.asarray(xq_rcp, np.int32))
    assert diff.max() <= 1  # only exact-half rounding flips
    assert (diff > 0).mean() < 0.01
