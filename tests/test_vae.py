"""Causal 3D VAE: streaming-cache consistency properties.

Golden property (no reference weights needed): decoding/encoding a clip in
streaming chunks with threaded conv caches must equal one pass over the full
clip — this is exactly what the reference's feat_cache machinery guarantees
(wan/modules/vae.py:491-567, demo_utils/vae_block3.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import VAE_CONFIGS
from realtime_video_tpu.models import vae

CFG = VAE_CONFIGS["vae-tiny"]


@pytest.fixture(scope="module")
def params():
    return vae.init_vae_params(jax.random.PRNGKey(0), CFG)


def test_encode_shapes_temporal_law(params):
    """1 + 4k pixel frames -> 1 + k latents; /8 spatial (vae.py:491-517)."""
    video = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 32, 32, 3))
    z, _ = vae.encode_chunks(CFG, params, video)
    assert z.shape == (1, 3, 4, 4, CFG.z_dim)


def test_decode_shapes_temporal_law(params):
    """n latents decode to 1 + 4(n-1) frames on a fresh cache, then 4n per
    streaming block (release_server.py:722-723 relies on this)."""
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4, 4, CFG.z_dim)) * 0.1
    px, cache = vae.decode_chunks(CFG, params, z, None, first=True)
    assert px.shape == (1, 9, 32, 32, 3)
    z2 = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4, 4, CFG.z_dim)) * 0.1
    px2, cache = vae.decode_chunks(CFG, params, z2, cache, first=False)
    assert px2.shape == (1, 12, 32, 32, 3)


def test_streaming_decode_equals_full_decode(params):
    """Block-by-block decode with persistent cache == decoding all latents in
    one call (both chunk internally frame-by-frame; cache must round-trip)."""
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 4, 4, CFG.z_dim)) * 0.1
    full, _ = vae.decode_chunks(CFG, params, z, None, first=True)

    px0, cache = vae.decode_chunks(CFG, params, z[:, :3], None, first=True)
    px1, cache = vae.decode_chunks(CFG, params, z[:, 3:], cache, first=False)
    seq = jnp.concatenate([px0, px1], axis=1)
    assert seq.shape == full.shape
    np.testing.assert_allclose(np.asarray(seq), np.asarray(full), rtol=1e-4, atol=1e-4)


def test_streaming_encode_equals_full_encode(params):
    """Webcam-style streaming encode (4-frame chunks against a warm cache) ==
    one full encode (vae_block3.py:133-175 semantics)."""
    video = jax.random.normal(jax.random.PRNGKey(5), (1, 17, 32, 32, 3))
    full, _ = vae.encode_chunks(CFG, params, video)

    z0, cache = vae.encode_chunks(CFG, params, video[:, :9])  # 1+4+4 fresh
    z1, cache = vae.encode_chunks(CFG, params, video[:, 9:], cache, stream=True)
    seq = jnp.concatenate([z0, z1], axis=1)
    assert seq.shape == full.shape
    np.testing.assert_allclose(np.asarray(seq), np.asarray(full), rtol=1e-4, atol=1e-4)


def test_encode_decode_roundtrip_finite(params):
    video = jax.random.normal(jax.random.PRNGKey(6), (1, 5, 32, 32, 3))
    z = vae.encode_to_latent(CFG, params, video.transpose(0, 1, 4, 2, 3))
    assert z.shape == (1, 2, CFG.z_dim, 4, 4)
    px = vae.decode_to_pixel(CFG, params, z)
    assert px.shape == (1, 5, 3, 32, 32)
    assert np.isfinite(np.asarray(px)).all()
    assert np.abs(np.asarray(px)).max() <= 1.0


def test_fused_upsample_conv_matches_unfused():
    """fuse_decoder_upsample is an exact rewrite: streaming decode with fused
    phase kernels == the nearest-upsample + conv path, bit-for-bit at f32."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from realtime_video_tpu.config import VAEConfig
    from realtime_video_tpu.models import vae as vae_mod

    cfg = VAEConfig(dim=16, z_dim=8, dim_mult=(1, 2, 4, 4), num_res_blocks=1)
    params = vae_mod.init_vae_params(jax.random.PRNGKey(11), cfg, jnp.float32)
    fused = vae_mod.fuse_decoder_upsample(params)
    z = jax.random.normal(jax.random.PRNGKey(12), (1, 3, 6, 8, cfg.z_dim), jnp.float32)

    want0, wc = vae_mod.decode_chunks(cfg, params, z[:, :1], None, first=True)
    want1, _ = vae_mod.decode_chunks(cfg, params, z[:, 1:], wc, first=False)
    got0, gc = vae_mod.decode_chunks(cfg, fused, z[:, :1], None, first=True)
    got1, _ = vae_mod.decode_chunks(cfg, fused, z[:, 1:], gc, first=False)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), rtol=1e-5, atol=1e-5)


def test_fused_upsample_conv_int8_composes():
    """quantize_vae_params after fusion keeps the fused layout working."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from realtime_video_tpu.config import VAEConfig
    from realtime_video_tpu.models import vae as vae_mod

    cfg = VAEConfig(dim=16, z_dim=8, dim_mult=(1, 2, 4, 4), num_res_blocks=1)
    params = vae_mod.init_vae_params(jax.random.PRNGKey(11), cfg, jnp.float32)
    fused_q = vae_mod.quantize_vae_params(vae_mod.fuse_decoder_upsample(params))
    z = jax.random.normal(jax.random.PRNGKey(12), (1, 2, 6, 8, cfg.z_dim), jnp.float32)
    # int8 grids differ between the fused/unfused kernels, so compare the
    # fused-int8 output against the FLOAT reference within int8 tolerance
    # (same bar the plain int8 path is held to in test_vae_int8.py)
    want, _ = vae_mod.decode_chunks(cfg, params, z, None, first=True)
    got, _ = vae_mod.decode_chunks(cfg, fused_q, z, None, first=True)
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert np.mean(err) < 0.02, np.mean(err)
    assert np.max(err) < 0.25, np.max(err)


import pytest as _pytest


@_pytest.mark.parametrize("variant", ["shifted", "wcol", "im2col", "threeconv", "phase"])
def test_conv_variant_matches_conv(params, monkeypatch, variant):
    """RTV_VAE_CONV formulations (shifted = 9 shift+einsum matmuls, no conv
    engine; threeconv = per-tap convs, no tap-concat) must be numerically
    equivalent to the wide-conv formulation — both for the fresh first chunk
    (T=1 tap-skip path) and a streaming chunk."""
    import numpy as np

    z = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 8, 8, CFG.z_dim), jnp.float32)
    ref0, rc = vae.decode_chunks(CFG, params, z[:, :1], None, first=True)
    ref1, _ = vae.decode_chunks(CFG, params, z[:, 1:], rc, first=False)
    video = jax.random.uniform(jax.random.PRNGKey(4), (1, 5, 32, 32, 3), jnp.float32)
    refz, _ = vae.encode_chunks(CFG, params, video)

    monkeypatch.setattr(vae, "_CONV_VARIANT", variant)
    got0, gc = vae.decode_chunks(CFG, params, z[:, :1], None, first=True)
    got1, _ = vae.decode_chunks(CFG, params, z[:, 1:], gc, first=False)
    gotz, _ = vae.encode_chunks(CFG, params, video)

    np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gotz), np.asarray(refz), rtol=2e-4, atol=2e-4)


def test_conv_variant_per_width_map(params, monkeypatch):
    """RTV_VAE_CONV accepts a Cout-keyed map ("8:wcol,default:shifted") so a
    mixed sweep winner is adoptable per decoder stage. "CIxCO" keys bind
    tighter than "CO" — they separate the T=1 tap-skip convs (Cin=C) from the
    3C-tapped streaming convs at the same Cout (the enc* sweep arms)."""
    import numpy as np

    z = jax.random.normal(jax.random.PRNGKey(6), (1, 1, 8, 8, CFG.z_dim), jnp.float32)
    ref, _ = vae.decode_chunks(CFG, params, z, None, first=True)
    monkeypatch.setattr(vae, "_CONV_VARIANT", "8:wcol,16:threeconv,default:shifted")
    got, _ = vae.decode_chunks(CFG, params, z, None, first=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    # CIxCO keys: T=1 first chunk runs the tap-skip path (Cin=8 at Cout=8),
    # streaming chunks run tapped (Cin=24 at Cout=8) — different variants
    monkeypatch.setattr(
        vae, "_CONV_VARIANT", "8x8:shifted,24x8:wcol,16:threeconv,default:conv")
    z2 = jax.random.normal(jax.random.PRNGKey(7), (1, 2, 8, 8, CFG.z_dim), jnp.float32)
    ref0, rc = vae.decode_chunks(CFG, params, z2[:, :1], None, first=True)
    ref1, _ = vae.decode_chunks(CFG, params, z2[:, 1:], rc, first=False)
    monkeypatch.setattr(vae, "_CONV_VARIANT", "conv")
    want0, wc = vae.decode_chunks(CFG, params, z2[:, :1], None, first=True)
    want1, _ = vae.decode_chunks(CFG, params, z2[:, 1:], wc, first=False)
    np.testing.assert_allclose(np.asarray(ref0), np.asarray(want0), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ref1), np.asarray(want1), rtol=2e-4, atol=2e-4)


@_pytest.mark.parametrize("variant", ["shifted", "wcol", "phase"])
def test_shifted_conv_variant_matches_conv_int8(params, monkeypatch, variant):
    """The int8 tier under the matmul formulations: identical quantised math
    (same a_scale decisions), so outputs must match the int8 conv path."""
    import numpy as np

    qp = vae.quantize_vae_params(params)
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 8, 8, CFG.z_dim), jnp.float32)
    ref, _ = vae.decode_chunks(CFG, qp, z, None, first=True)
    monkeypatch.setattr(vae, "_CONV_VARIANT", variant)
    got, _ = vae.decode_chunks(CFG, qp, z, None, first=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
