"""Split-device serving: the VAE pinned to a second chip (decode overlaps the
next block's denoise — the TPU equivalent of the reference's CUDA-stream
overlap, release_server.py:727-729). Math must be identical to the
single-device path; outputs must land on the right devices (decode frames on
the VAE chip, encode latents back on the DiT chip)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import VAEConfig
from realtime_video_tpu.models import vae as vae_mod
from realtime_video_tpu.models.vae_wrapper import VAEWrapper

CFG = VAEConfig(dim=8, z_dim=16, dim_mult=(1, 1, 2, 2), num_res_blocks=1)


@pytest.fixture(scope="module")
def wrappers():
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices (virtual CPU mesh)")
    params = vae_mod.init_vae_params(jax.random.PRNGKey(3), CFG, jnp.float32)
    base = VAEWrapper(cfg=CFG, params=params)
    split = VAEWrapper(cfg=CFG, params=params, device=jax.devices()[1])
    return base, split


def test_decode_matches_and_lands_on_vae_device(wrappers):
    base, split = wrappers
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 16, 8, 8), jnp.float32)
    want, wc = base.decode_block(z)
    got, gc = split.decode_block(z)
    assert got.devices() == {jax.devices()[1]}
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    # streaming continuation stays on the VAE device too
    want2, _ = base.decode_block(z, wc)
    got2, _ = split.decode_block(z, gc)
    assert got2.devices() == {jax.devices()[1]}
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-5, atol=1e-5)


def test_encode_returns_to_dit_device(wrappers):
    base, split = wrappers
    px = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 3, 32, 32), jnp.float32)
    want = base.encode_to_latent(px)
    got = split.encode_to_latent(px)
    assert got.devices() == {jax.devices()[0]}
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    # the anti-drift path encodes pixels that live on the VAE device (they
    # came from decode) — must still land back on the DiT device
    px_on_vae = jax.device_put(px, jax.devices()[1])
    got2 = split.encode_to_latent(px_on_vae)
    assert got2.devices() == {jax.devices()[0]}
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_spatially_sharded_decode_matches():
    """VAE decode sharded over H across a 4-chip "sp" mesh (GSPMD inserts
    the conv halo exchanges): outputs equal the single-device decode, for
    the first call AND a streaming continuation with the sharded cache."""
    import numpy as np
    from jax.sharding import Mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    params = vae_mod.init_vae_params(jax.random.PRNGKey(3), CFG, jnp.float32)
    base = VAEWrapper(cfg=CFG, params=params)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    sharded = VAEWrapper(cfg=CFG, params=params, mesh=mesh)

    z = jax.random.normal(jax.random.PRNGKey(6), (1, 2, 16, 16, 16), jnp.float32)
    want, wc = base.decode_block(z)
    got, gc = sharded.decode_block(z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
    want2, _ = base.decode_block(z, wc)
    got2, _ = sharded.decode_block(z, gc)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-4, atol=1e-4)
    # the halo exchange actually ran sharded: pixels live on all 4 chips
    assert len(got2.devices()) == 4
