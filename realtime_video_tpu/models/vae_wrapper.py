"""VAE wrapper classes with jitted streaming entry points.

Replaces the reference's three wrappers with one pair:
  * `VAEWrapper.encode_to_latent / decode_to_pixel` — batch API
    (utils/wan_wrapper.py:58-118 WanVAEWrapper);
  * `VAEWrapper.decode_block / encode_stream` — streaming API with explicit
    cache pytrees (demo_utils/vae_block3.py VAEDecoderWrapper/VAEEncoderWrapper,
    the ones the server hot loop uses).

Layouts: public API uses the pipeline convention [B, T, C, H, W]; pixels in
[-1, 1].
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from realtime_video_tpu.config import VAEConfig, VAE_CONFIGS, MODEL_FOLDER
from realtime_video_tpu.models import vae as vae_mod

Params = Dict[str, Any]


class VAEWrapper:
    def __init__(
        self,
        cfg: Optional[VAEConfig] = None,
        params: Optional[Params] = None,
        checkpoint_path: Optional[str] = None,
        dtype=jnp.float32,
        seed: int = 0,
        device=None,
        dit_device=None,
        mesh=None,
    ):
        """device: pin VAE params + compute to a second chip so streaming
        decode runs CONCURRENTLY with the next block's denoise on chip 0 —
        the TPU answer to the reference's CUDA-stream decode overlap
        (release_server.py:727-729, 978-1007). On one TensorCore programs
        serialize, so the overlap needs a second device, not host async.
        Decode outputs stay on `device` (they head to the host as JPEGs);
        encode outputs are committed to `dit_device` (default jax.devices()[0])
        because they feed the DiT context on chip 0.

        mesh: a 1-axis Mesh ("sp") — SPATIALLY shard the decode over its
        chips: latents/pixels/conv caches split along H, GSPMD inserts the
        conv halo exchanges (collective-permutes over ICI) automatically.
        Decode time scales ~1/N. Composes with the overlap pattern by
        building the mesh from chips 1..N while the DiT owns chip 0
        (equality-tested on the virtual CPU mesh)."""
        if params is None and checkpoint_path and os.path.exists(checkpoint_path):
            from realtime_video_tpu.utils.checkpoint import load_vae

            cfg, params = load_vae(checkpoint_path, cfg, dtype)
        if cfg is None:
            cfg = VAE_CONFIGS["wan2.1"]
        if params is None:
            params = vae_mod.init_vae_params(jax.random.PRNGKey(seed), cfg, dtype)
        if os.getenv("RTV_VAE_FUSEUP", "0") in ("1", "true"):
            # exact upsample+conv phase fusion (see fuse_decoder_upsample).
            # OFF by default: measured 280 ms/block SLOWER on v5e — the
            # depth-to-space de-interleave is a lane/sublane relayout XLA
            # schedules as a big transpose, outweighing the wider MXU tiles.
            params = vae_mod.fuse_decoder_upsample(params)
        self.cfg = cfg
        self.device = device
        self.mesh = mesh
        offloaded = device is not None or mesh is not None
        self.dit_device = dit_device or (jax.devices()[0] if offloaded else None)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert device is None, "device= and mesh= are exclusive"
            # params replicated over the sp mesh; activations shard over H
            params = jax.device_put(params, NamedSharding(mesh, P()))
            self._z_sharding = NamedSharding(mesh, P(None, None, "sp", None, None))
        elif device is not None:
            params = jax.device_put(params, device)
        self.params = params

        c = self.cfg
        # latent frames batched through each conv per decoder pass; 1 bounds
        # full-res temporaries on 16GB chips, raise on larger HBM
        chunk = int(os.getenv("RTV_VAE_CHUNK", "1"))
        self._decode_first = jax.jit(
            lambda p, z: vae_mod.decode_chunks(c, p, z, None, first=True, chunk=chunk)
        )
        self._decode_rest = jax.jit(
            lambda p, z, cache: vae_mod.decode_chunks(
                c, p, z, cache, first=False, chunk=chunk
            ),
            donate_argnums=(2,),
        )
        self._encode_fresh = jax.jit(
            lambda p, v: vae_mod.encode_chunks(c, p, v, None, stream=False)
        )
        self._encode_stream = jax.jit(
            lambda p, v, cache: vae_mod.encode_chunks(c, p, v, cache, stream=True),
            donate_argnums=(2,),
        )

    @classmethod
    def from_model_folder(cls, dtype=jnp.float32, device=None, mesh=None) -> "VAEWrapper":
        ckpt = os.path.join(MODEL_FOLDER, "Wan2.1-T2V-1.3B", "Wan2.1_VAE.pth")
        return cls(checkpoint_path=ckpt if os.path.exists(ckpt) else None,
                   dtype=dtype, device=device, mesh=mesh)

    # -- batch API ----------------------------------------------------------

    def _to_vae(self, x: jnp.ndarray) -> jnp.ndarray:
        # both latents [B,T,h,w,z] and video [B,T,H,W,3] carry H at axis 2
        if self.mesh is not None:
            return jax.device_put(x, self._z_sharding)
        return jax.device_put(x, self.device) if self.device is not None else x

    def _to_dit(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dit_device is None:
            return x
        return jax.device_put(x, self.dit_device)

    def encode_to_latent(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """[B,T,C,H,W] in [-1,1] -> [B,Tz,z,h,w] normalised latents."""
        video = self._to_vae(pixels.transpose(0, 1, 3, 4, 2))
        z, _ = self._encode_fresh(self.params, video)
        return self._to_dit(z.transpose(0, 1, 4, 2, 3))

    def decode_to_pixel(self, latents: jnp.ndarray) -> jnp.ndarray:
        """[B,Tz,z,h,w] -> [B,T,3,H,W] in [-1,1]."""
        z = self._to_vae(latents.transpose(0, 1, 3, 4, 2))
        out, _ = self._decode_first(self.params, z)
        return out.transpose(0, 1, 4, 2, 3)

    # -- streaming API (server hot loop) -------------------------------------

    def decode_block(
        self, latents: jnp.ndarray, cache: Optional[Tuple] = None
    ) -> Tuple[jnp.ndarray, Tuple]:
        """[B,Tz,z,h,w] + cache -> ([B,T,3,H,W], cache). First call (cache=None)
        yields 1+4(Tz-1) frames, subsequent calls 4*Tz (vae_block3.py:195-230)."""
        z = self._to_vae(latents.transpose(0, 1, 3, 4, 2))
        if cache is None:
            out, cache = self._decode_first(self.params, z)
        else:
            out, cache = self._decode_rest(self.params, z, cache)
        return out.transpose(0, 1, 4, 2, 3), cache

    def encode_stream(
        self, pixels: jnp.ndarray, cache: Optional[Tuple] = None
    ) -> Tuple[jnp.ndarray, Tuple]:
        """[B,T,C,H,W] + cache -> ([B,Tz,z,h,w], cache). cache=None expects
        T=1+4k (fresh 1,4,4,... chunking); warm cache expects T=4k
        (vae_block3.py:133-175)."""
        video = self._to_vae(pixels.transpose(0, 1, 3, 4, 2))
        if cache is None:
            z, cache = self._encode_fresh(self.params, video)
        else:
            z, cache = self._encode_stream(self.params, video, cache)
        return self._to_dit(z.transpose(0, 1, 4, 2, 3)), cache
