"""Model loading for the server (reference: release_server.py:100-313).

`Models` holds all loaded components; `load_all` builds them from a server
config, loading real checkpoints when present under MODEL_FOLDER /
config.checkpoint_path and falling back to random-init weights otherwise
(dev machines without the 30GB checkpoint set).
"""
from __future__ import annotations

import logging
import os
import time
import jax.numpy as jnp

from realtime_video_tpu.config import WAN_CONFIGS
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.models.text_encoder import WanTextEncoder
from realtime_video_tpu.models.vae_wrapper import VAEWrapper
from realtime_video_tpu.pipelines.causal_inference import CausalInferencePipeline

log = logging.getLogger(__name__)


class Models:
    def __init__(self, text_encoder, transformer, pipeline, vae_encoder, vae_decoder):
        self.text_encoder: WanTextEncoder = text_encoder
        self.transformer: WanDiffusion = transformer
        self.pipeline: CausalInferencePipeline = pipeline
        # one VAEWrapper serves both roles; kept as two attributes for API parity
        self.vae_encoder: VAEWrapper = vae_encoder
        self.vae_decoder: VAEWrapper = vae_decoder


def load_transformer(config) -> WanDiffusion:
    """Checkpoint autodetect + load (release_server.py:150-188)."""
    t0 = time.time()
    ckpt = config.get("checkpoint_path", "")
    shift = config.get("timestep_shift", 5.0)
    if ckpt and os.path.exists(ckpt):
        transformer = WanDiffusion(
            checkpoint_path=ckpt, timestep_shift=shift, is_causal=True,
            fuse_qkv=True,
        )
    else:
        name = config.get("model_name", "t2v-1.3B")
        log.warning("checkpoint %r missing — random-init %s", ckpt, name)
        transformer = WanDiffusion(
            cfg=WAN_CONFIGS[name], timestep_shift=shift, is_causal=True,
            fuse_qkv=True,
        )
    log.debug("Transformer load: %.2fs", time.time() - t0)
    return transformer


def load_text_encoder(config) -> WanTextEncoder:
    if os.getenv("USE_STATIC_ENCODER_COND_DICT", "false").lower() in ("true", "1", "yes"):
        import jax

        from realtime_video_tpu.models.text_encoder import StaticTextEncoder

        emb = jax.random.normal(jax.random.PRNGKey(0), (1, 512, 4096), jnp.bfloat16)
        return StaticTextEncoder(emb)
    t5_dev = os.getenv("RTV_T5_TINY", "0") in ("1", "true")
    if t5_dev:
        from realtime_video_tpu.config import T5_CONFIGS

        return WanTextEncoder(cfg=T5_CONFIGS["t5-tiny"])
    return WanTextEncoder.from_model_folder()


def load_vae(config) -> VAEWrapper:
    vae = VAEWrapper.from_model_folder(dtype=jnp.bfloat16)
    if config.get("enable_int8", False):
        # int8 conv tier (the reference's TRT-int8 / fp8 flags,
        # release_server.py:179-182 + use_trt)
        from realtime_video_tpu.models.vae import quantize_vae_params

        vae.params = quantize_vae_params(vae.params)
        log.info("VAE quantized to int8")
    return vae


def load_pipeline(config, transformer, text_encoder, vae) -> CausalInferencePipeline:
    return CausalInferencePipeline(
        config, transformer, text_encoder=text_encoder, vae=vae
    )


def load_all(config) -> Models:
    t0 = time.time()
    transformer = load_transformer(config)
    text_encoder = load_text_encoder(config)
    vae = load_vae(config)
    pipeline = load_pipeline(config, transformer, text_encoder, vae)
    log.info("All models loaded in %.2fs", time.time() - t0)
    return Models(text_encoder, transformer, pipeline, vae, vae)
