"""realtime_video_tpu — a TPU-native real-time autoregressive video diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of krea-ai/realtime-video
(Krea-Realtime-14B): a block-causal, few-step, KV-cached Wan 2.1 DiT that denoises
video 3 latent frames at a time, decodes each block through a streaming causal-3D-conv
VAE, and pushes pixels over a WebSocket while the next block is denoising.

Design stance (TPU-first, not a port):
  * pure functional models: params are pytrees, caches are explicit state threaded
    through jit-compiled step functions with donated buffers
  * one `lax.scan` over stacked transformer layers
  * declarative sharding: NamedSharding over an ICI mesh replaces FSDP/NCCL
  * static shapes everywhere; masks instead of dynamic cache sizes
"""

__version__ = "0.1.0"

from realtime_video_tpu.config import (  # noqa: F401
    WanModelConfig,
    T5Config,
    VAEConfig,
    WAN_CONFIGS,
    load_server_config,
)
