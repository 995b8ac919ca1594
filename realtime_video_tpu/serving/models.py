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


def _denoise_steps(config, shift) -> tuple:
    """The serving denoising schedule (drives int8 calibration)."""
    import numpy as np

    from realtime_video_tpu.scheduler import (
        FlowMatchSchedule,
        get_denoising_schedule,
    )

    schedule = FlowMatchSchedule.create(
        shift=float(shift), sigma_min=0.0, extra_one_step=True
    )
    return tuple(float(t) for t in get_denoising_schedule(
        np.asarray(schedule.zero_padded_timesteps()), 1.0,
        int(config.get("num_denoising_steps", 5) or 5),
    ))


def _build_base_transformer(config, ckpt, shift) -> WanDiffusion:
    if ckpt and os.path.exists(ckpt):
        return WanDiffusion(
            checkpoint_path=ckpt, timestep_shift=shift, is_causal=True,
            fuse_qkv=True,
        )
    name = config.get("model_name", "t2v-1.3B")
    log.warning("checkpoint %r missing — random-init %s", ckpt, name)
    return WanDiffusion(
        cfg=WAN_CONFIGS[name], timestep_shift=shift, is_causal=True,
        fuse_qkv=True,
    )


def load_transformer(config) -> WanDiffusion:
    """Checkpoint autodetect + load (release_server.py:150-188)."""
    import jax

    t0 = time.time()
    ckpt = config.get("checkpoint_path", "")
    shift = config.get("timestep_shift", 5.0)
    int8_dit = bool(config.get("enable_int8_dit",
                               config.get("enable_int8", False)))
    if not int8_dit:
        transformer = _build_base_transformer(config, ckpt, shift)
        log.debug("Transformer load: %.2fs", time.time() - t0)
        return transformer

    # int8 tier: build + calibrate + quantize HOST-side, with the finished
    # quantized tree cached on disk (the reference ships prebuilt TRT
    # engines / quantized weights; a warm server start here skips the
    # ~2-minute init+calibrate+quantize and goes straight to device_put)
    from realtime_video_tpu.models import diffusion_wrapper as dw_mod
    from realtime_video_tpu.models import wan_dit
    from realtime_video_tpu.models.diffusion_wrapper import host_build_env
    from realtime_video_tpu.utils import qcache

    steps = (_denoise_steps(config, shift)
             if config.get("int8_static_scales", True) else None)
    src = (qcache.file_sig(ckpt) if ckpt and os.path.exists(ckpt)
           else "random:" + config.get("model_name", "t2v-1.3B"))
    from realtime_video_tpu import config as config_mod

    # code hashes cover everything that shapes the cached numerics: the
    # model + quantise code (wan_dit), the named-config dims (config_mod —
    # WAN_CONFIGS edits must miss, not load wrong-shape params), and the
    # calibration pass itself (diffusion_wrapper.calibrate_act_scales)
    key = qcache.cache_key(
        src, float(shift), steps, qcache.code_hash(wan_dit),
        qcache.code_hash(config_mod), qcache.code_hash(dw_mod),
        os.getenv("RTV_DIT_AMAX_SUB", ""), os.getenv("RTV_Q_RCP", ""),
        os.getenv("RTV_Q_BF16", ""), os.getenv("RTV_CAL_JIT", ""), "qp1",
    )

    def build():
        with host_build_env():
            tr = _build_base_transformer(config, ckpt, shift)
            # calibrated STATIC activation scales (torchao static-quant
            # analog, release_server.py:179-182)
            act_scales = (tr.calibrate_act_scales(steps)
                          if steps is not None else None)
        return {"cfg": tr.cfg,
                "params": wan_dit.quantize_wan_linears(
                    tr.params, act_scales=act_scales)}

    entry = qcache.cached_tree("dit_qparams", key, build, log=log)
    transformer = WanDiffusion(
        cfg=entry["cfg"],
        params=jax.device_put(entry["params"], jax.devices()[0]),
        timestep_shift=shift, is_causal=True,
    )
    log.info("DiT linears quantized to int8 (static scales: %s)",
             steps is not None)
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
    import jax

    # decode-overlap chip: with >=2 devices attached, pin the VAE to a second
    # chip so streaming decode overlaps the next block's denoise (the
    # reference overlaps via CUDA streams, release_server.py:727-729; one
    # TPU TensorCore serializes programs, so overlap needs its own chip)
    dev = None
    env_dev = os.getenv("RTV_VAE_DEVICE")
    cfg_dev = config.get("vae_device_index")
    dev_idx = int(env_dev) if env_dev not in (None, "") \
        else (int(cfg_dev) if cfg_dev is not None else -1)  # 0 is valid; null isn't
    if 0 <= dev_idx < len(jax.devices()):
        dev = jax.devices()[dev_idx]
        log.info("VAE pinned to %s (decode overlaps denoise)", dev)
    elif dev_idx >= 0:
        log.warning("requested VAE device %d not attached (%d devices) — "
                    "VAE stays on the default device", dev_idx, len(jax.devices()))
    # spatial sharding across chips 1..N (H split, GSPMD halo exchange):
    # decode time ~1/N while chip 0 denoises the next block
    env_sp = os.getenv("RTV_VAE_SP_DEVICES")
    n_sp = int(env_sp) if env_sp not in (None, "") \
        else int(config.get("vae_sp_devices", 0) or 0)
    if n_sp >= 2 and len(jax.devices()) <= n_sp:
        log.warning("requested %d VAE sp devices but only %d attached — "
                    "spatial sharding disabled", n_sp, len(jax.devices()))
    mesh = None
    if n_sp >= 2 and len(jax.devices()) > n_sp:
        import numpy as np
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[1 : 1 + n_sp]), ("sp",))
        dev = None
        log.info("VAE spatially sharded over chips 1..%d", n_sp)
    if not config.get("enable_int8", False):
        return VAEWrapper.from_model_folder(dtype=jnp.bfloat16, device=dev,
                                            mesh=mesh)

    # int8 conv tier (the reference's TRT-int8 / fp8 flags,
    # release_server.py:179-182 + use_trt). Calibrate + quantize HOST-side
    # and disk-cache the finished tree (see load_transformer).
    from realtime_video_tpu.models import vae as vae_mod
    from realtime_video_tpu.models.diffusion_wrapper import host_build_env
    from realtime_video_tpu.utils import qcache

    from realtime_video_tpu.config import MODEL_FOLDER

    static = bool(config.get("int8_static_scales", True))
    ckpt = os.path.join(MODEL_FOLDER, "Wan2.1-T2V-1.3B", "Wan2.1_VAE.pth")
    src = qcache.file_sig(ckpt) if os.path.exists(ckpt) else "random:wan2.1"
    from realtime_video_tpu import config as config_mod

    key = qcache.cache_key(src, static, qcache.code_hash(vae_mod),
                           qcache.code_hash(config_mod), "vq1")

    def build():
        with host_build_env():
            base = VAEWrapper.from_model_folder(dtype=jnp.bfloat16)
            act_scales = None
            if static:
                # TRT-calibration analog: static per-conv activation scales
                # drop the per-call dynamic amax pass (fused A/B: 8.21 vs
                # 7.79 fps). One eager float pass at tiny dims; scales
                # transfer across resolution.
                zc = jax.random.normal(
                    jax.random.PRNGKey(9), (1, 2, 8, 8, base.cfg.z_dim),
                    jnp.bfloat16)
                pxc = jax.random.uniform(
                    jax.random.PRNGKey(10), (1, 1, 64, 64, 3), jnp.bfloat16,
                    minval=-1.0, maxval=1.0)
                act_scales = vae_mod.calibrate_vae_act_scales(
                    base.cfg, base.params, zc, pxc)
            return {"cfg": base.cfg,
                    "params": vae_mod.quantize_vae_params(
                        base.params, act_scales=act_scales)}

    entry = qcache.cached_tree("vae_qparams", key, build, log=log)
    params = entry["params"]
    if dev is None and mesh is None:
        # cache entries are numpy (and build() quantizes host-side): pin to
        # the chip explicitly, or every decode dispatch re-uploads the tree
        params = jax.device_put(params, jax.devices()[0])
    # the VAEWrapper ctor pins params to dev / replicates over mesh itself
    vae = VAEWrapper(cfg=entry["cfg"], params=params,
                     dtype=jnp.bfloat16, device=dev, mesh=mesh)
    log.info("VAE quantized to int8 (static scales: %s)", static)
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


def warmup_models(models: Models, config, shapes=None) -> None:
    """Pre-compile the serving hot path for each configured shape
    (compile_models analog, release_server.py:753-755 + COMPILE_SHAPES
    settings.py:6): the fused block step for both the first block (no
    context) and steady state (kv_cache_num_frames of context), plus both
    VAE decode variants. A new session's first frame then costs zero
    compiles (persistent-cache misses aside)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realtime_video_tpu.config import COMPILE_SHAPES
    from realtime_video_tpu.scheduler import FlowMatchSchedule, get_denoising_schedule
    from realtime_video_tpu.serving.session import fused_block_step

    shapes = shapes or config.get("compile_shapes", COMPILE_SHAPES)
    gen = models.transformer
    cfg = gen.cfg
    shift = float(config.get("timestep_shift", 5.0))
    n_steps = int(config.get("num_denoising_steps", 5) or 5)
    kv_frames = int(config.get("kv_cache_num_frames", 3))
    nfpb = models.pipeline.num_frame_per_block

    schedule = FlowMatchSchedule.create(shift=shift, sigma_min=0.0, extra_one_step=True)
    steps = tuple(
        float(t) for t in get_denoising_schedule(
            np.asarray(schedule.zero_padded_timesteps()), 1.0, n_steps
        )
    )

    t0 = time.time()
    dummy_ctx = jnp.zeros((1, 512, cfg.text_dim), jnp.bfloat16)
    cross = gen.compute_crossattn_cache(gen.params, dummy_ctx)
    for w, h in shapes:
        lat_h, lat_w = h // 8, w // 8
        fsl = cfg.frame_seq_length(lat_h, lat_w)
        max_attn = (kv_frames + nfpb) * fsl
        from realtime_video_tpu.ops import kv_cache as kvc

        kv = kvc.init_kv_cache(
            cfg.num_layers, 1, max_attn, cfg.num_heads, cfg.head_dim
        )
        noisy = jnp.zeros((1, nfpb, 16, lat_h, lat_w), jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        for nctx in (0, kv_frames):
            step = fused_block_step(gen, shift, steps, nctx, max_attn, fsl, nfpb)
            clean = jnp.zeros((1, nctx, 16, lat_h, lat_w), jnp.bfloat16)
            x0, kv, rng = step(gen.params, kv, cross, clean, noisy, kv_frames * fsl, rng)
        # block 0 decodes per latent frame (session streamed path, low TTFF)
        px, vcache = models.vae_decoder.decode_block(x0[:, :1])
        px, vcache = models.vae_decoder.decode_block(x0[:, :1], vcache)
        jax.device_get(px[0, -1, :2, :2])
        # warm blocks are ONE megafused program (denoise + whole-block
        # decode) when megafuse is on and the VAE shares the chip — compile
        # the exact program the session will dispatch, plus the per-block
        # anti-drift re-encode (single pixel frame -> latent)
        split_vae = (getattr(models.vae_decoder, "device", None) is not None
                     or getattr(models.vae_decoder, "mesh", None) is not None)
        if os.getenv("RTV_SESSION_MEGAFUSE", "1") in ("1", "true"):
            if bool(config.get("use_taehv", False)):
                from realtime_video_tpu.serving.session import (
                    _ensure_taehv_params, fused_block_taehv_step)

                from realtime_video_tpu.models import taehv as taehv_mod

                _ensure_taehv_params(models)
                # build a warm decode state first: the serving program is
                # traced with a non-None state (block 0 decodes eagerly)
                _, tstate = taehv_mod.taehv_decode(
                    models.taehv_params, x0[:, :1].astype(jnp.bfloat16), None)
                tstep = fused_block_taehv_step(
                    gen, shift, steps, kv_frames, max_attn, fsl, nfpb)
                x0, _px, kv, _ts, rng = tstep(
                    gen.params, kv, cross, models.taehv_params, tstate,
                    jnp.zeros((1, kv_frames, 16, lat_h, lat_w), jnp.bfloat16),
                    noisy, kv_frames * fsl, rng)
            elif not split_vae:
                from realtime_video_tpu.serving.session import (
                    fused_block_decode_step)

                fstep = fused_block_decode_step(
                    gen, models.vae_decoder, shift, steps, kv_frames,
                    max_attn, fsl, nfpb)
                x0, _px, kv, vcache, rng = fstep(
                    gen.params, kv, cross, models.vae_decoder.params, vcache,
                    jnp.zeros((1, kv_frames, 16, lat_h, lat_w), jnp.bfloat16),
                    noisy, kv_frames * fsl, rng)
            else:
                # split megafuse: whole-block decode program on the VAE chip
                _px, vcache = models.vae_decoder.decode_block(
                    x0.astype(jnp.bfloat16), vcache)
            jax.device_get(jnp.asarray(_px)[0, -1, :1, :1])
        one = jnp.zeros((1, 1, 3, h, w), jnp.bfloat16)
        models.vae_encoder.encode_stream(one)
        log.info("warmup %dx%d done (%.1fs)", w, h, time.time() - t0)
    log.info("warmup complete in %.1fs", time.time() - t0)
