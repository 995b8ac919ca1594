"""Per-connection generation state machine.

Mirrors the reference `GenerationSession` (release_server.py:344-751):
per-block KV-cache recomputation with first-frame anti-drift re-encode,
strength-scaled denoising schedules, v2v / webcam ingest, prompt-embedding
interpolation, streaming VAE decode with frame callbacks, resume latents and
start-frame conditioning.

TPU notes: the per-block hot loop is two jitted dispatches (prefill + fused
denoise loop) plus one jitted VAE decode; the PRNG key is threaded explicitly;
device->host transfer is started asynchronously before the JPEG pool runs.
"""
from __future__ import annotations

import copy
import logging
import os
import queue
import threading
import time
from collections import deque
from functools import lru_cache
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.models import wan_dit
from realtime_video_tpu.ops import attention as attn_ops
from realtime_video_tpu.ops import kv_cache as kvc
from realtime_video_tpu.scheduler import FlowMatchSchedule, get_denoising_schedule
from realtime_video_tpu.serving.params import GenerateParams
from realtime_video_tpu.serving.video_io import load_video_as_rgb, resample_array
from realtime_video_tpu.utils.misc import AtomicCounter

log = logging.getLogger(__name__)


def _ensure_taehv_params(models) -> None:
    """Lazily populate ``models.taehv_params`` for the preview decode tier.

    Mirrors the reference's lazy TAEHV construction (release_server.py:350 +
    demo_utils/taehv.py:210-234): load real taew2_1 weights when a checkpoint
    is present (RTV_TAEHV_CKPT, default checkpoints/taew2_1.pth), else a
    random init so the tier runs end-to-end without weights.
    """
    if getattr(models, "taehv_params", None) is not None:
        return
    from realtime_video_tpu.models import taehv as taehv_mod

    ckpt = os.getenv("RTV_TAEHV_CKPT", "checkpoints/taew2_1.pth")
    if ckpt and os.path.exists(ckpt):
        try:
            import torch

            sd = torch.load(ckpt, map_location="cpu", weights_only=True)
            models.taehv_params = taehv_mod.convert_taehv_checkpoint(
                sd, jnp.bfloat16
            )
            log.info("loaded TAEHV weights from %s", ckpt)
            return
        except Exception:  # noqa: BLE001
            log.exception("TAEHV checkpoint load failed; using random init")
    models.taehv_params = taehv_mod.init_taehv_params(
        jax.random.PRNGKey(0), jnp.bfloat16
    )


def encode_video_latent(
    vae,
    encode_vae_cache,
    resample_to: Optional[int] = 16,
    max_frames: Optional[int] = 81,
    video_path_or_url: Optional[str] = None,
    frames: Optional[np.ndarray] = None,
    height: Optional[int] = None,
    width: Optional[int] = None,
    stream: bool = False,
):
    """Pixel frames -> normalised latents (reference v2v.py:138-158).

    frames: [T, 3, H, W] in [-1, 1]. Returns ([Tz, z, h, w], cache).
    """
    vae_stride = (4, 8, 8)
    if frames is None:
        frames = load_video_as_rgb(video_path_or_url, resample_to=resample_to,
                                   resample_frame_count_threshold=33)
    frames = jnp.asarray(frames)
    if frames.ndim == 3:
        frames = frames[None]
    h = height if height is not None else frames.shape[2]
    w = width if width is not None else frames.shape[3]
    if max_frames is None:
        max_frames = 1 + ((frames.shape[0] - 1) // 4) * 4
    if max_frames:
        frames = frames[:max_frames]
    h = h // vae_stride[1] * vae_stride[1]
    w = w // vae_stride[2] * vae_stride[2]
    frames = jax.image.resize(
        frames, (frames.shape[0], frames.shape[1], h, w), method="bicubic"
    ).astype(jnp.bfloat16)
    latents, cache = vae.encode_stream(
        frames[None], encode_vae_cache if stream else None
    )
    return latents[0], cache


@lru_cache(maxsize=32)
def fused_block_step(
    gen,
    shift: float,
    steps: Tuple[float, ...],
    num_ctx_frames: int,
    max_attn: int,
    fsl: int,
    nfpb: int,
):
    """Module-level (cross-session) cache of the fused per-block jit:
    reset KV cache + blockwise-causal context prefill + denoise scan.
    Keyed on everything the trace depends on, so concurrent sessions with
    the same shape/schedule share one compiled executable and a new
    session's first block skips tracing entirely."""
    # per-shift schedule on a shallow copy: mutating the SHARED gen.schedule
    # here would leak this session's shift to every other consumer (and a
    # cache hit would skip the mutation, baking whichever shift ran last)
    gen = copy.copy(gen)
    gen.schedule = FlowMatchSchedule.create(
        shift=shift, sigma_min=0.0, extra_one_step=True
    )
    denoise = gen.make_denoise_block_fn(steps, max_attn, refresh_t=None)
    block_tokens = fsl * nfpb

    def fn(params, kv, cross, clean_ctx, noisy, current_start, rng):
        kv = kvc.reset_kv_cache(kv)
        if num_ctx_frames > 0:
            kv = wan_dit.context_prefill(
                gen.cfg, params, clean_ctx, gen.rope, cross, kv,
                block_tokens=block_tokens, max_attention_size=max_attn,
            )
        return denoise(params, kv, cross, noisy, current_start, rng)

    return jax.jit(fn, donate_argnums=(1,))


@lru_cache(maxsize=4)
def fused_block_decode_step(
    gen,
    vae,
    shift: float,
    steps: Tuple[float, ...],
    num_ctx_frames: int,
    max_attn: int,
    fsl: int,
    nfpb: int,
):
    """Throughput-mode hot loop (RTV_SESSION_MEGAFUSE): ONE dispatch per
    block — reset + prefill + denoise scan + all-latent VAE decode
    (lax.scan carries the streaming conv cache, so buffers are reused and
    the math equals the per-latent decode_block calls; tests/test_megafuse).

    Frames then reach the client at block granularity instead of latent
    granularity — the trade is per-dispatch overhead (the axon tunnel taxes
    every dispatch; bench/stall_probe.py measured ~32 ms each on
    fresh-compiled executables) against intra-block streaming latency."""
    from realtime_video_tpu.models import vae as vae_mod

    inner = fused_block_step(gen, shift, steps, num_ctx_frames, max_attn,
                             fsl, nfpb)
    vcfg = vae.cfg

    def fn(params, kv, cross, vparams, vcache, clean_ctx, noisy,
           current_start, rng):
        x0, kv, rng = inner(params, kv, cross, clean_ctx, noisy,
                            current_start, rng)
        z = x0.astype(jnp.bfloat16).transpose(0, 1, 3, 4, 2)  # [B,T,h,w,z]

        def dec(c, z1):
            px1, c = vae_mod.decode_chunks(vcfg, vparams, z1[:, None], c,
                                           first=False, chunk=1)
            return c, px1

        vcache, pxs = jax.lax.scan(dec, vcache, jnp.moveaxis(z, 1, 0))
        t, b, f, h, w, c = pxs.shape
        px = jnp.moveaxis(pxs, 0, 1).reshape(b, t * f, h, w, c)
        return x0, px.transpose(0, 1, 4, 2, 3), kv, vcache, rng

    return jax.jit(fn, donate_argnums=(1, 4))


@lru_cache(maxsize=4)
def fused_block_taehv_step(
    gen,
    shift: float,
    steps: Tuple[float, ...],
    num_ctx_frames: int,
    max_attn: int,
    fsl: int,
    nfpb: int,
):
    """Preview-tier (use_taehv, release_server.py:350) twin of
    fused_block_decode_step: denoise + whole-block TAEHV decode in ONE
    dispatch. The un-fused taehv path runs taehv_decode eagerly — dozens of
    small dispatches per block, each paying the tunnel's per-dispatch cost.
    Includes the [0,1] -> [-1,1] session-convention mapping."""
    from realtime_video_tpu.models import taehv as taehv_mod

    inner = fused_block_step(gen, shift, steps, num_ctx_frames, max_attn,
                             fsl, nfpb)

    def fn(params, kv, cross, tparams, tstate, clean_ctx, noisy,
           current_start, rng):
        x0, kv, rng = inner(params, kv, cross, clean_ctx, noisy,
                            current_start, rng)
        px, tstate = taehv_mod.taehv_decode(
            tparams, x0.astype(jnp.bfloat16), tstate
        )
        return x0, px * 2.0 - 1.0, kv, tstate, rng

    return jax.jit(fn, donate_argnums=(1, 4))


@lru_cache(maxsize=8)
def _prefill_fn_cached(gen, fsl: int, nfpb: int, num_ctx_frames: int):
    """Module-level (keyed on the long-lived transformer, not the session —
    session-keyed lru_caches pinned disposed sessions' device arrays)."""
    mask = attn_ops.blockwise_causal_mask(num_ctx_frames, fsl, nfpb)

    def fn(params, kv, cross, latents):
        t = jnp.zeros(latents.shape[:2], jnp.float32)
        _, new_kv = wan_dit.dit_forward(
            gen.cfg, params, latents, t, gen.rope, cross,
            mode="prefill", kv_cache=kv, attn_mask=mask,
        )
        return new_kv

    return jax.jit(fn, donate_argnums=(1,))


@lru_cache(maxsize=8)
def _denoise_fn_cached(gen, shift: float, steps: Tuple[float, ...], max_attn: int):
    gen = copy.copy(gen)  # never mutate the shared generator (see above)
    gen.schedule = FlowMatchSchedule.create(
        shift=shift, sigma_min=0.0, extra_one_step=True
    )
    return jax.jit(
        gen.make_denoise_block_fn(steps, max_attn, refresh_t=None),
        donate_argnums=(1,),
    )


@lru_cache(maxsize=32)
def _encode_v2v_cached(vae_encoder, video_path_or_url, height, width,
                       max_frames, resample_to):
    """Keyed on the long-lived encoder + request statics (the reference puts
    this lru_cache on the session method, release_server.py:530 — which pins
    every disposed session's latents; keying on the encoder frees sessions)."""
    return encode_video_latent(
        vae_encoder, None, video_path_or_url=video_path_or_url,
        height=height, width=width, stream=False,
        max_frames=max_frames, resample_to=resample_to,
    )


class GenerationSession:
    SESSION_COUNTER = AtomicCounter()

    def __init__(
        self,
        params: GenerateParams,
        config,
        debug: bool = False,
        frame_callback: Optional[Callable] = None,
        models=None,
    ):
        self.current_use_taehv = config.get("use_taehv", False)
        self.frame_callback = frame_callback or (
            lambda *a, **k: log.warning("No frame callback set!")
        )
        self.session_id = self.SESSION_COUNTER.increment()
        self.frame_queue: "queue.Queue" = queue.Queue()
        self.block_idx = 0
        self.params = params
        self.config = config
        self.debug = debug
        self.models = models

        self.input_video = params.input_video
        if self.input_video is None and not params.webcam_mode:
            self.params.strength = 1.0
        self.start_frame = params.start_frame

        self.width = params.width // 8 * 8
        self.height = params.height // 8 * 8
        self.latent_width = self.width // 8
        self.latent_height = self.height // 8
        self.resume_latents: Optional[jnp.ndarray] = None
        self.last_frame_latent = None

        self.interpolated_prompt_embeds: List[jnp.ndarray] = []
        self.current_prompt_embeds: Optional[jnp.ndarray] = None
        self.conditional_dict: Dict[str, jnp.ndarray] = {}

        # stored but unused in serving, matching the reference byte-for-byte
        # (release_server.py:384 stores it and never reads it again; only
        # the offline CausalInferencePipeline wires context noising)
        self.context_noise = params.context_noise
        self.kv_cache_num_frames = params.kv_cache_num_frames
        self.g_num_blocks = self.num_blocks = params.num_blocks

        frame_cache_len = 1 + (params.kv_cache_num_frames - 1) * 4
        self.frame_context_cache: deque = deque(maxlen=frame_cache_len)

        self.encode_vae_cache = None
        self.decode_vae_cache = None
        self.num_frame_per_block = 3

        if self.params.seed is None:
            self.params.seed = 0
        self.rng = jax.random.PRNGKey(self.params.seed)

        num_latent_frames = self.num_blocks * self.num_frame_per_block
        latent_shape = (1, num_latent_frames, 16, self.latent_height, self.latent_width)
        self.all_latents = jnp.zeros(latent_shape, jnp.bfloat16)
        self.rng, sub = jax.random.split(self.rng)
        self.noise = jax.random.normal(sub, latent_shape, jnp.float32).astype(jnp.bfloat16)

        self.current_start_frame = 0
        self.total_frames_sent = 0
        self.disposed = threading.Event()

        self.init_models(models, self.params)

        self.denoising_step_list = get_denoising_schedule(
            self.zero_padded_timesteps, self.params.strength,
            steps=self.params.num_denoising_steps,
        )
        log.info("denoising step list: %s", self.denoising_step_list)

        if self.input_video is not None:
            init_strength = float(self.denoising_step_list[0]) / 1000.0
            latents, _ = self.encode_v2v(self.input_video, None, None)
            latents = latents[None].astype(self.noise.dtype)  # [1, Tz, z, h, w]
            self.rng, sub = jax.random.split(self.rng)
            noise = jax.random.normal(sub, latents.shape, jnp.float32).astype(latents.dtype)
            n = min(latents.shape[1], self.noise.shape[1])
            mixed = latents[:, :n] * (1.0 - init_strength) + noise[:, :n] * init_strength
            self.noise = self.noise.at[:, :n].set(mixed) if n < self.noise.shape[1] else mixed
            # the -1 (last input block reserved) is the reference's own
            # arithmetic, release_server.py:429 — a 1-block video yields 0
            actual_num_blocks = latents.shape[1] // self.num_frame_per_block - 1
            self.num_blocks = min(actual_num_blocks, self.params.num_blocks)
        if self.params.resume_latents is not None and isinstance(
            self.params.resume_latents, bytes
        ):
            # serialized .npy latents [Tz, z, h, w] to resume from
            # (GenerateParams.resume_latents, release_server.py:321)
            import io as _io

            arr = np.load(_io.BytesIO(self.params.resume_latents), allow_pickle=False)
            lat = jnp.asarray(arr, jnp.bfloat16)
            self.resume_latents = lat[None] if lat.ndim == 4 else lat
        if self.params.start_frame is not None:
            self.setup_start_frame(self.params.start_frame, models)

        self.last_pred: Optional[jnp.ndarray] = None

    # ------------------------------------------------------------------

    def dispose(self):
        self.disposed.set()

    @property
    def frame_seq_length(self) -> int:
        return self.models.transformer.cfg.frame_seq_length(
            self.latent_height, self.latent_width
        )

    def init_models(self, models, params: GenerateParams):
        """Per-session pipeline re-config (release_server.py:542-561): local
        attention window = kv frames + block, fresh caches, shifted schedule."""
        pipeline = models.pipeline
        pipeline.local_attn_size = params.kv_cache_num_frames + pipeline.num_frame_per_block
        self.num_frame_per_block = pipeline.num_frame_per_block
        fsl = self.frame_seq_length
        pipeline._initialize_kv_cache(1, fsl, jnp.bfloat16)
        self.schedule = FlowMatchSchedule.create(
            shift=params.timestep_shift, sigma_min=0.0, extra_one_step=True
        )
        pipeline.schedule = self.schedule
        self.zero_padded_timesteps = np.asarray(self.schedule.zero_padded_timesteps())

    # -- jitted step builders (session-level: window differs per session) ----

    def _max_attn(self) -> int:
        # serving attends over the whole (kv_frames + block) cache
        return (self.kv_cache_num_frames + self.num_frame_per_block) * self.frame_seq_length

    def _prefill_fn(self, num_ctx_frames: int):
        return _prefill_fn_cached(
            self.models.transformer, self.frame_seq_length,
            self.num_frame_per_block, num_ctx_frames,
        )

    def _denoise_fn(self, steps: Tuple[float, ...]):
        return _denoise_fn_cached(
            self.models.transformer, float(self.params.timestep_shift),
            steps, self._max_attn(),
        )

    def _block_step_fn(self, steps: Tuple[float, ...], num_ctx_frames: int):
        """One fused dispatch per block: zero the cache, prefill it from the
        clean context (the do_kv_recomp path, release_server.py:588-633), then
        run the whole denoise loop — a single jit call replaces the
        reference's mask rebuild + two model invocations per block.

        Delegates to a module-level cache keyed on static config so every
        session after the first reuses the traced jit (the reference gets
        the same via torch.compile's global cache; compile_models
        release_server.py:753-755)."""
        return fused_block_step(
            self.models.transformer,
            float(self.params.timestep_shift),
            steps,
            num_ctx_frames,
            self._max_attn(),
            self.frame_seq_length,
            self.num_frame_per_block,
        )

    # ------------------------------------------------------------------

    def interpolate_prompt_embeds(self, models, new_prompt: str, interpolation_steps: int):
        """Lerp old->new embeds over N blocks (release_server.py:459-468)."""
        if self.current_prompt_embeds is None:
            return
        p1 = self.current_prompt_embeds
        p2 = models.text_encoder(text_prompts=[new_prompt])["prompt_embeds"].astype(
            jnp.bfloat16
        )
        if interpolation_steps == 1:
            # jump straight to the new prompt. The reference's
            # torch.linspace(0, 1, 1) == [0.] (release_server.py:466) would
            # re-apply the OLD embedding and drop the new prompt forever.
            ws = jnp.ones((1,))[:, None, None]
        else:
            ws = jnp.linspace(0.0, 1.0, interpolation_steps)[:, None, None]
        x = p1[0][None] * (1 - ws) + p2[0][None] * ws  # [steps, T, D]
        self.interpolated_prompt_embeds = [x[i][None] for i in range(interpolation_steps)]

    def push_frame(self, frame, denoising_strength=None, request_id=None):
        """Webcam/v2v frame push (release_server.py:470-487)."""
        try:
            if denoising_strength is not None:
                self.params.strength = denoising_strength
            if isinstance(frame, str):
                import base64

                if frame.startswith("data:"):
                    frame = frame[frame.index(",") + 1:]
                frame = base64.b64decode(frame)
            from io import BytesIO

            from PIL import Image

            image = Image.open(BytesIO(frame)).convert("RGB")
            arr = np.asarray(image, np.float32).transpose(2, 0, 1) / 255.0
            arr = (arr - 0.5) * 2.0  # [3, H, W] in [-1, 1]
            self.frame_queue.put((arr, request_id))
        except Exception as e:  # noqa: BLE001
            log.exception("Killing from push_frame: %s", e)
            self.dispose()

    def process_webcam_frames(self, models, idx: int):
        """Drain >=9/12 frames, resample, stream-encode
        (release_server.py:489-527)."""
        num_frames_to_encode = 9 if idx == 0 else 12
        while self.frame_queue.qsize() < num_frames_to_encode:
            if self.disposed.is_set():
                return None
            time.sleep(0.01)
        frame_list = []
        while not self.frame_queue.empty():
            try:
                frame_list.append(self.frame_queue.get_nowait()[0])
            except queue.Empty:
                break
        if len(frame_list) < num_frames_to_encode:
            return None
        frames = np.stack(resample_array(frame_list, num_frames_to_encode))
        latents, self.encode_vae_cache = encode_video_latent(
            models.vae_encoder,
            self.encode_vae_cache,
            frames=frames,
            height=self.params.height,
            width=self.params.width,
            stream=idx > 0,
        )
        return latents

    def encode_v2v(self, video_path_or_url: str, max_frames=None, resample_to=None):
        return _encode_v2v_cached(
            self.models.vae_encoder, video_path_or_url,
            self.params.height, self.params.width, max_frames, resample_to,
        )

    def setup_start_frame(self, image, models):
        """Replicate a single conditioning image into a latent context
        (release_server.py:578-586)."""
        num_context_frames = self.params.kv_cache_num_frames
        frame_cache_len = 1 + (num_context_frames - 1) * 4
        if isinstance(image, (bytes, str)):
            from io import BytesIO

            from PIL import Image

            if isinstance(image, str):
                image = Image.open(image).convert("RGB")
            else:
                image = Image.open(BytesIO(image)).convert("RGB")
        arr = np.asarray(image, np.float32).transpose(2, 0, 1) / 255.0
        arr = (arr - 0.5) * 2.0
        frames = np.stack([arr] * frame_cache_len)
        latents, _ = encode_video_latent(
            models.vae_encoder, None, resample_to=16, max_frames=81,
            frames=frames, height=self.params.height,
            width=self.params.width, stream=False,
        )
        self.resume_latents = latents[None]  # [1, kv, z, h, w]

    def get_clean_context_frames(self, models) -> jnp.ndarray:
        """First-frame + last (k-1) context latents, with anti-drift pixel
        re-encode of frame 0 after warmup (release_server.py:563-576)."""
        k = self.kv_cache_num_frames or self.params.kv_cache_num_frames
        ctx = self.all_latents[:, : self.current_start_frame]
        warmup = (self.block_idx - 1) * self.num_frame_per_block < k
        if self.params.keep_first_frame or warmup:
            if k == 1:
                return ctx[:, :1]
            return jnp.concatenate([ctx[:, :1], ctx[:, 1:][:, -(k - 1):]], axis=1)
        # k == 1 must keep NO tail (context = the re-encoded frame alone).
        # The reference's `[:, -k + 1:]` is `[:, 0:]` at k=1 — an upstream
        # off-by-zero (release_server.py:573) that its warmup branch shows is
        # unintended; here it would overflow the (k+3)-frame KV cache.
        tail = ctx[:, 1:][:, -(k - 1):] if k > 1 else ctx[:, :0]
        # stays on device: the oldest cached pixel frame changes every block
        # (rolling deque), so this VAE encode is paid per block — don't add a
        # host round-trip on top (reference pulls .half() on GPU, :574)
        # bf16 like the reference's .half() (:574) — an f32 single-frame
        # encode measured ~2x slower on v5e with no quality gain
        # entries are LAZY (block_pixels, frame_idx) pairs: storing 12 eager
        # per-frame slices per block cost 12 device dispatches each block
        # (every dispatch is taxed over the tunnel); only the one frame the
        # re-encode consumes is ever sliced
        blk, fi = self.frame_context_cache[0]
        first_pixels = blk[0, fi].astype(jnp.bfloat16)  # [3,H,W]
        first_latent, _ = encode_video_latent(
            models.vae_encoder, None, resample_to=16, max_frames=81,
            frames=first_pixels[None], height=self.params.height,
            width=self.params.width, stream=False,
        )
        return jnp.concatenate(
            [first_latent[None].astype(self.all_latents.dtype), tail], axis=1
        )

    def plan_block_context(self, models):
        """Select the clean-context latents for this block's KV recompute
        (release_server.py:588-633) WITHOUT dispatching — the actual zero +
        prefill happens fused inside _block_step_fn.

        Returns (clean_context or None, model_input_start_frame)."""
        if self.block_idx == 0:
            if self.resume_latents is not None:
                self.current_start_frame = self.resume_latents.shape[1]
                self.all_latents = self.all_latents.at[
                    :, : self.current_start_frame
                ].set(self.resume_latents.astype(self.all_latents.dtype))
            else:
                return None, self.current_start_frame
        k = self.params.kv_cache_num_frames
        model_input_start_frame = min(self.current_start_frame, k)
        return self.get_clean_context_frames(models), model_input_start_frame

    def recompute_kv_cache(self, models) -> Optional[int]:
        """Standalone zero + re-prefill (kept for API parity; the hot loop
        uses the fused _block_step_fn instead)."""
        pipeline = models.pipeline
        clean_context, model_input_start_frame = self.plan_block_context(models)
        pipeline._initialize_kv_cache(1, self.frame_seq_length, jnp.bfloat16)
        if clean_context is None:
            return model_input_start_frame
        prefill = self._prefill_fn(clean_context.shape[1])
        pipeline.kv_cache = prefill(
            models.transformer.params, pipeline.kv_cache,
            pipeline.crossattn_cache, clean_context,
        )
        return model_input_start_frame

    # ------------------------------------------------------------------

    def generate_block_internal(self, models):
        """The per-block hot loop (release_server.py:635-736)."""
        idx = self.block_idx
        if idx >= self.num_blocks:
            return None

        if self.current_prompt_embeds is None:
            cond = models.text_encoder(text_prompts=[self.params.prompt])
            self.conditional_dict = {
                k: v.astype(jnp.bfloat16) for k, v in cond.items()
            }
            self.current_prompt_embeds = self.conditional_dict["prompt_embeds"]
            models.pipeline._initialize_crossattn_cache(self.current_prompt_embeds)

        if (
            idx > 0
            and self.current_start_frame + self.num_frame_per_block
            > self.all_latents.shape[1]
        ):
            # budget already exhausted: skip plan_block_context entirely —
            # at idx>0 it would pay the anti-drift single-frame re-encode
            # (~175 ms) just to have this block discarded (at idx==0 the
            # start frame isn't final until plan consumes resume_latents,
            # so the post-plan check below covers that case)
            return None
        clean_context, model_input_start_frame = self.plan_block_context(models)
        assert model_input_start_frame is not None
        if (
            self.current_start_frame + self.num_frame_per_block
            > self.all_latents.shape[1]
        ):
            # resume latents consumed the frame budget (possible at idx==0
            # too: plan_block_context just advanced current_start_frame by
            # the resume length) — end gracefully instead of slicing an
            # empty noise block (the reference would feed a short tensor
            # here and error out of the generate loop, release_server.py:660)
            return None
        # never appended — matches the reference, whose frame_ids list is
        # also born empty (release_server.py:649; tensor.request_id at :482
        # is attached but never read), so every frame is tagged UUID_NIL
        frame_ids: List[Optional[str]] = []

        if self.params.webcam_mode:
            latents = self.process_webcam_frames(models, idx)
            if latents is None:
                return None
            # like the reference (release_server.py:656), a mid-stream
            # strength update only mutates params.strength — the step list
            # (and so this mix) keeps the session's initial strength
            strength = float(self.denoising_step_list[0]) / 1000.0
            latents = latents[None].astype(self.noise.dtype)
            if latents.ndim == 6:
                latents = latents[0]
            self.rng, sub = jax.random.split(self.rng)
            nz = jax.random.normal(sub, latents.shape, jnp.float32).astype(latents.dtype)
            noisy_input = latents * (1.0 - strength) + nz * strength
        else:
            noisy_input = self.noise[
                :, self.current_start_frame : self.current_start_frame + self.num_frame_per_block
            ]

        if self.interpolated_prompt_embeds:
            next_emb = self.interpolated_prompt_embeds.pop(0)
            self.current_prompt_embeds = next_emb.astype(jnp.bfloat16)
            models.pipeline._initialize_crossattn_cache(self.current_prompt_embeds)

        steps = tuple(float(t) for t in self.denoising_step_list)
        nctx = clean_context.shape[1] if clean_context is not None else 0
        if clean_context is None:
            clean_context = jnp.zeros(
                (1, 0, 16, self.latent_height, self.latent_width), jnp.bfloat16
            )

        # throughput mode: denoise + whole-block decode in ONE dispatch.
        # Block 0 never lands here (its decode cache is still None), so the
        # first frames keep the low-TTFF streamed path below. DEFAULT ON:
        # whole-block decode is the reference's own serving granularity
        # (release_server.py:719-726 decodes denoised_pred for the full
        # block in one vae_decoder call and frame_callback receives the
        # whole block), and it is the configuration the headline bench
        # measures; RTV_SESSION_MEGAFUSE=0 restores per-latent streaming.
        # split-device/sharded deployments (vae_decoder pinned to its own
        # chip) compose with megafuse as TWO programs per block instead of
        # one: a fused reset+prefill+denoise dispatch on the DiT device and
        # a whole-block decode dispatch on the VAE device — the decode of
        # block n overlaps block n+1's denoise (the reference's CUDA-stream
        # overlap, release_server.py:727-729) while each device still pays
        # only one dispatch per block. The taehv tier never touches
        # vae_decoder, so it stays fully fused either way.
        split_vae = (
            getattr(models.vae_decoder, "device", None) is not None
            or getattr(models.vae_decoder, "mesh", None) is not None
        )
        if (
            os.getenv("RTV_SESSION_MEGAFUSE", "1") in ("1", "true")
            and not self.params.webcam_mode
            and self.decode_vae_cache is not None
        ):
            if self.current_use_taehv:
                _ensure_taehv_params(models)
                fused = fused_block_taehv_step(
                    models.transformer,
                    float(self.params.timestep_shift), steps, nctx,
                    self._max_attn(), self.frame_seq_length,
                    self.num_frame_per_block,
                )
                (x0, pixels, models.pipeline.kv_cache, self.decode_vae_cache,
                 self.rng) = fused(
                    models.transformer.params, models.pipeline.kv_cache,
                    models.pipeline.crossattn_cache, models.taehv_params,
                    self.decode_vae_cache, clean_context, noisy_input,
                    model_input_start_frame * self.frame_seq_length, self.rng,
                )
            elif split_vae:
                # two pipelined programs: fused denoise on the DiT device,
                # whole-block decode on the VAE device. No host sync between
                # them (decode_block dispatches async), so dev1 decodes this
                # block while dev0 starts the next one — bit-equal to serial
                # (dryrun phase 3c / tests/test_session split-megafuse test)
                step_fn = self._block_step_fn(steps, nctx)
                x0, models.pipeline.kv_cache, self.rng = step_fn(
                    models.transformer.params, models.pipeline.kv_cache,
                    models.pipeline.crossattn_cache, clean_context,
                    noisy_input,
                    model_input_start_frame * self.frame_seq_length, self.rng,
                )
                pixels, self.decode_vae_cache = models.vae_decoder.decode_block(
                    x0.astype(jnp.bfloat16), self.decode_vae_cache
                )
            else:
                fused = fused_block_decode_step(
                    models.transformer, models.vae_decoder,
                    float(self.params.timestep_shift), steps, nctx,
                    self._max_attn(), self.frame_seq_length,
                    self.num_frame_per_block,
                )
                (x0, pixels, models.pipeline.kv_cache, self.decode_vae_cache,
                 self.rng) = fused(
                    models.transformer.params, models.pipeline.kv_cache,
                    models.pipeline.crossattn_cache, models.vae_decoder.params,
                    self.decode_vae_cache, clean_context, noisy_input,
                    model_input_start_frame * self.frame_seq_length, self.rng,
                )
            self.all_latents = self.all_latents.at[
                :, self.current_start_frame : self.current_start_frame + self.num_frame_per_block
            ].set(x0)
            self.last_pred = x0
            for fi in range(pixels.shape[1]):
                self.frame_context_cache.append((pixels, fi))
            self.most_recent_frame = pixels[:, -1:]
            try:
                pixels.copy_to_host_async()
            except Exception:  # noqa: BLE001
                pass
            self.frame_callback(pixels, frame_ids, None)
            self.current_start_frame += self.num_frame_per_block
            self.total_frames_sent += pixels.shape[1]
            self.block_idx += 1
            self.resume_latents = None
            return pixels

        step_fn = self._block_step_fn(steps, nctx)
        x0, models.pipeline.kv_cache, self.rng = step_fn(
            models.transformer.params, models.pipeline.kv_cache,
            models.pipeline.crossattn_cache, clean_context, noisy_input,
            model_input_start_frame * self.frame_seq_length, self.rng,
        )

        self.all_latents = self.all_latents.at[
            :, self.current_start_frame : self.current_start_frame + self.num_frame_per_block
        ].set(x0)
        self.last_pred = x0

        if self.current_use_taehv:
            # cheap preview tier (reference use_taehv flag,
            # release_server.py:350 + demo_utils/taehv.py): ~50x less decode
            # FLOPs; first-block trim matches the Wan 1+4(n-1) cadence
            from realtime_video_tpu.models import taehv as taehv_mod

            _ensure_taehv_params(models)
            px, self.decode_vae_cache = taehv_mod.taehv_decode(
                models.taehv_params, x0.astype(jnp.bfloat16), self.decode_vae_cache
            )
            # taehv outputs ~[0,1]; session convention is [-1,1]. The
            # reference ships decode_video's trim disabled (taehv.py:233) and
            # relies on the common first-block drop below — mirror that.
            pixels = px * 2.0 - 1.0
        elif self.params.webcam_mode or frame_ids:
            # webcam path keeps the whole-block decode: frame_ids must stay
            # aligned with the emitted frames
            pixels, self.decode_vae_cache = models.vae_decoder.decode_block(
                x0.astype(jnp.bfloat16), self.decode_vae_cache
            )
        else:
            # stream the decode per latent frame: the block's first pixel
            # frames reach the client roughly two-thirds of a block-decode
            # earlier (TTFF), with math identical to the block decode (the
            # streaming conv cache carries across calls)
            drop = 3 if idx == 0 else 0
            parts = []
            for i in range(x0.shape[1]):
                px_i, self.decode_vae_cache = models.vae_decoder.decode_block(
                    x0[:, i : i + 1].astype(jnp.bfloat16), self.decode_vae_cache
                )
                for fi in range(px_i.shape[1]):
                    self.frame_context_cache.append((px_i, fi))
                out_i = px_i[:, drop:]
                drop = max(0, drop - px_i.shape[1])
                parts.append(out_i)
                if out_i.shape[1]:
                    self.most_recent_frame = out_i[:, -1:]
                    try:
                        out_i.copy_to_host_async()
                    except Exception:  # noqa: BLE001
                        pass
                    self.frame_callback(out_i, [], None)
                    self.total_frames_sent += out_i.shape[1]
            self.current_start_frame += self.num_frame_per_block
            self.block_idx += 1
            self.resume_latents = None
            return jnp.concatenate(parts, axis=1)

        # whole-block paths (taehv / webcam)
        # keep raw pixel frames for first-frame re-encode (anti-drift)
        for fi in range(pixels.shape[1]):
            self.frame_context_cache.append((pixels, fi))
        if idx == 0:
            pixels = pixels[:, 3:]  # drop first 3 frames of first block

        self.most_recent_frame = pixels[:, -1:]
        # start async device->host transfer before handing to the JPEG pool
        try:
            pixels.copy_to_host_async()
        except Exception:  # noqa: BLE001
            pass
        self.frame_callback(pixels, frame_ids, None)

        self.current_start_frame += self.num_frame_per_block
        self.total_frames_sent += pixels.shape[1]
        self.block_idx += 1
        self.resume_latents = None
        return pixels

    def generate_block(self, models):
        out = self.generate_block_internal(models)
        if out is None:
            import asyncio

            raise asyncio.CancelledError()
        return out

    def generate_blocks(self, num_blocks: int, models):
        for _ in range(num_blocks):
            self.generate_block(models)

    def __hash__(self):
        return id(self)
