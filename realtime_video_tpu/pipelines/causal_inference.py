"""Few-step block-causal sampler with KV cache — the product hot path.

Mirrors the reference `CausalInferencePipeline`
(pipeline/causal_inference.py:9-339): per-block spatial denoising loop over
`denoising_step_list` with re-noise between steps, a clean-context cache
refresh pass at `context_noise` after each block, optional prefill from
`initial_latent` (i2v / video extension), final VAE decode.

TPU design: the entire per-block loop (4-5 transformer forwards + renoise +
cache refresh) is ONE jitted function with the KV cache donated — per block
the host does a single dispatch; XLA keeps the cache in-place in HBM.
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.ops import kv_cache as kvc
from realtime_video_tpu.scheduler import warp_denoising_steps


class CausalInferencePipeline:
    def __init__(
        self,
        config,
        generator: WanDiffusion,
        text_encoder=None,
        vae=None,
    ):
        self.generator = generator
        self.text_encoder = text_encoder
        self.vae = vae
        self.args = config
        self.schedule = generator.schedule

        steps = list(config.denoising_step_list)
        if config.get("warp_denoising_step", False):
            # map integer steps through the shifted schedule
            # (causal_inference.py:29-32)
            steps = warp_denoising_steps(
                np.asarray(self.schedule.timesteps), steps
            ).tolist()
        self.denoising_step_list: Tuple[float, ...] = tuple(float(s) for s in steps)

        self.num_transformer_blocks = generator.cfg.num_layers
        self.num_frame_per_block = config.get("num_frame_per_block", 1)
        self.independent_first_frame = config.get("independent_first_frame", False)
        self.context_noise = float(config.get("context_noise", 0))
        #: cache length in frames (None -> global 21-frame window,
        #: causal_inference.py:284-289); the server overrides this per session
        self.local_attn_size = generator.cfg.local_attn_size
        self.kv_cache = None
        self.crossattn_cache = None
        self._crossattn_init = False
        self._block_fns: Dict[Any, Any] = {}
        self._prefill_fns: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    # jitted step builders (cached per static signature)
    # ------------------------------------------------------------------

    def frame_seq_length(self, latent_h: int, latent_w: int) -> int:
        return self.generator.cfg.frame_seq_length(latent_h, latent_w)

    def kv_cache_size(self, frame_seqlen: int) -> int:
        if self.local_attn_size != -1:
            return self.local_attn_size * frame_seqlen
        return 21 * frame_seqlen  # 32760 at 832x480 (causal_inference.py:289)

    def max_attention_size(self, frame_seqlen: int) -> int:
        return self.generator.cfg.max_attention_size(frame_seqlen)

    def _get_block_fn(self, steps: Tuple[float, ...], refresh_t: Optional[float], max_attn: int):
        # make_denoise_block_fn freezes generator.schedule at build time, so
        # the shift must be part of the key — a serving session mutating the
        # shared generator.schedule would otherwise be baked in (or a later
        # schedule change silently ignored)
        key = (steps, refresh_t, max_attn, float(self.generator.schedule.shift))
        if key in self._block_fns:
            return self._block_fns[key]
        fn = jax.jit(
            self.generator.make_denoise_block_fn(steps, max_attn, refresh_t),
            donate_argnums=(1,),
        )
        self._block_fns[key] = fn
        return fn

    def _get_prefill_fn(self, max_attn: int):
        """Decode-mode t=0 context write (causal_inference.py:137-170)."""
        if max_attn in self._prefill_fns:
            return self._prefill_fns[max_attn]
        gen = self.generator

        def prefill_fn(params, kv, cross, latents, current_start):
            b, f = latents.shape[:2]
            tarr = jnp.zeros((b, f), jnp.float32)
            _, _, kv = gen.forward(
                params, latents, cross, tarr,
                kv_cache=kv, current_start=current_start,
                mode="decode", max_attention_size=max_attn,
            )
            return kv

        fn = jax.jit(prefill_fn, donate_argnums=(1,))
        self._prefill_fns[max_attn] = fn
        return fn

    # ------------------------------------------------------------------
    # cache management (causal_inference.py:279-339)
    # ------------------------------------------------------------------

    def _initialize_kv_cache(self, batch_size, frame_seqlen, dtype=jnp.bfloat16):
        cache_size = self.kv_cache_size(frame_seqlen)
        cfg = self.generator.cfg
        shape_ok = (
            self.kv_cache is not None
            and self.kv_cache["k"].shape
            == (cfg.num_layers, batch_size, cache_size, cfg.num_heads, cfg.head_dim)
        )
        if shape_ok:
            self.kv_cache = kvc.reset_kv_cache(self.kv_cache)
        else:
            self.kv_cache = kvc.init_kv_cache(
                cfg.num_layers, batch_size, cache_size, cfg.num_heads, cfg.head_dim, dtype
            )

    def _initialize_crossattn_cache(self, prompt_embeds: jnp.ndarray):
        self.crossattn_cache = self.generator.compute_crossattn_cache(
            self.generator.params, prompt_embeds
        )
        self._crossattn_init = True

    # ------------------------------------------------------------------
    # inference (causal_inference.py:48-277)
    # ------------------------------------------------------------------

    def inference(
        self,
        noise: jnp.ndarray,  # [B, F, C, h, w]
        text_prompts: Optional[List[str]] = None,
        initial_latent: Optional[jnp.ndarray] = None,
        return_latents: bool = False,
        profile: bool = False,
        prompt_embeds: Optional[jnp.ndarray] = None,
        seed: int = 0,
        low_memory: bool = False,  # accepted for API parity; jax manages HBM
    ):
        del low_memory
        batch_size, num_frames, num_channels, h, w = noise.shape
        if not self.independent_first_frame or initial_latent is not None:
            assert num_frames % self.num_frame_per_block == 0
            num_blocks = num_frames // self.num_frame_per_block
        else:
            assert (num_frames - 1) % self.num_frame_per_block == 0
            num_blocks = (num_frames - 1) // self.num_frame_per_block
        num_input_frames = initial_latent.shape[1] if initial_latent is not None else 0
        num_output_frames = num_frames + num_input_frames

        if prompt_embeds is None:
            assert self.text_encoder is not None and text_prompts is not None
            prompt_embeds = self.text_encoder(text_prompts)["prompt_embeds"]
        prompt_embeds = prompt_embeds.astype(jnp.bfloat16)

        fsl = self.frame_seq_length(h, w)
        max_attn = self.max_attention_size(fsl)
        t_init0 = time.perf_counter()
        self._initialize_kv_cache(batch_size, fsl, noise.dtype)
        self._initialize_crossattn_cache(prompt_embeds)
        prefill = self._get_prefill_fn(max_attn)
        rng = jax.random.PRNGKey(seed)

        outputs = []
        current_start_frame = 0
        # Step 2: prefill context from initial latents (i2v / extension)
        if initial_latent is not None:
            if self.independent_first_frame:
                assert (num_input_frames - 1) % self.num_frame_per_block == 0
                num_input_blocks = (num_input_frames - 1) // self.num_frame_per_block
                outputs.append(initial_latent[:, :1])
                self.kv_cache = prefill(
                    self.generator.params, self.kv_cache, self.crossattn_cache,
                    initial_latent[:, :1], current_start_frame * fsl,
                )
                current_start_frame += 1
            else:
                assert num_input_frames % self.num_frame_per_block == 0
                num_input_blocks = num_input_frames // self.num_frame_per_block
            for _ in range(num_input_blocks):
                ref = initial_latent[
                    :, current_start_frame : current_start_frame + self.num_frame_per_block
                ]
                outputs.append(ref)
                self.kv_cache = prefill(
                    self.generator.params, self.kv_cache, self.crossattn_cache,
                    ref, current_start_frame * fsl,
                )
                current_start_frame += self.num_frame_per_block
        t_init = time.perf_counter() - t_init0

        # Step 3: temporal block loop
        block_fn = self._get_block_fn(
            self.denoising_step_list, self.context_noise, max_attn
        )
        all_num_frames = [self.num_frame_per_block] * num_blocks
        if self.independent_first_frame and initial_latent is None:
            all_num_frames = [1] + all_num_frames
        block_times = []
        t_diff0 = time.perf_counter()
        for current_num_frames in all_num_frames:
            tb0 = time.perf_counter()
            lo = current_start_frame - num_input_frames
            noisy_input = noise[:, lo : lo + current_num_frames]
            # a 1-frame first block (independent_first_frame) reuses the same
            # jitted fn: jax.jit specialises per input shape automatically
            x0, self.kv_cache, rng = block_fn(
                self.generator.params, self.kv_cache, self.crossattn_cache,
                noisy_input, current_start_frame * fsl, rng,
            )
            outputs.append(x0)
            current_start_frame += current_num_frames
            if profile:
                jax.block_until_ready(x0)
                block_times.append(time.perf_counter() - tb0)
        latents = jnp.concatenate(outputs, axis=1)
        assert latents.shape[1] == num_output_frames
        if profile:
            t_diff = time.perf_counter() - t_diff0
        # Step 4: decode
        t_vae0 = time.perf_counter()
        video = None
        if self.vae is not None:
            video = self.vae.decode_to_pixel(latents)
            video = jnp.clip(video * 0.5 + 0.5, 0.0, 1.0)
            if profile:
                jax.block_until_ready(video)
        if profile:
            t_vae = time.perf_counter() - t_vae0
            total = t_init + t_diff + t_vae
            print("Profiling results:")
            print(f"  - Initialization/caching time: {t_init*1e3:.2f} ms ({100*t_init/total:.2f}%)")
            print(f"  - Diffusion generation time: {t_diff*1e3:.2f} ms ({100*t_diff/total:.2f}%)")
            for i, bt in enumerate(block_times):
                print(f"    - Block {i} generation time: {bt*1e3:.2f} ms")
            print(f"  - VAE decoding time: {t_vae*1e3:.2f} ms ({100*t_vae/total:.2f}%)")
            print(f"  - Total time: {total*1e3:.2f} ms")

        if return_latents:
            return video, latents
        return video
