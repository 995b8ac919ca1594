"""Standard (non-causal) 50-step CFG sampling of a full clip — the teacher
inference path (reference pipeline/bidirectional_diffusion_inference.py:34-110).
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from realtime_video_tpu.config import SAMPLE_NEG_PROMPT
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.solvers import (
    FlowDPMSolverMultistep,
    FlowUniPCMultistep,
    get_sampling_sigmas,
)


class BidirectionalDiffusionInferencePipeline:
    def __init__(self, config, generator: WanDiffusion, text_encoder=None,
                 vae=None, sp_mesh=None):
        self.generator = generator
        self.text_encoder = text_encoder
        self.vae = vae
        self.guidance_scale = float(config.get("guidance_scale", 5.0))
        self.sample_solver = config.get("sample_solver", "unipc")
        self.sampling_steps = int(config.get("sampling_steps", 50))
        self.shift = float(config.get("timestep_shift", 5.0))
        # sp_mesh: shard the 32760-token teacher sequence over these devices
        # with hybrid USP attention (the reference runs its teacher under
        # xDiT USP the same way, text2video.py:87-97)
        self.sp_mesh = sp_mesh
        self._fwd = None

    def _forward(self, params, cross, x, t, sp_attn=None):
        # mask-free full bidirectional attention: no [L, L] mask tensor is
        # materialised (1 GB at the 32760-token teacher shape)
        flow, _, _ = self.generator.forward(
            params, x, cross, t, mode="train", sp_attn=sp_attn
        )
        return flow

    def _sp_attention(self):
        """Build the USP attention fn for self.sp_mesh (the xDiT hybrid:
        Ulysses degree = largest head divisor fitting the mesh, ring covers
        the rest — xdit_context_parallel.py:179-184)."""
        import numpy as np
        from jax.sharding import Mesh

        from realtime_video_tpu.parallel.sequence import make_usp_attention

        devs = np.asarray(self.sp_mesh.devices).reshape(-1)
        n = devs.size
        heads = self.generator.cfg.num_heads
        uly = max(d for d in range(1, n + 1) if n % d == 0 and heads % d == 0)
        mesh2 = Mesh(devs.reshape(n // uly, uly), ("sp_r", "sp_u"))
        return make_usp_attention(mesh2, "sp_u", "sp_r"), mesh2

    def inference(
        self,
        noise: jnp.ndarray,  # [B, F, C, h, w]
        text_prompts: Optional[List[str]] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        neg_prompt_embeds: Optional[jnp.ndarray] = None,
        return_latents: bool = False,
    ):
        b, f, c, h, w = noise.shape
        fsl = self.generator.cfg.frame_seq_length(h, w)
        if prompt_embeds is None:
            prompt_embeds = self.text_encoder(text_prompts)["prompt_embeds"]
        if neg_prompt_embeds is None:
            if self.text_encoder is not None:
                neg_prompt_embeds = self.text_encoder([SAMPLE_NEG_PROMPT] * b)[
                    "prompt_embeds"
                ]
            else:
                neg_prompt_embeds = jnp.zeros_like(prompt_embeds)
        cross_pos = self.generator.compute_crossattn_cache(
            self.generator.params, prompt_embeds.astype(jnp.bfloat16))
        cross_neg = self.generator.compute_crossattn_cache(
            self.generator.params, neg_prompt_embeds.astype(jnp.bfloat16))

        sp_attn = None
        if self.sp_mesh is not None:
            # no explicit input sharding: the frame count need not divide the
            # device count (21 frames over 8 devices at the teacher shape) —
            # the shard_map boundary inside sp_attn reshards the TOKEN axis
            # (f * fsl, which is divisible) and GSPMD propagates outward.
            sp_attn, _ = self._sp_attention()
        fwd = jax.jit(lambda p, cr, x, t: self._forward(p, cr, x, t, sp_attn))

        if self.sample_solver == "unipc":
            solver = FlowUniPCMultistep(shift=self.shift)
        else:
            solver = FlowDPMSolverMultistep(shift=self.shift)
        if isinstance(solver, FlowDPMSolverMultistep):
            # the reference dpm++ path feeds an explicit ladder
            # (causal_diffusion_inference.py:335-339)
            solver.set_timesteps(
                self.sampling_steps, shift=self.shift,
                sigmas=get_sampling_sigmas(self.sampling_steps, self.shift),
            )
        else:
            solver.set_timesteps(self.sampling_steps, shift=self.shift)

        latent = noise
        for t_val in solver.timesteps:
            # uniform timestep across frames (wan_wrapper.py:245-248)
            t = jnp.full((b, f), float(t_val), jnp.float32)
            flow_c = fwd(self.generator.params, cross_pos, latent, t)
            flow_u = fwd(self.generator.params, cross_neg, latent, t)
            flow = flow_u + self.guidance_scale * (flow_c - flow_u)
            latent = solver.step(flow, float(t_val), latent)

        video = None
        if self.vae is not None:
            video = self.vae.decode_to_pixel(latent)
            video = jnp.clip(video * 0.5 + 0.5, 0.0, 1.0)
        if return_latents:
            return video, latent
        return video
