"""Diffusion model wrapper (reference: utils/wan_wrapper.py:121-323
WanDiffusionWrapper) — unifies causal/bidirectional DiTs behind one forward
that returns (flow_pred, pred_x0) and owns the flow-matching schedule.
"""
from __future__ import annotations

import contextlib
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from realtime_video_tpu.config import WanModelConfig, WAN_CONFIGS
from realtime_video_tpu.models import wan_dit
from realtime_video_tpu.models.rope import RopeTables
from realtime_video_tpu.scheduler import FlowMatchSchedule

Params = Dict[str, Any]


@contextlib.contextmanager
def host_build_env():
    """Build/calibrate int8 params HOST-side: CPU default device + Pallas
    disabled. The int8 path round-trips params through numpy anyway, and
    eager calibration forwards on the TPU would churn the remote compile
    service with dozens of tiny one-off programs (bench.py and the serving
    load path both calibrate under this)."""
    prev_pallas = os.environ.get("RTV_DISABLE_PALLAS")
    os.environ["RTV_DISABLE_PALLAS"] = "1"
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            yield
    finally:
        if prev_pallas is None:
            del os.environ["RTV_DISABLE_PALLAS"]
        else:
            os.environ["RTV_DISABLE_PALLAS"] = prev_pallas


class WanDiffusion:
    """Holds (cfg, params, schedule, rope). All compute methods are pure and
    jit-friendly; jit happens at the pipeline level around whole-block steps.
    """

    def __init__(
        self,
        cfg: Optional[WanModelConfig] = None,
        params: Optional[Params] = None,
        model_name: str = "t2v-1.3B",
        timestep_shift: float = 5.0,
        is_causal: bool = True,
        checkpoint_path: Optional[str] = None,
        dtype=jnp.bfloat16,
        seed: int = 0,
        fuse_qkv: bool = False,
        quantize_linears: bool = False,
    ):
        if params is None and checkpoint_path and os.path.exists(checkpoint_path):
            from realtime_video_tpu.utils.checkpoint import load_wan_dit

            cfg, params = load_wan_dit(checkpoint_path, dtype)
        if cfg is None:
            cfg = WAN_CONFIGS[model_name]
        if params is None:
            params = wan_dit.init_wan_params(jax.random.PRNGKey(seed), cfg, dtype)
        if fuse_qkv:
            # inference-time fused projections (release_server.py:176-177)
            params = wan_dit.fuse_qkv_params(params)
        if quantize_linears:
            # int8 block linears (reference enable_fp8 tier, default off)
            params = wan_dit.quantize_wan_linears(params)
        self.cfg = cfg
        self.params = params
        self.is_causal = is_causal
        # non-causal models share one timestep across frames (wan_wrapper.py:145)
        self.uniform_timestep = not is_causal
        self.schedule = FlowMatchSchedule.create(
            shift=timestep_shift, sigma_min=0.0, extra_one_step=True
        )
        self.rope = RopeTables.create(cfg.head_dim)
        self.seq_len = 32760  # max tokens (wan_wrapper.py:153)

    def calibrate_act_scales(
        self,
        steps: Tuple[float, ...],
        lat_h: int = 16,
        lat_w: int = 16,
        kv_frames: int = 6,
        nfpb: int = 3,
        seed: int = 0,
    ) -> dict:
        """Record per-(site, layer) activation maxima over eager float decode
        forwards at each denoise timestep (+ the t=0 context-refresh pass) —
        the DiT analog of the VAE's TRT-style calibration and of torchao's
        static quant configs (release_server.py:179-182). Feed the result to
        quantize_wan_linears(act_scales=) for static int8 activation scales.

        Runs eagerly at small spatial dims (activation magnitudes transfer
        across resolution); must be called BEFORE quantization."""
        from realtime_video_tpu.ops import kv_cache as kvc

        cfg = self.cfg
        qkv = self.params["blocks"]["self_attn"].get("qkv") or \
            self.params["blocks"]["self_attn"].get("q")
        assert "w" in qkv, "calibrate on float params, before quantize"
        fsl = cfg.frame_seq_length(lat_h, lat_w)
        cache_size = kv_frames * fsl
        # the t=0 context-refresh pass must be covered; don't double-run it
        # when the caller's schedule already ends in the trailing zero
        ts = list(steps)
        if not ts or float(ts[-1]) != 0.0:
            ts.append(0.0)
        rngs = jax.random.split(jax.random.PRNGKey(seed), len(ts) + 1)
        ctx = jax.random.normal(rngs[-1], (1, 512, cfg.text_dim), jnp.bfloat16)
        cross = self.compute_crossattn_cache(self.params, ctx)
        kv = kvc.init_kv_cache(
            cfg.num_layers, 1, cache_size, cfg.num_heads, cfg.head_dim
        )
        if os.getenv("RTV_CAL_JIT", "1") in ("1", "true"):
            # jit-mode calibration (wan_dit._CALIB_JIT): amaxes ride the
            # layer scan as outputs, so the whole forward is ONE compiled
            # program reused across timesteps (same shapes) — ~20x faster
            # than the eager per-layer loop at 1.3B dims on one CPU core.
            # Math is identical: max|x| per site is order-independent.
            import numpy as np

            def _fwd(params, noisy, cross_, tt, kv_):
                wan_dit._ACT_CALIB = []
                wan_dit._CALIB_JIT = True
                try:
                    _, _, kv2 = self.forward(
                        params, noisy, cross_, tt, kv_cache=kv_,
                        current_start=(kv_frames - nfpb) * fsl, mode="decode",
                        max_attention_size=cache_size,
                    )
                    site_amax = wan_dit._ACT_CALIB[-1]
                finally:
                    wan_dit._ACT_CALIB = None
                    wan_dit._CALIB_JIT = False
                return kv2, site_amax

            fwd_j = jax.jit(_fwd, donate_argnums=(4,))
            amaxes = []
            for i, t in enumerate(ts):
                noisy = jax.random.normal(
                    rngs[i], (1, nfpb, cfg.in_dim, lat_h, lat_w), jnp.bfloat16
                )
                tt = jnp.full((1, nfpb), float(t), jnp.float32)
                kv, am = fwd_j(self.params, noisy, cross, tt, kv)
                amaxes.append(np.asarray(am, np.float64))
            arr = np.stack(amaxes).max(axis=0)  # [L, sites]
            sites = wan_dit._calib_site_order(self.params["blocks"])
            return {site: arr[:, j] for j, site in enumerate(sites)}
        wan_dit._ACT_CALIB = []
        try:
            for i, t in enumerate(ts):
                noisy = jax.random.normal(
                    rngs[i], (1, nfpb, cfg.in_dim, lat_h, lat_w), jnp.bfloat16
                )
                tt = jnp.full((1, nfpb), float(t), jnp.float32)
                _, _, kv = self.forward(
                    self.params, noisy, cross, tt, kv_cache=kv,
                    current_start=(kv_frames - nfpb) * fsl, mode="decode",
                    max_attention_size=cache_size,
                )
            records = list(wan_dit._ACT_CALIB)
        finally:
            wan_dit._ACT_CALIB = None
        return wan_dit.calibrate_wan_act_scales(
            records, self.params["blocks"], cfg.num_layers
        )

    # -- pure compute ------------------------------------------------------

    def compute_crossattn_cache(
        self, params: Params, prompt_embeds: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        return wan_dit.compute_crossattn_cache(self.cfg, params, prompt_embeds)

    def forward(
        self,
        params: Params,
        noisy: jnp.ndarray,  # [B, F, C, H, W]
        crossattn_cache: Dict[str, jnp.ndarray],
        timestep: jnp.ndarray,  # [B, F]
        kv_cache: Optional[Dict[str, jnp.ndarray]] = None,
        current_start: jnp.ndarray | int = 0,
        mode: str = "decode",
        max_attention_size: Optional[int] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        rolling: bool = False,
        sink_tokens: int = 0,
        sp_attn=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
        """Returns (flow_pred, pred_x0, new_kv_cache) — mirrors
        WanDiffusionWrapper.forward (wan_wrapper.py:230-301)."""
        t = timestep.astype(jnp.float32)
        if max_attention_size is None:
            fsl = self.cfg.frame_seq_length(noisy.shape[-2], noisy.shape[-1])
            max_attention_size = self.cfg.max_attention_size(fsl)
        flow, new_kv = wan_dit.dit_forward(
            self.cfg,
            params,
            noisy,
            t,
            self.rope,
            crossattn_cache,
            mode=mode,
            kv_cache=kv_cache,
            current_start=current_start,
            max_attention_size=max_attention_size,
            attn_mask=attn_mask,
            rolling=rolling,
            sink_tokens=sink_tokens,
            sp_attn=sp_attn,
        )
        x0 = self.schedule.flow_to_x0(flow, noisy, t)
        return flow, x0, new_kv

    def make_denoise_block_fn(
        self,
        steps: Tuple[float, ...],
        max_attention_size: int,
        refresh_t: Optional[float] = None,
    ):
        """Build the fused per-block denoise function: `lax.scan` over the
        denoising steps (one traced forward instead of len(steps) copies —
        compiles ~5x faster, identical math to the reference inner loop at
        release_server.py:669-706 / causal_inference.py:189-236).

        Returns fn(params, kv, cross, noisy, current_start, rng) ->
        (x0, kv, rng). Wrap in jax.jit(donate_argnums=(1,)) at the call site.
        """
        gen = self
        schedule = self.schedule
        steps_arr = jnp.asarray(steps, jnp.float32)
        nexts_arr = jnp.asarray(list(steps[1:]) + [0.0], jnp.float32)
        n_steps = len(steps)

        def fn(params, kv, cross, noisy, current_start, rng):
            b, f = noisy.shape[:2]

            def body(carry, xs):
                noisy_c, kv_c, rng_c = carry
                t_val, t_next, is_last = xs
                t = jnp.full((b, f), t_val, jnp.float32)
                _, x0, kv_c = gen.forward(
                    params, noisy_c, cross, t,
                    kv_cache=kv_c, current_start=current_start,
                    mode="decode", max_attention_size=max_attention_size,
                )
                rng_c, sub = jax.random.split(rng_c)
                nz = jax.random.normal(sub, x0.shape, jnp.float32).astype(x0.dtype)
                renoised = schedule.add_noise(
                    x0, nz, jnp.full((b, f), t_next, jnp.float32)
                )
                noisy_c = jnp.where(is_last, x0, renoised)
                return (noisy_c, kv_c, rng_c), x0

            is_last = jnp.arange(n_steps) == n_steps - 1
            (_, kv_out, rng_out), x0s = jax.lax.scan(
                body, (noisy, kv, rng), (steps_arr, nexts_arr, is_last)
            )
            x0 = x0s[-1]
            if refresh_t is not None:
                # clean-context cache refresh (causal_inference.py:227-236)
                t = jnp.full((b, f), refresh_t, jnp.float32)
                _, _, kv_out = gen.forward(
                    params, x0, cross, t,
                    kv_cache=kv_out, current_start=current_start,
                    mode="decode", max_attention_size=max_attention_size,
                )
            return x0, kv_out, rng_out

        return fn
