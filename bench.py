"""Benchmark: sustained T2V fps at 832x480, 4 denoising steps (the reference's
headline: 11 fps on a B200 with the 14B model, README.md:31).

Runs the full serving hot path per block on real TPU hardware:
  KV recompute/prefill + 4 denoise forwards + streaming VAE decode
(release_server.py:635-736). Model size auto-selects to fit the attached chip
(one v5e: 1.3B-dim model; a v5p-8 pod would run the 14B over the tp mesh).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")  # real backend
# a Pallas regression must fail the bench loudly, not silently cost ~1.7x
os.environ.setdefault("RTV_STRICT_KERNELS", "1")

# process-start anchor for the cold-start metric (bench.py is the entry
# script, so module import time == process start, pre-jax-import)
_PROC_T0 = time.perf_counter()


def _tl(label: str) -> None:
    # cold-start phase timeline (stderr): where the startup seconds go
    print(f"timeline: {label} @ {time.perf_counter() - _PROC_T0:.1f}s",
          file=sys.stderr)


def main() -> None:
    import jax

    if os.getenv("RTV_BENCH_CPU", "0") in ("1", "true"):
        # a JAX_PLATFORMS env var does NOT stick under the axon plugin (it
        # pre-registers itself); only the config update does (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: tunnel compiles take minutes; cache them
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(os.getenv("RTV_JAX_CACHE_DIR", "~/.rtv_jax_cache")),
    )
    # cache EVERY program incl. sub-1s eager ops: in the service's hang mode
    # each uncached tiny compile can block for minutes-hours, so a secured
    # cache must cover the whole process, not just the big model programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from realtime_video_tpu.config import (
        VAE_CONFIGS,
        WanModelConfig,
        load_server_config,
    )
    from realtime_video_tpu.models import vae as vae_mod
    from realtime_video_tpu.models import wan_dit as wan_dit_mod
    from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
    from realtime_video_tpu.models.vae_wrapper import VAEWrapper
    from realtime_video_tpu.ops import kv_cache as kvc

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() == "tpu"
    _tl("jax imported + backend attached")
    # RTV_BENCH_PRIME_ONLY=1 (with RTV_BENCH_CPU=1): build the full-size
    # int8 model host-side, write the act-scale + quantized-param caches,
    # and exit — primes a TPU bench's cold start without touching the chip
    prime_only = os.getenv("RTV_BENCH_PRIME_ONLY", "0") in ("1", "true")
    tiny = os.getenv("RTV_BENCH_TINY", "0") in ("1", "true") or (
        not on_tpu and not prime_only)

    # bench-infrastructure time excluded from cold_start_ms: the tunnel
    # health gate + compile-poisoning probe below exist to validate the
    # measurement window, not to serve frames (a real deployment has no
    # remote-tunnel health wait). cold_start_ms = process start -> first
    # frame readback, minus this gate.
    gate_s = 0.0
    if on_tpu and (
        os.getenv("RTV_BENCH_HEALTHCHECK", "1") in ("1", "true")
        or os.getenv("RTV_BENCH_COMPILE_PROBE", "1") in ("1", "true")
    ):
        _gate_t0 = time.perf_counter()
        # the remote tunnel intermittently degrades ~20-50x (measured: 4k
        # matmul at 11 TFLOP/s vs the 190 calibration). Probe with a cached
        # chained matmul and wait out degradation so the recorded number
        # reflects the chip, not the tunnel's bad hour. Bounded wait.
        import time as _t

        w0 = jax.random.normal(jax.random.PRNGKey(11), (4096, 4096), jnp.bfloat16) * 0.01

        @jax.jit
        def _mm_chain(a, iters):
            return jax.lax.fori_loop(0, iters, lambda _, ac: (ac @ w0 * 0.001).astype(ac.dtype), a)

        a0 = jax.random.normal(jax.random.PRNGKey(12), (4096, 4096), jnp.bfloat16)
        aw = _mm_chain(a0, 100)
        jax.device_get(aw[0, :2])  # compile+warm; different arg than timed
        # with the healthcheck off, still time ONE cached pass — the compile
        # probe needs the cached-program baseline to compare against
        health_wait = (
            float(os.getenv("RTV_BENCH_HEALTH_WAIT_S", "600"))
            if os.getenv("RTV_BENCH_HEALTHCHECK", "1") in ("1", "true")
            else 0.0
        )
        deadline = _t.time() + health_wait
        while True:
            t0 = _t.perf_counter()
            out = _mm_chain(aw, 100)
            jax.device_get(out[0, :2])
            tf = 2 * 4096**3 * 100 / (_t.perf_counter() - t0) / 1e12
            if tf > 100 or _t.time() > deadline:
                print(f"health: 4k matmul {tf:.0f} TFLOP/s", file=sys.stderr)
                break
            print(f"health: degraded tunnel ({tf:.0f} TFLOP/s), waiting...",
                  file=sys.stderr)
            _t.sleep(60)

        if os.getenv("RTV_BENCH_COMPILE_PROBE", "1") in ("1", "true"):
            # COMPILE-poisoning probe: the remote service intermittently emits
            # degraded executables (fresh 2k matmul at 42 TFLOP/s while cached
            # programs run full speed — CLAUDE.md sickness modes). A salted
            # (never-cached) compile measures today's compile quality; when
            # poisoned, prefer formulations whose programs are already in the
            # persistent cache over "optimised" ones that would compile sick
            # (measured: a sick-compiled re-encode took the bench 8.2 -> 4.1).
            salt = 1.0 + (_t.time() % 1000.0) * 1e-9

            @jax.jit
            def _mm_fresh(a, iters):
                return jax.lax.fori_loop(
                    0, iters,
                    lambda _, ac: (ac @ w0 * salt).astype(ac.dtype), a,
                )

            # the sick service sometimes never returns a fresh compile
            # (observed: tiny eager compiles hanging >25 min). Run the probe
            # in a daemon thread with a deadline; a timeout means the service
            # is unusable for fresh compiles — same verdict as "poisoned".
            # The orphaned thread finishes (or not) harmlessly; JAX compile
            # calls release the GIL, and nothing downstream depends on it.
            import threading as _th

            probe_out: dict = {}
            probe_expired = _th.Event()

            def _probe():
                af = _mm_fresh(a0, 100)
                jax.device_get(af[0, :2])
                if probe_expired.is_set():
                    # the deadline passed while the compile hung: the main
                    # thread is (or soon will be) inside the timed benchmark
                    # — do NOT dispatch the timed matmul chain on top of it
                    return
                t0 = _t.perf_counter()
                outf = _mm_fresh(af, 100)
                jax.device_get(outf[0, :2])
                probe_out["tf"] = (
                    2 * 4096**3 * 100 / (_t.perf_counter() - t0) / 1e12
                )

            th = _th.Thread(target=_probe, daemon=True)
            th.start()
            th.join(float(os.getenv("RTV_BENCH_PROBE_DEADLINE_S", "900")))
            probe_expired.set()
            tf_fresh = probe_out.get("tf", 0.0)  # 0.0 = hung past deadline
            print(f"health: fresh-compile {tf_fresh:.0f} TFLOP/s "
                  f"(cached {tf:.0f})"
                  + (" [probe timed out]" if th.is_alive() else ""),
                  file=sys.stderr)
            if tf_fresh < 0.7 * tf:
                # prefer whichever trace-set is KNOWN cached (markers written
                # by bench/secure_number_loop.sh). Flipping to the no-tapskip
                # variant is only right when that variant is the cached one;
                # with the default programs secured, keeping them means ZERO
                # fresh model compiles — flipping would force uncached
                # variant compiles in exactly the window where fresh compiles
                # are degraded (or, in hang mode, block indefinitely).
                markers = os.path.expanduser("~/.rtv_jax_cache_markers")
                if os.path.exists(os.path.join(markers, "default")):
                    print("health: compile service POISONED, but the "
                          "default-env programs are cache-secured — "
                          "keeping them", file=sys.stderr)
                else:
                    if "RTV_VAE_T1_TAPSKIP" not in os.environ:
                        vae_mod._T1_TAPSKIP = False
                    if "RTV_VAE_QCAT" not in os.environ:
                        vae_mod._QCAT = False
                    print("health: compile service POISONED — disabling T=1 "
                          "tap-skip and quantize-before-concat so the VAE "
                          "reuses the cached programs", file=sys.stderr)
        gate_s = time.perf_counter() - _gate_t0
        _tl(f"health gate done ({gate_s:.1f}s, excluded)")

    if tiny:
        cfg = WanModelConfig(dim=128, ffn_dim=256, num_heads=2, num_layers=2)
        lat_h, lat_w = 8, 8
        vae_cfg = VAE_CONFIGS["vae-tiny"]
        vae_cfg = type(vae_cfg)(dim=8, z_dim=16, dim_mult=(1, 1, 2, 2), num_res_blocks=1)
        num_blocks = 3
    else:
        # 1.3B dims — the largest Wan config that fits one v5e chip in bf16
        cfg = WanModelConfig(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30)
        lat_h, lat_w = 60, 104  # 480 x 832 pixels
        vae_cfg = VAE_CONFIGS["wan2.1"]
        num_blocks = int(os.getenv("RTV_BENCH_BLOCKS", "6"))

    steps = (1000.0, 937.0, 833.0, 625.0)  # 4-step schedule (server config)
    nfpb = 3
    kv_frames = 3 + nfpb  # kv_cache_num_frames=3 + block
    fsl = cfg.frame_seq_length(lat_h, lat_w)

    # int8 serving tier on by default (torchao-fp8 / TRT-int8 analogs; DiT
    # corr 0.999998, VAE within test tolerances). In-FUSED A/B on v5e:
    # int8 VAE 7.77 fps vs bf16 VAE 6.8-7.05 — the STANDALONE vae chain had
    # measured them equal (1206 vs 1215 ms), another standalone-harness lie;
    # only fused-bench A/Bs decide defaults. Disable with RTV_BENCH_INT8[_DIT]=0.
    int8_dit = os.getenv("RTV_BENCH_INT8_DIT", "1") in ("1", "true") and not tiny
    int8_vae = os.getenv("RTV_BENCH_INT8", "1") in ("1", "true") and not tiny
    use_taehv = os.getenv("RTV_BENCH_TAEHV", "0") in ("1", "true") and not tiny
    if int8_dit:
        # build + calibrate + quantize on the HOST: the int8 path round-trips
        # params through numpy anyway, and the calibration forwards would
        # otherwise churn the (slow, sometimes sick) tunnel compile service.
        # The finished QUANTIZED param tree is cached on disk (the analog of
        # the reference shipping prebuilt TRT engines / quantized weights):
        # a warm start skips the 1.3B random init + fuse + calibrate +
        # quantize entirely and goes straight to device_put.
        from realtime_video_tpu.models import diffusion_wrapper as dw_mod
        from realtime_video_tpu.models.diffusion_wrapper import host_build_env
        from realtime_video_tpu.utils import qcache

        static_scales = os.getenv(
            "RTV_BENCH_INT8_DIT_STATIC", "1") in ("1", "true")
        # key folds in hashes of wan_dit.py AND diffusion_wrapper.py (the
        # calibration pass) plus the quant-relevant env flags, so stale
        # entries miss automatically after model- or calibration-code
        # changes (ADVICE r4); "qp2" versions the cache layout. The
        # "bench_" prefixes keep bench's bare-tree schema out of the
        # serving loader's {"cfg","params"} namespace (utils/qcache.py).
        cal_key = qcache.cache_key(
            cfg.dim, cfg.ffn_dim, cfg.num_heads, cfg.num_layers, steps,
            qcache.code_hash(wan_dit_mod), qcache.code_hash(dw_mod),
            os.getenv("RTV_DIT_AMAX_SUB", ""),
            os.getenv("RTV_Q_RCP", ""),
            os.getenv("RTV_Q_BF16", ""),
            os.getenv("RTV_CAL_JIT", ""),
            static_scales, "qp2",
        )

        def _build_dit_qparams():
            with host_build_env():
                g = WanDiffusion(cfg=cfg, dtype=jnp.bfloat16,
                                 timestep_shift=5.0, fuse_qkv=True)
                act_scales = None
                if static_scales:
                    # calibrated static activation scales (mirrors the VAE's
                    # +0.42 fps static-amax win): one jitted float pass per
                    # denoise timestep at small spatial dims (RTV_CAL_JIT),
                    # then no amax pass at all at serving time
                    act_scales = qcache.cached_tree(
                        "bench_dit_scales", cal_key,
                        lambda: g.calibrate_act_scales(steps))
                return wan_dit_mod.quantize_wan_linears(
                    g.params, act_scales=act_scales)

        qparams = qcache.cached_tree("bench_dit_qparams", cal_key,
                                     _build_dit_qparams)
        gen = WanDiffusion(cfg=cfg, params=qparams, dtype=jnp.bfloat16,
                           timestep_shift=5.0)
        _tl(f"DiT int8 params ready (key {cal_key})")
        if prime_only:
            print(f"primed DiT caches (key {cal_key})", file=sys.stderr)
        else:
            # async upload: the transfer overlaps the block-0 program's
            # compile-cache load below (serializing it here measured 31.5 s
            # of the 89 s cold start)
            gen.params = jax.device_put(qparams, dev)
            _tl("DiT params dispatched to device (async)")
    else:
        gen = WanDiffusion(cfg=cfg, dtype=jnp.bfloat16, timestep_shift=5.0,
                           fuse_qkv=True)
    # with >=2 attached devices the VAE rides its own chip: decode of block n
    # overlaps the denoise of block n+1 (both dispatch async; different
    # devices execute concurrently). No-op on the single tunnel chip.
    vae_dev_idx = int(os.getenv("RTV_VAE_DEVICE", "1" if len(jax.devices()) > 1 else "-1"))
    vae_dev = jax.devices()[vae_dev_idx] if 0 <= vae_dev_idx < len(jax.devices()) else None
    if int8_vae:
        # build + calibrate + quantize HOST-side and cache the finished
        # quantized VAE param tree on disk, mirroring the DiT path above
        # (the eager calibration pass would otherwise churn the tunnel's
        # compile service with tiny one-off programs on every cold start)
        from realtime_video_tpu.models.diffusion_wrapper import host_build_env
        from realtime_video_tpu.utils import qcache

        static_v = os.getenv("RTV_BENCH_INT8_STATIC", "1") in ("1", "true")
        skip_enc = os.getenv("RTV_BENCH_INT8_ENC", "1") not in ("1", "true")
        vq_key = qcache.cache_key(repr(vae_cfg), static_v, skip_enc,
                                  qcache.code_hash(vae_mod), "vq2")

        def _build_vae_qparams():
            with host_build_env():
                vp = vae_mod.init_vae_params(
                    jax.random.PRNGKey(1), vae_cfg, jnp.bfloat16)
                act_scales = None
                if static_v:
                    # calibrated static activation scales (TRT-calibration
                    # analog): drops the per-call dynamic amax pass.
                    # Calibrate eagerly at small spatial dims — scales
                    # transfer across resolution. Fused A/B on v5e: 8.21 vs
                    # 7.79 fps — default ON.
                    zc = jax.random.normal(
                        jax.random.PRNGKey(9), (1, 2, 8, 8, 16), jnp.bfloat16
                    )
                    pxc = jax.random.uniform(
                        jax.random.PRNGKey(10), (1, 1, 64, 64, 3),
                        jnp.bfloat16, minval=-1.0, maxval=1.0,
                    )
                    act_scales = vae_mod.calibrate_vae_act_scales(
                        vae_cfg, vp, zc, pxc
                    )
                return vae_mod.quantize_vae_params(
                    vp, act_scales=act_scales, skip_encoder=skip_enc
                )

        vparams = qcache.cached_tree("bench_vae_qparams", vq_key,
                                     _build_vae_qparams)
        vae = VAEWrapper(cfg=vae_cfg, params=vparams, device=vae_dev)
        _tl(f"VAE int8 params ready (key {vq_key})")
        pin = vae_dev if vae_dev is not None else (dev if on_tpu else None)
        if pin is not None and not prime_only:
            vae.params = jax.device_put(vae.params, pin)
    else:
        vae = VAEWrapper(cfg=vae_cfg, params=vae_mod.init_vae_params(
            jax.random.PRNGKey(1), vae_cfg, jnp.bfloat16), device=vae_dev)
    if prime_only:
        print("primed host-side caches; exiting before device work",
              file=sys.stderr)
        return
    if use_taehv:
        # preview decode tier (reference use_taehv flag, release_server.py:350)
        from realtime_video_tpu.models import taehv as taehv_mod

        taehv_params = taehv_mod.init_taehv_params(jax.random.PRNGKey(5), jnp.bfloat16)

        class _TaehvVae:
            def decode_block(self, z, cache=None):
                return taehv_mod.taehv_decode(taehv_params, z, cache)

        vae = _TaehvVae()

    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 512, cfg.text_dim), jnp.bfloat16)
    cross = gen.compute_crossattn_cache(gen.params, ctx)
    _tl("crossattn cache dispatched")
    cache_size = kv_frames * fsl
    kv = kvc.init_kv_cache(cfg.num_layers, 1, cache_size, cfg.num_heads, cfg.head_dim)

    # tp-shard the serving state when a mesh is attached (a v5p/v5e pod slice;
    # the single tunnel chip stays unsharded). Heads shard over "tp"; GSPMD
    # emits the per-layer collectives. The VAE's pinned device is EXCLUDED
    # from the tp mesh so decode genuinely overlaps the denoise instead of
    # serializing with a DiT shard on the same chip (and double-committing
    # that chip's HBM).
    dit_devices = [d for d in jax.devices() if d is not vae_dev]
    if len(dit_devices) > 1 and not tiny:
        from realtime_video_tpu.parallel.mesh import make_mesh
        from realtime_video_tpu.parallel.plan import shard_for_serving

        n = len(dit_devices)
        tp = max(d for d in (8, 4, 2, 1) if n % d == 0 and cfg.num_heads % d == 0)
        mesh = make_mesh({"tp": tp}, devices=dit_devices[:tp])
        gen.params, kv, cross = shard_for_serving(gen.params, kv, cross, mesh)
        print(f"config: DiT tp={tp} over {[d.id for d in dit_devices[:tp]]}, "
              f"VAE on {vae_dev.id if vae_dev is not None else 'shared'}",
              file=sys.stderr)
    schedule = gen.schedule

    del schedule
    from realtime_video_tpu.models import wan_dit
    from realtime_video_tpu.ops import attention as attn_ops

    # one fused dispatch per block: zero cache + context prefill + denoise
    # scan — identical to the serving hot loop (GenerationSession._block_step_fn)
    denoise = gen.make_denoise_block_fn(steps, cache_size, refresh_t=None)

    def block_step(params, kv, cross, clean_ctx, noisy, current_start, rng):
        kv = kvc.reset_kv_cache(kv)
        kv = wan_dit.context_prefill(
            gen.cfg, params, clean_ctx, gen.rope, cross, kv,
            block_tokens=fsl * nfpb, max_attention_size=cache_size,
        )
        return denoise(params, kv, cross, noisy, current_start, rng)

    step_fn = jax.jit(block_step, donate_argnums=(1,))

    # block-0 variant for TTFF: the serving session's FIRST block has an
    # empty context queue (t2v), so there is no prefill — just reset +
    # denoise at position 0 (session.py _block_step_fn_cached num_ctx=0;
    # reference: release_server.py first block conditions on nothing)
    def block0_step(params, kv, cross, noisy, rng):
        return denoise(params, kvc.reset_kv_cache(kv), cross, noisy, 0, rng)

    step0_fn = jax.jit(block0_step, donate_argnums=(1,))

    rng = jax.random.PRNGKey(0)
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (1, nfpb, 16, lat_h, lat_w), jnp.bfloat16
    )
    ctx_frames = jax.random.normal(
        jax.random.PRNGKey(4), (1, kv_frames - nfpb, 16, lat_h, lat_w), jnp.bfloat16
    )

    # anti-drift first-frame re-encode: the serving session re-encodes the
    # oldest cached pixel frame through the VAE encoder every post-warmup
    # block (session.py get_clean_context_frames / release_server.py:573-575).
    # Round 1 omitted this cost; include it so the bench is the true hot path.
    reencode = (
        os.getenv("RTV_BENCH_REENCODE", "1") in ("1", "true")
        and not tiny and not use_taehv
    )
    # MEGAFUSE: ONE program per block — re-encode + prefill + denoise scan +
    # all-latent decode (lax.scan over the VAE cache carry) — plus one fused
    # block-0+first-frame program for TTFF. Dodges per-dispatch overhead
    # (the round-4 sickness flavor taxes EVERY dispatch ~32 ms: loop-chain
    # t1=33.3ms t10=32.5ms t100=38.9ms, bench/stall_probe.py) and is the
    # natural XLA shape anyway: the host only dispatches once per block.
    # Excluded when the VAE rides its own chip (split-device overlap needs
    # separate programs) and for the TAEHV preview tier.
    # DEFAULT ON (fused A/B 2026-08-19: 9.121 fps vs 6.762 on the same
    # sick-window cache — and above the 8.213 healthy-era best, since even
    # healthy dispatches cost ~5-10 ms × ~10/block on the tunnel)
    mega = (
        os.getenv("RTV_BENCH_MEGAFUSE", "1") in ("1", "true")
        and vae_dev is None
    )

    if mega and use_taehv:
        # preview-tier megafuse: prefill + denoise scan + whole-block TAEHV
        # decode in ONE program. No anti-drift re-encode in this tier (same
        # convention as the streamed taehv path); TAEHV decodes all 3
        # latents in one call, so no scan is needed.
        def mega_block_thv(params, kv, cross, tparams, tstate, ctx_rest,
                           noisy, current_start, rng):
            x0, kv, rng = block_step(
                params, kv, cross, ctx_rest, noisy, current_start, rng
            )
            px, tstate = taehv_mod.taehv_decode(
                tparams, x0.astype(jnp.bfloat16), tstate
            )
            return px, kv, tstate, rng

        mega_thv_fn = jax.jit(mega_block_thv, donate_argnums=(1, 4))

        def mega_block0_thv(params, kv, cross, tparams, noisy, rng):
            x0, kv, rng = denoise(
                params, kvc.reset_kv_cache(kv), cross, noisy, 0, rng
            )
            px1, tstate = taehv_mod.taehv_decode(
                tparams, x0[:, :1].astype(jnp.bfloat16), None
            )
            return px1, kv, tstate, rng

        mega0_thv_fn = jax.jit(mega_block0_thv, donate_argnums=(1,))

        _tl("compiling fused block-0 program (TAEHV)")
        px1, kv, tstate, rng = mega0_thv_fn(
            gen.params, kv, cross, taehv_params, noise, rng
        )
        jax.device_get(px1[0, -1, :, ::64, ::64])
        cold_start_ms = (time.perf_counter() - _PROC_T0 - gate_s) * 1e3
        _tl(f"first frame read back (cold_start {cold_start_ms / 1e3:.1f}s)")
        px, kv, tstate, rng = mega_thv_fn(
            gen.params, kv, cross, taehv_params, tstate, ctx_frames,
            noise, (kv_frames - nfpb) * fsl, rng,
        )
        jax.device_get(px[0, -1, :, ::64, ::64])
    elif mega:
        vcfg = vae.cfg

        def mega_block(params, kv, cross, vparams, vcache, px_tail,
                       ctx_rest, noisy, current_start, rng):
            # px_tail [B,1,H,W,3] (VAE layout): previous block's last frame
            if reencode:
                first_lat, _ = vae_mod.encode_chunks(
                    vcfg, vparams, px_tail, None, stream=False
                )
                ctx_in = jnp.concatenate(
                    [first_lat.transpose(0, 1, 4, 2, 3).astype(ctx_rest.dtype),
                     ctx_rest[:, 1:]], axis=1,
                )
            else:
                ctx_in = ctx_rest
            x0, kv, rng = block_step(
                params, kv, cross, ctx_in, noisy, current_start, rng
            )
            z = x0.astype(jnp.bfloat16).transpose(0, 1, 3, 4, 2)  # [B,T,h,w,z]

            def dec(c, z1):
                px1, c = vae_mod.decode_chunks(
                    vcfg, vparams, z1[:, None], c, first=False, chunk=1
                )
                return c, px1

            vcache, pxs = jax.lax.scan(dec, vcache, jnp.moveaxis(z, 1, 0))
            # pxs [T, B, 4, H, W, 3]; feed the last frame back for the next
            # block's re-encode without any host-side slicing dispatch
            return pxs, kv, vcache, rng, pxs[-1, :, -1:]

        mega_fn = jax.jit(mega_block, donate_argnums=(1, 4))

        def mega_block0(params, kv, cross, vparams, noisy, rng):
            # serving block 0: empty context queue -> no prefill; stream the
            # FIRST latent's decode (fresh VAE stream) in the same program
            x0, kv, rng = denoise(
                params, kvc.reset_kv_cache(kv), cross, noisy, 0, rng
            )
            z1 = x0[:, :1].astype(jnp.bfloat16).transpose(0, 1, 3, 4, 2)
            px1, vc = vae_mod.decode_chunks(
                vcfg, vparams, z1, None, first=True, chunk=1
            )
            return px1, kv, vc, rng

        mega0_fn = jax.jit(mega_block0, donate_argnums=(1,))

        # warmup / compile both fused programs (the reference precompiles at
        # server start, release_server.py:753-755)
        _tl("compiling fused block-0 program")
        px1, kv, vcache, rng = mega0_fn(
            gen.params, kv, cross, vae.params, noise, rng
        )
        # warm the EXACT readback slice programs the timed sections use —
        # an unwarmed gather compiles inside the timed region (fresh tiny
        # compiles cost seconds over the tunnel; measured ttff 3475 ms from
        # exactly this)
        jax.device_get(px1[0, -1, ::64, ::64, :])
        cold_start_ms = (time.perf_counter() - _PROC_T0 - gate_s) * 1e3
        _tl(f"first frame read back (cold_start {cold_start_ms / 1e3:.1f}s)")
        px_tail = px1[:, -1:]
        _tl("compiling warm-block megafuse program")
        pxs, kv, vcache, rng, px_tail = mega_fn(
            gen.params, kv, cross, vae.params, vcache, px_tail, ctx_frames,
            noise, (kv_frames - nfpb) * fsl, rng,
        )
        jax.device_get(pxs[-1, 0, -1, ::64, ::64, :])
        _tl("warm-block program ready")
    else:
        # warmup / compile the fused step + BOTH vae variants (first +
        # streaming). Decode per latent frame — the serving session's
        # streamed-decode path.
        x0, kv, rng = step_fn(
            gen.params, kv, cross, ctx_frames, noise, (kv_frames - nfpb) * fsl, rng
        )
        px, vcache = vae.decode_block(x0[:, :1].astype(jnp.bfloat16))
        px, vcache = vae.decode_block(x0[:, :1].astype(jnp.bfloat16), vcache)
        # warm the exact readback slice programs (see mega branch note)
        jax.device_get(px[0, -1, :, ::64, ::64])
        cold_start_ms = (time.perf_counter() - _PROC_T0 - gate_s) * 1e3
        _tl(f"first frame read back (cold_start {cold_start_ms / 1e3:.1f}s)")
        # warm the block-0 (no-prefill) program too, so the TTFF measurement
        # below times execution, not compilation
        x0b0, kv, rng = step0_fn(gen.params, kv, cross, noise, rng)
        jax.device_get(x0b0[0, 0, 0, 0, :2])

    if on_tpu:
        # the hot attention entry must have traced onto the Pallas kernel
        # (context_prefill routes the one-block context write through the
        # decode program too, so "decode" covers the whole hot path)
        path = attn_ops.KERNEL_PATHS.get("decode")
        assert path == "pallas", (
            f"decode attention traced onto {path!r}, expected the Pallas "
            "fast path — kernel regression"
        )

    # timed: steady-state blocks (recompute-prefill + denoise + decode).
    # All blocks are enqueued via JAX async dispatch and synced once — the
    # streaming server works the same way (the host never blocks per frame),
    # and this keeps host/tunnel RTT off the measured path.
    profile_dir = os.getenv("RTV_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    if reencode and not mega:
        # bf16, matching the reference's .half() re-encode (release_server.py:574)
        enc_in = px[:, -1:].astype(jnp.bfloat16)  # [1,1,3,H,W] from the decode
        first_lat = vae.encode_to_latent(enc_in)  # warm/compile
        jax.device_get(first_lat[0, 0, 0, 0, :2])

    frames_out = 0
    outs = []
    t0 = time.perf_counter()
    if mega and use_taehv:
        for blk in range(num_blocks):
            px, kv, tstate, rng = mega_thv_fn(
                gen.params, kv, cross, taehv_params, tstate, ctx_frames,
                noise, (kv_frames - nfpb) * fsl, rng,
            )
            outs.append(px)
            frames_out += px.shape[1]
        _sync = jax.device_get(outs[-1][0, -1, :, ::64, ::64])
    elif mega:
        for blk in range(num_blocks):
            pxs, kv, vcache, rng, px_tail = mega_fn(
                gen.params, kv, cross, vae.params, vcache, px_tail,
                ctx_frames, noise, (kv_frames - nfpb) * fsl, rng,
            )
            outs.append(pxs)
            frames_out += pxs.shape[0] * pxs.shape[2]
        # final-frame readback: the only trustworthy barrier over the tunnel
        _sync = jax.device_get(outs[-1][-1, 0, -1, ::64, ::64, :])
    else:
        for blk in range(num_blocks):
            if reencode:
                first_lat = vae.encode_to_latent(px[:, -1:].astype(jnp.bfloat16))
                ctx_in = jnp.concatenate(
                    [first_lat.astype(ctx_frames.dtype), ctx_frames[:, 1:]], axis=1
                )
            else:
                ctx_in = ctx_frames
            x0, kv, rng = step_fn(
                gen.params, kv, cross, ctx_in, noise, (kv_frames - nfpb) * fsl, rng
            )
            for i in range(x0.shape[1]):
                px, vcache = vae.decode_block(
                    x0[:, i : i + 1].astype(jnp.bfloat16), vcache
                )
                outs.append(px)
                frames_out += px.shape[1]
        # axon's block_until_ready can return before remote execution
        # finishes — a host readback of the final frame (which depends on
        # every prior block through the donated kv/vae caches) is the only
        # trustworthy barrier
        _sync = jax.device_get(outs[-1][0, -1, :, ::64, ::64])
    dt = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()
    fps = frames_out / dt

    # TTFF (BASELINE.md north star #2: p50 < 1.5 s): warm-server first-frame
    # latency — one block-0 step (no context prefill and no re-encode: the
    # session's first block has an EMPTY context queue for t2v, so it only
    # resets the KV cache and denoises at position 0) + streamed decode of
    # the FIRST latent only + host readback. Inputs have evolved past the
    # warmup pair, so the dispatch-dedupe cannot fake this (CLAUDE.md
    # measurement rules).
    # p50 over a few repeated session-starts (BASELINE.md: "p50 < 1.5 s"):
    # the first start right after the throughput loop can pay a remote
    # executable reload (measured 3.5-4.5 s once, ~0.9 s steady) — the
    # median is the serving-relevant number.
    reps = []
    for _ in range(int(os.getenv("RTV_BENCH_TTFF_REPS", "3"))):
        if mega:
            # a fresh zeroed cache, like a new session's first block — and
            # the same input layout the warmup compiled against (the loop's
            # donated kv alias carries mega_fn's OUTPUT layout; feeding it
            # here re-triggered a 22 s mega0 recompile on chip)
            kv = kvc.init_kv_cache(
                cfg.num_layers, 1, cache_size, cfg.num_heads, cfg.head_dim
            )
        t0 = time.perf_counter()
        if mega and use_taehv:
            px1, kv, _ts, rng = mega0_thv_fn(
                gen.params, kv, cross, taehv_params, noise, rng
            )
            jax.device_get(px1[0, -1, :, ::64, ::64])
        elif mega:
            px1, kv, _vc, rng = mega0_fn(
                gen.params, kv, cross, vae.params, noise, rng
            )
            jax.device_get(px1[0, -1, ::64, ::64, :])
        else:
            x0, kv, rng = step0_fn(gen.params, kv, cross, noise, rng)
            px1, _ = vae.decode_block(x0[:, :1].astype(jnp.bfloat16))
            jax.device_get(px1[0, -1, :, ::64, ::64])
        reps.append((time.perf_counter() - t0) * 1e3)
    print(f"ttff reps: {[round(r, 1) for r in reps]}", file=sys.stderr)
    ttff_ms = sorted(reps)[len(reps) // 2]

    label = "tiny" if tiny else ("1.3b_taehv" if use_taehv else "1.3b")
    print(json.dumps({
        "metric": f"t2v_fps_832x480_4step_{label}_{jax.default_backend()}",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 11.0, 4),
        "ttff_ms": round(ttff_ms, 1),
        # process start -> first decoded frame readback (VERDICT r4 #6),
        # EXCLUDING the tunnel health gate / compile-poisoning probe (bench
        # measurement infrastructure, not serving stack). With a primed
        # persistent compile cache + calibration cache this is model build +
        # cache-load + residual-compile time; a cold cache pays full remote
        # compiles here.
        "cold_start_ms": round(cold_start_ms, 1),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — degrade rather than emit nothing
        import gc

        import traceback

        print(f"full-size bench failed ({type(e).__name__}); tiny fallback", file=sys.stderr)
        traceback.print_exc(limit=20, file=sys.stderr)
        # drop the traceback's frame refs so the failed attempt's HBM frees
        e.__traceback__ = None
        del e
        gc.collect()
        os.environ["RTV_BENCH_TINY"] = "1"
        main()
