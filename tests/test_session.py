"""GenerationSession end-to-end on tiny models: the serving hot loop —
per-block KV recompute, denoise, streaming VAE decode, frame callbacks,
prompt interpolation (release_server.py:344-751 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import (
    VAEConfig,
    WanModelConfig,
    load_server_config,
)
from realtime_video_tpu.models import vae as vae_mod
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.models.vae_wrapper import VAEWrapper
from realtime_video_tpu.pipelines import CausalInferencePipeline
from realtime_video_tpu.serving.models import Models
from realtime_video_tpu.serving.params import GenerateParams
from realtime_video_tpu.serving.session import GenerationSession

WAN_TINY = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
VAE_TINY = VAEConfig(dim=8, z_dim=16, dim_mult=(1, 1, 2, 2), num_res_blocks=1)


@pytest.fixture(scope="module")
def models():
    config = load_server_config(
        denoising_step_list=[1000, 750, 500], num_frame_per_block=3
    )
    gen = WanDiffusion(cfg=WAN_TINY, dtype=jnp.bfloat16)
    vae = VAEWrapper(
        cfg=VAE_TINY,
        params=vae_mod.init_vae_params(jax.random.PRNGKey(7), VAE_TINY, jnp.bfloat16),
    )
    class PromptHashEncoder:
        """Prompt-sensitive fake encoder (unlike StaticTextEncoder, needed for
        interpolation tests)."""

        def __call__(self, text_prompts):
            key = jax.random.PRNGKey(abs(hash(text_prompts[0])) % (2**31))
            return {
                "prompt_embeds": jax.random.normal(
                    key, (1, 64, WAN_TINY.text_dim), jnp.bfloat16
                )
            }

    te = PromptHashEncoder()
    pipeline = CausalInferencePipeline(config, gen, text_encoder=te, vae=vae)
    return Models(te, gen, pipeline, vae, vae), config


def _params(**kw):
    base = dict(
        prompt="a cat", width=64, height=64, seed=3,
        kv_cache_num_frames=3, num_blocks=3, num_denoising_steps=3,
    )
    base.update(kw)
    return GenerateParams(**base)


def test_session_generates_blocks_with_streaming_decode(models, monkeypatch):
    # the per-latent streamed path is opt-in now (whole-block decode is the
    # default — the reference's own serving granularity, release_server.py:
    # 719-726); this test exercises streaming mode explicitly
    monkeypatch.setenv("RTV_SESSION_MEGAFUSE", "0")
    m, config = models
    frames_per_block = []

    def cb(pixels, frame_ids, event):
        frames_per_block.append(np.asarray(pixels, np.float32))

    s = GenerationSession(_params(), config, frame_callback=cb, models=m)
    assert s.num_blocks == 3
    for _ in range(3):
        s.generate_block(m)
    # per-latent-frame streamed decode (TTFF): the callback fires per
    # sub-chunk. Block 0 decodes 1+4+4 and drops the first 3 -> [2, 4];
    # blocks 1,2 decode 4+4+4 -> [4, 4, 4] each. Totals: 6 + 12 + 12.
    assert [f.shape[1] for f in frames_per_block] == [2, 4] + [4, 4, 4] * 2
    assert sum(f.shape[1] for f in frames_per_block) == 30
    assert s.total_frames_sent == 30
    h = w = 64
    assert all(f.shape[2:] == (3, h, w) for f in frames_per_block)
    assert all(np.isfinite(f).all() for f in frames_per_block)
    # all_latents got filled
    assert float(jnp.abs(s.all_latents).sum()) > 0
    # completion: next block raises CancelledError via generate_block
    import asyncio

    with pytest.raises(asyncio.CancelledError):
        s.generate_block(m)


def test_session_determinism(models):
    m, config = models
    outs = []
    for _ in range(2):
        acc = []
        s = GenerationSession(
            _params(seed=11), config,
            frame_callback=lambda p, i, e: acc.append(np.asarray(p, np.float32)),
            models=m,
        )
        s.generate_block(m)
        outs.append(acc[0])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-3, atol=1e-3)


def test_prompt_interpolation(models):
    m, config = models
    s = GenerationSession(_params(), config, frame_callback=lambda *a: None, models=m)
    s.generate_block(m)
    before = s.current_prompt_embeds
    s.interpolate_prompt_embeds(m, "a dog on a skateboard", 2)
    assert len(s.interpolated_prompt_embeds) == 2
    # linspace(0,1,2) -> first interpolated embed is the OLD prompt (weight 0),
    # second is the new one (release_server.py:463-468)
    s.generate_block(m)
    assert len(s.interpolated_prompt_embeds) == 1
    s.generate_block(m)
    assert len(s.interpolated_prompt_embeds) == 0
    assert not np.allclose(
        np.asarray(before, np.float32),
        np.asarray(s.current_prompt_embeds, np.float32),
    )


def test_anti_drift_first_frame_reencode(models):
    """Block 2+ with keep_first_frame=False triggers the pixel re-encode path
    (release_server.py:571-575)."""
    m, config = models
    s = GenerationSession(
        _params(num_blocks=3, keep_first_frame=False), config,
        frame_callback=lambda *a: None, models=m,
    )
    for _ in range(3):
        s.generate_block(m)
    assert s.block_idx == 3


def test_taehv_preview_tier(models):
    """use_taehv config flag: cheap preview decode keeps the frame cadence
    (release_server.py:350 + demo_utils/taehv.py)."""
    from realtime_video_tpu.config import load_server_config

    m, _ = models
    config = load_server_config(
        denoising_step_list=[1000, 500], num_frame_per_block=3, use_taehv=True
    )
    frames = []
    s = GenerationSession(
        _params(num_blocks=2, num_denoising_steps=2), config,
        frame_callback=lambda p, i, e: frames.append(np.asarray(p, np.float32)),
        models=m,
    )
    s.generate_block(m)
    s.generate_block(m)
    # taehv emits 4*Tz frames per block; block 0 drops 3 -> 9, then 12
    assert [f.shape[1] for f in frames] == [9, 12]
    assert all(np.isfinite(f).all() for f in frames)


def test_warmup_models(models):
    """compile_models analog: warmup pre-populates the cross-session jit
    cache so a fresh session's first block is trace-free."""
    from realtime_video_tpu.serving.models import warmup_models
    from realtime_video_tpu.serving.session import fused_block_step

    models, config = models
    fused_block_step.cache_clear()
    warmup_models(models, config, shapes=((64, 64),))
    assert fused_block_step.cache_info().currsize >= 2  # nctx=0 and steady
    hits_before = fused_block_step.cache_info().hits
    # a session-shaped lookup with the same static config hits the cache
    from realtime_video_tpu.scheduler import FlowMatchSchedule, get_denoising_schedule
    import numpy as np

    gen = models.transformer
    shift = float(config.get("timestep_shift", 5.0))
    sched = FlowMatchSchedule.create(shift=shift, sigma_min=0.0, extra_one_step=True)
    steps = tuple(float(t) for t in get_denoising_schedule(
        np.asarray(sched.zero_padded_timesteps()), 1.0,
        int(config.get("num_denoising_steps", 5) or 5)))
    fsl = gen.cfg.frame_seq_length(8, 8)
    kvf = int(config.get("kv_cache_num_frames", 3))
    nfpb = models.pipeline.num_frame_per_block
    fused_block_step(gen, shift, steps, kvf, (kvf + nfpb) * fsl, fsl, nfpb)
    assert fused_block_step.cache_info().hits == hits_before + 1


def test_session_start_frame_conditioning(models, tmp_path):
    """i2v-style start frame (GenerateParams.start_frame, reference
    release_server.py:578-586): the image is encoded into resume latents
    and the first block is conditioned on them."""
    from PIL import Image

    m, config = models
    img_path = tmp_path / "start.png"
    Image.fromarray(
        (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    ).save(img_path)

    frames = []
    s = GenerationSession(
        _params(start_frame=str(img_path), num_blocks=2), config,
        frame_callback=lambda px, ids, e: frames.append(np.asarray(px)),
        models=m,
    )
    assert s.resume_latents is not None
    assert s.resume_latents.shape[0] == 1 and s.resume_latents.shape[2] == 16
    s.generate_block(m)
    # the 3 resume latents consumed half of the 2-block frame budget: the
    # next block ends gracefully instead of slicing an empty noise block
    import asyncio

    with pytest.raises(asyncio.CancelledError):
        s.generate_block(m)
    total = sum(f.shape[1] for f in frames)
    assert total == 6  # 1+4+4 decoded, first 3 dropped
    assert all(np.isfinite(f).all() for f in frames)


def test_k1_anti_drift_context_single_frame(models):
    """kv_cache_num_frames=1 with keep_first_frame=False: the re-encode
    branch must return exactly ONE context frame. The reference's
    `[:, -k+1:]` slice is `[:, 0:]` at k=1 (release_server.py:573) — an
    upstream off-by-zero that here would overflow the (1+3)-frame cache."""
    m, config = models
    s = GenerationSession(
        _params(num_blocks=3, kv_cache_num_frames=1, keep_first_frame=False),
        config, frame_callback=lambda *a: None, models=m,
    )
    for _ in range(3):
        s.generate_block(m)
    assert s.block_idx == 3
    ctx = s.get_clean_context_frames(m)
    assert ctx.shape[1] == 1, ctx.shape


def test_prompt_interpolation_single_step(models):
    """interp_steps=1 must jump to the NEW prompt (torch.linspace(0,1,1)
    is [0.], which would silently re-apply the old one forever)."""
    m, config = models
    s = GenerationSession(_params(), config, frame_callback=lambda *a: None, models=m)
    s.generate_block(m)
    new_embed = m.text_encoder(text_prompts=["a red fox"])["prompt_embeds"]
    s.interpolate_prompt_embeds(m, "a red fox", 1)
    s.generate_block(m)
    np.testing.assert_array_equal(
        np.asarray(s.current_prompt_embeds, np.float32),
        np.asarray(new_embed.astype(jnp.bfloat16), np.float32),
    )


def test_resume_full_budget_ends_gracefully(models):
    """Resume latents that fill the whole frame budget: block 0 must end
    the session (return None) instead of denoising a zero-length block."""
    import io

    m, config = models
    arr = np.zeros((6, 16, 8, 8), np.float32)  # Tz == num_blocks * 3
    buf = io.BytesIO()
    np.save(buf, arr)
    s = GenerationSession(
        _params(num_blocks=2, resume_latents=buf.getvalue()), config,
        frame_callback=lambda *a: None, models=m,
    )
    assert s.generate_block_internal(m) is None
    assert s.current_start_frame == 6  # resume applied, nothing generated


def test_session_megafuse_matches_streamed_path(models, monkeypatch):
    """RTV_SESSION_MEGAFUSE (one dispatch per warm block: denoise + whole
    block decode) must emit the same frames as the per-latent streamed
    path — same math, different dispatch granularity."""
    m, config = models

    def run(mega: bool):
        frames = []

        def cb(pixels, frame_ids, event):
            frames.append(np.asarray(pixels, np.float32))

        monkeypatch.setenv("RTV_SESSION_MEGAFUSE", "1" if mega else "0")
        s = GenerationSession(_params(), config, frame_callback=cb, models=m)
        for _ in range(3):
            s.generate_block(m)
        return np.concatenate(frames, axis=1), s

    ref, s_ref = run(False)
    got, s_got = run(True)
    assert got.shape == ref.shape == (1, 30, 3, 64, 64)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    # block 0 streams per latent (3 callbacks: 2+4 after the first-block
    # drop); warm blocks arrive as one 12-frame callback each
    np.testing.assert_array_equal(
        np.asarray(s_got.all_latents, np.float32),
        np.asarray(s_ref.all_latents, np.float32),
    )


def test_session_megafuse_composes_with_split_device_vae(models, monkeypatch):
    """Megafuse x split-device VAE (VERDICT r4 #5): with vae_decoder pinned
    to a second chip, the warm-block hot loop must run as TWO pipelined
    programs (fused denoise on dev0, whole-block decode on dev1) and emit
    the same frames as the single-device megafused path."""
    m, config = models

    def run(split: bool):
        frames = []

        def cb(pixels, frame_ids, event):
            if split:
                assert pixels.devices() == {jax.devices()[1]}, pixels.devices()
            frames.append(np.asarray(pixels, np.float32))

        monkeypatch.setenv("RTV_SESSION_MEGAFUSE", "1")
        if split:
            vae_split = VAEWrapper(
                cfg=VAE_TINY,
                params=vae_mod.init_vae_params(
                    jax.random.PRNGKey(7), VAE_TINY, jnp.bfloat16
                ),
                device=jax.devices()[1],
            )
            mm = Models(m.text_encoder, m.transformer, m.pipeline,
                        vae_split, vae_split)
        else:
            mm = m
        s = GenerationSession(_params(), config, frame_callback=cb, models=mm)
        for _ in range(3):
            s.generate_block(mm)
        return np.concatenate(frames, axis=1), s

    ref, s_ref = run(False)
    got, s_got = run(True)
    assert got.shape == ref.shape == (1, 30, 3, 64, 64)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(s_got.all_latents, np.float32),
        np.asarray(s_ref.all_latents, np.float32), rtol=1e-2, atol=1e-2,
    )


def test_session_megafuse_taehv_matches_eager_path(models, monkeypatch):
    """The preview tier's fused warm-block path (denoise + whole-block TAEHV
    decode in one dispatch) must emit the same frames as the eager taehv
    decode — same math, one dispatch instead of dozens."""
    m, config = models

    def run(mega: bool):
        frames = []

        def cb(pixels, frame_ids, event):
            frames.append(np.asarray(pixels, np.float32))

        monkeypatch.setenv("RTV_SESSION_MEGAFUSE", "1" if mega else "0")
        cfg = type(config)(config)  # ServerConfig is a dict subclass
        cfg["use_taehv"] = True
        s = GenerationSession(_params(), cfg, frame_callback=cb, models=m)
        for _ in range(2):
            s.generate_block(m)
        return np.concatenate(frames, axis=1)

    ref = run(False)
    got = run(True)
    assert got.shape == ref.shape == (1, 21, 3, 64, 64)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
