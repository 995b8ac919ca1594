"""Numerical parity against the torch reference implementation itself.

Round-1 gap (VERDICT item 2): every numeric choice rested on reading the
reference code, not measured agreement. These tests run the actual reference
modules from /root/reference on CPU torch (with the test-only shims in
ref_compat.py) and assert our JAX rebuild matches:

  * FlowMatchScheduler tables + add_noise + step     (utils/scheduler.py:105-194)
  * CausalWanModel._forward_inference decode path     (causal_model.py:825-954)
    incl. RoPE start-frame offsets, KV-cache writes, and rolling eviction
    (causal_model.py:358-392), weight-for-weight via convert_wan_dit.

Spatial dims stay at the real 60x104 latent (fsl = 1560 — the reference
hardcodes frame_seqlen=1560 in its decode path, causal_model.py:351); channel
dims are tiny so CPU forwards are fast.
"""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_compat  # noqa: E402

torch = pytest.importorskip("torch")

from realtime_video_tpu.config import VAEConfig, WanModelConfig  # noqa: E402
from realtime_video_tpu.models import wan_dit  # noqa: E402
from realtime_video_tpu.models.rope import RopeTables  # noqa: E402
from realtime_video_tpu.ops import kv_cache as kvc  # noqa: E402
from realtime_video_tpu.scheduler import FlowMatchSchedule  # noqa: E402
from realtime_video_tpu.utils.checkpoint import (  # noqa: E402
    convert_vae,
    convert_wan_dit,
)


# ---------------------------------------------------------------------------
# FlowMatchScheduler
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shift,steps,extra", [(5.0, 1000, True), (3.0, 50, False)])
def test_scheduler_tables_match_reference(shift, steps, extra):
    ref_mod = ref_compat.load("utils.scheduler")
    ref = ref_mod.FlowMatchScheduler(
        num_inference_steps=steps, shift=shift, sigma_min=0.0, extra_one_step=extra
    )
    ours = FlowMatchSchedule.create(
        num_inference_steps=steps, shift=shift, sigma_min=0.0, extra_one_step=extra
    )
    np.testing.assert_allclose(
        np.asarray(ours.sigmas), ref.sigmas.numpy(), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ours.timesteps), ref.timesteps.numpy(), rtol=1e-6, atol=1e-6
    )


def test_scheduler_add_noise_and_step_match_reference():
    ref_mod = ref_compat.load("utils.scheduler")
    ref = ref_mod.FlowMatchScheduler(
        num_inference_steps=1000, shift=5.0, sigma_min=0.0, extra_one_step=True
    )
    ours = FlowMatchSchedule.create(shift=5.0, sigma_min=0.0, extra_one_step=True)

    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    noise = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    flow = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    t = np.asarray([1000.0, 937.0, 833.0, 625.0], np.float32)

    ref_noisy = ref.add_noise(torch.from_numpy(x0), torch.from_numpy(noise),
                              torch.from_numpy(t)).numpy()
    got_noisy = np.asarray(ours.add_noise(jnp.asarray(x0), jnp.asarray(noise),
                                          jnp.asarray(t)))
    np.testing.assert_allclose(got_noisy, ref_noisy, rtol=1e-5, atol=1e-5)

    ref_step = ref.step(torch.from_numpy(flow), torch.from_numpy(t),
                        torch.from_numpy(x0)).numpy()
    got_step = np.asarray(ours.step(jnp.asarray(flow), jnp.asarray(t),
                                    jnp.asarray(x0)))
    np.testing.assert_allclose(got_step, ref_step, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# CausalWanModel decode forward
# ---------------------------------------------------------------------------

# tiny channel dims, REAL spatial dims (fsl must be 1560: causal_model.py:351)
DIM, FFN, HEADS, LAYERS = 64, 128, 2, 2
TEXT_DIM, TEXT_LEN, FREQ_DIM = 32, 16, 32
LAT_H, LAT_W, NFPB = 60, 104, 3
FSL = (LAT_H // 2) * (LAT_W // 2)
KV_FRAMES = 6  # local_attn_size -> cache/window = 6 frames


@pytest.fixture(scope="module")
def ref_and_ours():
    import functools

    cm = ref_compat.load("wan.modules.causal_model")
    # the reference attention dispatcher's SDPA fallback casts to bf16 by
    # default (attention.py:165) which clashes with f32 CPU weights at the
    # o-proj; pin it to f32 so both sides compare at f32 math
    if not getattr(cm.attention, "_f32_pinned", False):
        cm.attention = functools.partial(cm.attention, dtype=torch.float32)
        cm.attention._f32_pinned = True
    # the cross-attn SDPA branch hardcodes a bf16 cast (model.py:217-223)
    # which breaks against f32 CPU weights at the o-proj; compute SDPA in f32
    # (inputs keep one bf16 rounding — tolerance below accounts for it)
    import torch.nn.functional as F

    if not getattr(F.scaled_dot_product_attention, "_f32_wrapped", False):
        _orig_sdpa = F.scaled_dot_product_attention

        def _sdpa_f32(q, k, v, *a, **kw):
            return _orig_sdpa(q.float(), k.float(), v.float(), *a, **kw)

        _sdpa_f32._f32_wrapped = True
        F.scaled_dot_product_attention = _sdpa_f32
    torch.manual_seed(0)
    ref = cm.CausalWanModel(
        model_type="t2v", dim=DIM, ffn_dim=FFN, num_heads=HEADS,
        num_layers=LAYERS, text_dim=TEXT_DIM, text_len=TEXT_LEN,
        freq_dim=FREQ_DIM, local_attn_size=KV_FRAMES,
    ).eval().float()

    cfg = WanModelConfig(
        dim=DIM, ffn_dim=FFN, num_heads=HEADS, num_layers=LAYERS,
        text_dim=TEXT_DIM, text_len=TEXT_LEN, freq_dim=FREQ_DIM,
        local_attn_size=KV_FRAMES,
    )
    params = convert_wan_dit(ref.state_dict(), cfg, dtype=jnp.float32)
    rope = RopeTables.create(cfg.head_dim)
    return ref, cfg, params, rope


def _ref_caches(batch=1, cache_size=KV_FRAMES * FSL):
    kv = [{
        "k": torch.zeros(batch, cache_size, HEADS, DIM // HEADS),
        "v": torch.zeros(batch, cache_size, HEADS, DIM // HEADS),
        "global_end_index": 0,
        "local_end_index": 0,
    } for _ in range(LAYERS)]
    cross = [{
        "k": torch.zeros(batch, TEXT_LEN, HEADS, DIM // HEADS),
        "v": torch.zeros(batch, TEXT_LEN, HEADS, DIM // HEADS),
        "is_init": False,
    } for _ in range(LAYERS)]
    return kv, cross


def test_decode_forward_matches_reference(ref_and_ours):
    """Three decode calls — prefill-at-0, offset block, evicting block — must
    match the reference forward bit-for-bit at f32 tolerances."""
    ref, cfg, params, rope = ref_and_ours
    rng = np.random.default_rng(1)
    ctx_np = rng.normal(size=(TEXT_LEN, TEXT_DIM)).astype(np.float32)

    ref_kv, ref_cross = _ref_caches()
    cache_size = KV_FRAMES * FSL
    kv = kvc.init_kv_cache(LAYERS, 1, cache_size, HEADS, cfg.head_dim,
                           dtype=jnp.float32)
    cross = wan_dit.compute_crossattn_cache(
        cfg, params, jnp.asarray(ctx_np)[None]
    )

    t_np = np.full((1, NFPB), 500.0, np.float32)
    for call, start_tokens in enumerate([0, NFPB * FSL, 2 * NFPB * FSL]):
        x_np = rng.normal(size=(1, NFPB, 16, LAT_H, LAT_W)).astype(np.float32) * 0.5
        with torch.no_grad():
            ref_out = ref._forward_inference(
                x=[torch.from_numpy(x_np[0]).permute(1, 0, 2, 3)],  # [C,F,H,W]
                t=torch.from_numpy(t_np),
                context=[torch.from_numpy(ctx_np)],
                seq_len=32760,
                kv_cache=ref_kv,
                crossattn_cache=ref_cross,
                current_start=start_tokens,
            )
        # reference returns [B, C, F, H, W]
        want = ref_out.numpy().transpose(0, 2, 1, 3, 4)

        got, kv = wan_dit.dit_forward(
            cfg, params, jnp.asarray(x_np), jnp.asarray(t_np), rope, cross,
            mode="decode", kv_cache=kv, current_start=start_tokens,
            max_attention_size=cache_size, rolling=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=2e-3, atol=2e-3,
            err_msg=f"forward output diverged at call {call} (start={start_tokens})",
        )
        # cache state parity: contents over the live region + end indices
        assert int(kv["global_end"]) == ref_kv[0]["global_end_index"]
        assert int(kv["local_end"]) == ref_kv[0]["local_end_index"]
        le = int(kv["local_end"])
        for layer in range(LAYERS):
            np.testing.assert_allclose(
                np.asarray(kv["k"][layer, 0, :le]),
                ref_kv[layer]["k"][0, :le].numpy(),
                rtol=5e-2, atol=5e-3,  # near-zero f32 noise via the SDPA
                err_msg=f"KV cache K diverged at call {call}, layer {layer}",
            )


# ---------------------------------------------------------------------------
# Streaming causal VAE
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vae_ref_and_ours():
    vm = ref_compat.load("wan.modules.vae")
    torch.manual_seed(3)
    ref = vm.WanVAE_(
        dim=16, z_dim=8, dim_mult=[1, 2, 4, 4], num_res_blocks=1,
        attn_scales=[], temperal_downsample=[False, True, True], dropout=0.0,
    ).eval().float()
    cfg = VAEConfig(dim=16, z_dim=8, dim_mult=(1, 2, 4, 4), num_res_blocks=1)
    params = convert_vae(ref.state_dict(), cfg, dtype=jnp.float32)
    return ref, cfg, params


def test_vae_streaming_decode_matches_reference(vae_ref_and_ours):
    """Our per-frame streaming decode == the reference cached_decode
    (vae.py:546-567), weight-for-weight, including the 1+4(n-1) temporal law
    and all conv-cache splices."""
    from realtime_video_tpu.models import vae as vae_mod

    ref, cfg, params = vae_ref_and_ours
    rng = np.random.default_rng(4)
    z_np = rng.normal(size=(1, 8, 3, 6, 8)).astype(np.float32)  # [B,z,T,h,w]

    ref.clear_cache()
    with torch.no_grad():
        want = ref.cached_decode(
            torch.from_numpy(z_np), scale=(0.0, 1.0)
        ).numpy()  # [B, 3, T_out, H, W]

    z = jnp.asarray(z_np.transpose(0, 2, 3, 4, 1))  # [B,T,h,w,z]
    out0, cache = vae_mod.decode_chunks(cfg, params, z[:, :1], None, first=True)
    out1, cache = vae_mod.decode_chunks(cfg, params, z[:, 1:2], cache, first=False)
    out2, cache = vae_mod.decode_chunks(cfg, params, z[:, 2:3], cache, first=False)
    got = np.concatenate([np.asarray(o) for o in (out0, out1, out2)], axis=1)
    got = got.transpose(0, 4, 1, 2, 3)  # -> [B, 3, T, H, W]

    assert got.shape == want.shape, (got.shape, want.shape)
    # reference output is unclipped; ours clips to [-1,1] — compare clipped
    np.testing.assert_allclose(
        got, np.clip(want, -1.0, 1.0), rtol=2e-3, atol=2e-3
    )


def test_vae_chunked_encode_matches_reference(vae_ref_and_ours):
    """Our 1+4k chunked encode == the reference encode (vae.py:491-517)."""
    from realtime_video_tpu.models import vae as vae_mod

    ref, cfg, params = vae_ref_and_ours
    rng = np.random.default_rng(5)
    x_np = rng.normal(size=(1, 3, 9, 48, 64)).astype(np.float32) * 0.5

    ref.clear_cache()
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(x_np), scale=(0.0, 1.0)).numpy()

    video = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))  # [B,T,H,W,3]
    got, _ = vae_mod.encode_chunks(cfg, params, video, None, stream=False)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)  # -> [B, z, T, h, w]
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
