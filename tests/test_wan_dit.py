"""Causal DiT consistency tests.

The strongest correctness property (no reference weights needed): a sequential
KV-cached decode over blocks must equal a single full forward under the
blockwise-causal mask — this exercises RoPE absolute offsets, cache writes,
window masks and per-frame AdaLN together.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.config import WanModelConfig
from realtime_video_tpu.models.rope import RopeTables
from realtime_video_tpu.models import wan_dit
from realtime_video_tpu.ops import attention as attn_ops
from realtime_video_tpu.ops import kv_cache as kvc

CFG = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
F, C, H, W = 6, 16, 8, 8
NFPB = 3
FSL = (H // 2) * (W // 2)  # 16


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = wan_dit.init_wan_params(key, CFG, dtype=jnp.float32)
    tables = RopeTables.create(CFG.head_dim)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 16, CFG.text_dim), jnp.float32)
    cross = wan_dit.compute_crossattn_cache(CFG, params, ctx)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, F, C, H, W), jnp.float32)
    return params, tables, cross, x


def test_forward_shapes(setup):
    params, tables, cross, x = setup
    t = jnp.full((1, F), 500.0, jnp.float32)
    mask = attn_ops.blockwise_causal_mask(F, FSL, NFPB)
    flow, _ = wan_dit.dit_forward(
        CFG, params, x, t, tables, cross, mode="train", attn_mask=mask
    )
    assert flow.shape == (1, F, CFG.out_dim, H, W)
    assert np.isfinite(np.asarray(flow)).all()


def test_decode_matches_masked_full_forward(setup):
    params, tables, cross, x = setup
    t = jnp.full((1, F), 500.0, jnp.float32)
    mask = attn_ops.blockwise_causal_mask(F, FSL, NFPB)
    full, _ = wan_dit.dit_forward(
        CFG, params, x, t, tables, cross, mode="train", attn_mask=mask
    )

    kv = kvc.init_kv_cache(CFG.num_layers, 1, F * FSL, CFG.num_heads, CFG.head_dim, jnp.float32)
    outs = []
    for blk in range(F // NFPB):
        xb = x[:, blk * NFPB : (blk + 1) * NFPB]
        tb = jnp.full((1, NFPB), 500.0, jnp.float32)
        flow, kv = wan_dit.dit_forward(
            CFG, params, xb, tb, tables, cross,
            mode="decode", kv_cache=kv,
            current_start=blk * NFPB * FSL,
            max_attention_size=F * FSL,
        )
        outs.append(np.asarray(flow))
    seq = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(seq, np.asarray(full), rtol=2e-3, atol=2e-3)


def test_prefill_then_decode_matches_full(setup):
    params, tables, cross, x = setup
    t = jnp.full((1, F), 500.0, jnp.float32)
    mask = attn_ops.blockwise_causal_mask(F, FSL, NFPB)
    full, _ = wan_dit.dit_forward(
        CFG, params, x, t, tables, cross, mode="train", attn_mask=mask
    )

    kv = kvc.init_kv_cache(CFG.num_layers, 1, F * FSL, CFG.num_heads, CFG.head_dim, jnp.float32)
    # prefill the first block (the server's recompute path)
    pre_mask = attn_ops.blockwise_causal_mask(NFPB, FSL, NFPB)
    pre_flow, kv = wan_dit.dit_forward(
        CFG, params, x[:, :NFPB], jnp.zeros((1, NFPB), jnp.float32),
        tables, cross, mode="prefill", kv_cache=kv, attn_mask=pre_mask,
    )
    assert int(kv["local_end"]) == NFPB * FSL
    assert int(kv["global_end"]) == NFPB * FSL

    # decode the second block on top of the prefilled cache
    flow1, kv = wan_dit.dit_forward(
        CFG, params, x[:, NFPB:], jnp.full((1, NFPB), 500.0, jnp.float32),
        tables, cross, mode="decode", kv_cache=kv,
        current_start=NFPB * FSL, max_attention_size=F * FSL,
    )
    np.testing.assert_allclose(
        np.asarray(flow1), np.asarray(full)[:, NFPB:], rtol=2e-3, atol=2e-3
    )


def test_redenoise_same_block_does_not_advance_cache(setup):
    """Repeated decode at the same current_start (the inner denoise loop)
    overwrites in place — ends stay fixed (causal_model.py:382-385)."""
    params, tables, cross, x = setup
    kv = kvc.init_kv_cache(CFG.num_layers, 1, F * FSL, CFG.num_heads, CFG.head_dim, jnp.float32)
    xb = x[:, :NFPB]
    for step_t in (1000.0, 800.0, 600.0):
        flow, kv = wan_dit.dit_forward(
            CFG, params, xb, jnp.full((1, NFPB), step_t, jnp.float32),
            tables, cross, mode="decode", kv_cache=kv,
            current_start=0, max_attention_size=F * FSL,
        )
        assert int(kv["local_end"]) == NFPB * FSL
        assert int(kv["global_end"]) == NFPB * FSL


def test_local_window_masks_old_frames(setup):
    """With a small max_attention_size, early frames must not influence the
    current block (mirrors local_attn_size semantics, causal_model.py:192)."""
    params, tables, cross, x = setup
    window = NFPB * FSL  # attend only to own block

    kv = kvc.init_kv_cache(CFG.num_layers, 1, F * FSL, CFG.num_heads, CFG.head_dim, jnp.float32)
    _, kv = wan_dit.dit_forward(
        CFG, params, x[:, :NFPB], jnp.full((1, NFPB), 500.0, jnp.float32),
        tables, cross, mode="decode", kv_cache=kv, current_start=0,
        max_attention_size=window,
    )
    out_a, _ = wan_dit.dit_forward(
        CFG, params, x[:, NFPB:], jnp.full((1, NFPB), 500.0, jnp.float32),
        tables, cross, mode="decode", kv_cache=kv, current_start=NFPB * FSL,
        max_attention_size=window,
    )

    # same but with garbage first block: output must be identical
    x2 = x.at[:, :NFPB].set(jax.random.normal(jax.random.PRNGKey(9), x[:, :NFPB].shape))
    kv2 = kvc.init_kv_cache(CFG.num_layers, 1, F * FSL, CFG.num_heads, CFG.head_dim, jnp.float32)
    _, kv2 = wan_dit.dit_forward(
        CFG, params, x2[:, :NFPB], jnp.full((1, NFPB), 500.0, jnp.float32),
        tables, cross, mode="decode", kv_cache=kv2, current_start=0,
        max_attention_size=window,
    )
    out_b, _ = wan_dit.dit_forward(
        CFG, params, x2[:, NFPB:], jnp.full((1, NFPB), 500.0, jnp.float32),
        tables, cross, mode="decode", kv_cache=kv2, current_start=NFPB * FSL,
        max_attention_size=window,
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-4, atol=1e-4)


def test_context_prefill_decode_path_matches_blockcausal():
    """A one-block context write via decode mode == the blockwise-causal
    prefill (the mask is dense for a single block) — the serving fused step
    uses the decode program because it compiles to a ~4x faster executable."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from realtime_video_tpu.config import WanModelConfig
    from realtime_video_tpu.models import wan_dit
    from realtime_video_tpu.models.rope import RopeTables
    from realtime_video_tpu.ops import kv_cache as kvc

    cfg = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
    params = wan_dit.init_wan_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rope = RopeTables.create(cfg.head_dim)
    F, C, H, W = 3, 16, 8, 8
    fsl = cfg.frame_seq_length(H, W)
    ctx_tokens = jax.random.normal(jax.random.PRNGKey(1), (1, F, C, H, W), jnp.float32)
    embeds = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.text_dim), jnp.float32)
    cross = wan_dit.compute_crossattn_cache(cfg, params, embeds)
    mk = lambda: kvc.init_kv_cache(  # noqa: E731
        cfg.num_layers, 1, 2 * F * fsl, cfg.num_heads, cfg.head_dim, jnp.float32
    )

    kv_fast = wan_dit.context_prefill(
        cfg, params, ctx_tokens, rope, cross, mk(),
        block_tokens=F * fsl, max_attention_size=2 * F * fsl,
    )
    t0 = jnp.zeros((1, F), jnp.float32)
    _, kv_ref = wan_dit.dit_forward(
        cfg, params, ctx_tokens, t0, rope, cross,
        mode="prefill", kv_cache=mk(), prefill_block_tokens=F * fsl,
    )
    # K/V cache contents are projections of the inputs — identical regardless
    # of which attention program ran
    np.testing.assert_allclose(np.asarray(kv_fast["k"]), np.asarray(kv_ref["k"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kv_fast["v"]), np.asarray(kv_ref["v"]),
                               rtol=1e-5, atol=1e-5)
    assert int(kv_fast["local_end"]) == int(kv_ref["local_end"]) == F * fsl
    assert int(kv_fast["global_end"]) == int(kv_ref["global_end"]) == F * fsl
