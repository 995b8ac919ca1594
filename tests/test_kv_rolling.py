"""Rolling KV-cache eviction vs a numpy simulation of the reference logic
(causal_model.py:358-392): shift-left beyond sink tokens when appending would
overflow, windowed attention over [local_end - max_attn, local_end)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_video_tpu.ops import kv_cache as kvc


def reference_sim(writes, cache_size, sink_tokens):
    """Simulate (global_end, local_end, buffer contents) for a sequence of
    (current_start, tokens[array]) writes, mirroring the torch index logic."""
    buf = np.zeros((cache_size,), np.int64)  # store token ids
    global_end = 0
    local_end = 0
    for current_start, tokens in writes:
        num_new = len(tokens)
        current_end = current_start + num_new
        if current_end > global_end and num_new + local_end > cache_size:
            num_evicted = num_new + local_end - cache_size
            num_rolled = local_end - num_evicted - sink_tokens
            buf[sink_tokens : sink_tokens + num_rolled] = buf[
                sink_tokens + num_evicted : sink_tokens + num_evicted + num_rolled
            ].copy()
            new_local_end = local_end + current_end - global_end - num_evicted
        else:
            new_local_end = local_end + current_end - global_end
        buf[new_local_end - num_new : new_local_end] = tokens
        global_end = current_end
        local_end = new_local_end
    return buf, global_end, local_end


def jax_sim(writes, cache_size, sink_tokens):
    kv = {
        "k": jnp.zeros((1, 1, cache_size, 1, 1), jnp.float32),
        "v": jnp.zeros((1, 1, cache_size, 1, 1), jnp.float32),
        "global_end": jnp.zeros((), jnp.int32),
        "local_end": jnp.zeros((), jnp.int32),
    }
    for current_start, tokens in writes:
        num_new = len(tokens)
        shift, write_start, g_end, l_end = kvc.plan_kv_update(
            kv, jnp.asarray(current_start, jnp.int32), num_new,
            cache_size, sink_tokens, rolling=True,
        )
        buf = kvc.shift_layer_cache(kv["k"][0], shift, sink_tokens)
        vals = jnp.asarray(tokens, jnp.float32).reshape(1, num_new, 1, 1)
        buf = jax.lax.dynamic_update_slice(buf, vals, (0, write_start, 0, 0))
        kv = {
            "k": buf[None], "v": kv["v"],
            "global_end": g_end, "local_end": l_end,
        }
    return (
        np.asarray(kv["k"][0, 0, :, 0, 0], np.int64),
        int(kv["global_end"]),
        int(kv["local_end"]),
    )


@pytest.mark.parametrize("sink", [0, 2])
def test_rolling_eviction_matches_reference_sim(sink):
    cache_size = 12
    block = 3
    # blocks written sequentially; each block re-denoised twice at the same
    # start (must not evict twice) then advanced
    writes = []
    tok = 1
    for blk in range(6):
        start = blk * block
        ids = list(range(tok, tok + block))
        tok += block
        writes.append((start, ids))
        writes.append((start, ids))  # re-denoise, same position
    ref_buf, ref_g, ref_l = reference_sim(writes, cache_size, sink)
    got_buf, got_g, got_l = jax_sim(writes, cache_size, sink)
    assert (got_g, got_l) == (ref_g, ref_l)
    # only positions < local_end are semantically live
    np.testing.assert_array_equal(got_buf[:got_l], ref_buf[:ref_l])


@pytest.mark.parametrize("sink", [0, 1, 3])
def test_rolling_redenoise_at_overflow_boundary(sink):
    """Adversarial: repeated re-denoise of the SAME block exactly when the
    cache is full (every later write evicts), with sink tokens pinned. The
    re-denoise writes (same current_start) must re-write in place without a
    second eviction; the next advancing write must evict again."""
    cache_size = 9
    block = 3
    writes = []
    tok = 1
    for blk in range(8):
        start = blk * block
        ids = list(range(tok, tok + block))
        tok += block
        writes.append((start, ids))
        writes.append((start, ids))  # re-denoise 1
        writes.append((start, ids))  # re-denoise 2
    ref_buf, ref_g, ref_l = reference_sim(writes, cache_size, sink)
    got_buf, got_g, got_l = jax_sim(writes, cache_size, sink)
    assert (got_g, got_l) == (ref_g, ref_l)
    np.testing.assert_array_equal(got_buf[:got_l], ref_buf[:ref_l])


def test_rolling_partial_overlap_write_matches_reference():
    """Adversarial: a write that partially overlaps cached positions
    (current_start < global_end < current_end). The reference evicts
    num_new + local_end - cache_size (full write length), not the net
    appended amount — plan_kv_update must match."""
    cache_size = 8
    writes = [
        (0, [1, 2, 3, 4]),
        (4, [5, 6, 7, 8]),       # cache now full, local_end = 8
        (6, [9, 10, 11, 12]),    # overlaps positions 6-7, appends 2, evicts 4
    ]
    ref_buf, ref_g, ref_l = reference_sim(writes, cache_size, sink_tokens=0)
    got_buf, got_g, got_l = jax_sim(writes, cache_size, sink_tokens=0)
    assert (got_g, got_l) == (ref_g, ref_l)
    np.testing.assert_array_equal(got_buf[:got_l], ref_buf[:ref_l])


def test_nonrolling_never_shifts():
    cache_size = 12
    writes = [(0, [1, 2, 3]), (3, [4, 5, 6]), (3, [7, 8, 9])]
    kv = {
        "k": jnp.zeros((1, 1, cache_size, 1, 1), jnp.float32),
        "v": jnp.zeros((1, 1, cache_size, 1, 1), jnp.float32),
        "global_end": jnp.zeros((), jnp.int32),
        "local_end": jnp.zeros((), jnp.int32),
    }
    for start, toks in writes:
        shift, ws, g, l = kvc.plan_kv_update(
            kv, jnp.asarray(start, jnp.int32), len(toks), cache_size, 0, rolling=False
        )
        assert int(shift) == 0
        kv["global_end"], kv["local_end"] = g, l
    assert int(kv["local_end"]) == 6
