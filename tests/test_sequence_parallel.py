"""Ulysses sequence-parallel attention == single-device attention
(reference: wan/distributed/xdit_context_parallel.py usp_attn_forward)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from realtime_video_tpu.ops.attention import xla_attention
from realtime_video_tpu.parallel.sequence import (
    make_ring_attention,
    make_sp_attention,
    make_usp_attention,
    shard_sequence,
)


@pytest.fixture
def sp_mesh():
    devs = np.array(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("sp",))


def test_ulysses_matches_dense(sp_mesh):
    B, L, N, D = 2, 64, 8, 32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, L, N, D), jnp.float32)
    k = jax.random.normal(k2, (B, L, N, D), jnp.float32)
    v = jax.random.normal(k3, (B, L, N, D), jnp.float32)

    ref = xla_attention(q, k, v)

    sp_attn = jax.jit(make_sp_attention(sp_mesh, "sp"))
    qs = shard_sequence(q, sp_mesh, "sp")
    ks = shard_sequence(k, sp_mesh, "sp")
    vs = shard_sequence(v, sp_mesh, "sp")
    out = sp_attn(qs, ks, vs)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_matches_dense(sp_mesh):
    # pure ring: head count (3) NOT divisible by the 8-device axis
    B, L, N, D = 1, 128, 3, 16
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(k1, (B, L, N, D), jnp.float32)
    k = jax.random.normal(k2, (B, L, N, D), jnp.float32)
    v = jax.random.normal(k3, (B, L, N, D), jnp.float32)
    ref = xla_attention(q, k, v)
    ring = jax.jit(make_ring_attention(sp_mesh, "sp"))
    out = ring(shard_sequence(q, sp_mesh, "sp"),
               shard_sequence(k, sp_mesh, "sp"),
               shard_sequence(v, sp_mesh, "sp"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.fixture
def usp_mesh():
    # ring=2 x ulysses=4: the xFuser hybrid factorisation over 8 devices
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("sp_r", "sp_u"))


def test_usp_hybrid_matches_dense_at_teacher_shape(usp_mesh):
    # THE teacher shape: 32760 tokens (21 frames x 1560,
    # wan_wrapper.py:153) with 12 heads (1.3B) — 12 is NOT divisible by the
    # full sp=8 axis, so plain Ulysses cannot run; the hybrid shards heads
    # only by the ulysses degree (4) and rings over the remaining factor.
    B, L, N, D = 1, 32760, 2, 8  # head count 2: divisible by nothing > 2
    usp_mesh_small = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                          ("sp_r", "sp_u"))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(k1, (B, L, N, D), jnp.float32)
    k = jax.random.normal(k2, (B, L, N, D), jnp.float32)
    v = jax.random.normal(k3, (B, L, N, D), jnp.float32)

    # exact reference in q-chunks (full [L, L] scores would be 4.3 GB)
    scale = D ** -0.5
    refs = []
    for i in range(0, L, 4096):
        s = jnp.einsum("blnd,bknd->bnlk", q[:, i : i + 4096] * scale, k)
        p = jax.nn.softmax(s, axis=-1)
        refs.append(jnp.einsum("bnlk,bknd->blnd", p, v))
    ref = jnp.concatenate(refs, axis=1)

    usp = jax.jit(make_usp_attention(usp_mesh_small, "sp_u", "sp_r"))
    out = usp(shard_sequence(q, usp_mesh_small, ("sp_r", "sp_u")),
              shard_sequence(k, usp_mesh_small, ("sp_r", "sp_u")),
              shard_sequence(v, usp_mesh_small, ("sp_r", "sp_u")))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(B, L // 8, N, D)}


def test_usp_hybrid_small(usp_mesh):
    B, L, N, D = 2, 64, 4, 16
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(k1, (B, L, N, D), jnp.float32)
    k = jax.random.normal(k2, (B, L, N, D), jnp.float32)
    v = jax.random.normal(k3, (B, L, N, D), jnp.float32)
    ref = xla_attention(q, k, v)
    usp = jax.jit(make_usp_attention(usp_mesh, "sp_u", "sp_r"))
    out = usp(shard_sequence(q, usp_mesh, ("sp_r", "sp_u")),
              shard_sequence(k, usp_mesh, ("sp_r", "sp_u")),
              shard_sequence(v, usp_mesh, ("sp_r", "sp_u")))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_output_stays_sequence_sharded(sp_mesh):
    B, L, N, D = 1, 32, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, N, D), jnp.float32)
    xs = shard_sequence(x, sp_mesh, "sp")
    out = jax.jit(make_sp_attention(sp_mesh, "sp"))(xs, xs, xs)
    # each device holds L/8 of the sequence
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(B, L // 8, N, D)}
