"""Ulysses sequence-parallel attention == single-device attention
(reference: wan/distributed/xdit_context_parallel.py usp_attn_forward)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from realtime_video_tpu.ops.attention import xla_attention
from realtime_video_tpu.parallel.sequence import (
    make_sp_attention,
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


def test_ulysses_output_stays_sequence_sharded(sp_mesh):
    B, L, N, D = 1, 32, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, N, D), jnp.float32)
    xs = shard_sequence(x, sp_mesh, "sp")
    out = jax.jit(make_sp_attention(sp_mesh, "sp"))(xs, xs, xs)
    # each device holds L/8 of the sequence
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(B, L // 8, N, D)}
