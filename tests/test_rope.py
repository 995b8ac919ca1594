"""RoPE tables/application vs an independent complex-number numpy oracle
(mirrors rope_params/causal_rope_apply equations, causal_model.py:143-171)."""
import numpy as np

from realtime_video_tpu.models.rope import (
    RopeTables,
    rope_apply,
    rope_split,
    sinusoidal_embedding_1d,
)


def complex_oracle(x, f, h, w, head_dim, start_frame=0, theta=10000.0):
    """Direct float64 complex implementation of the reference equations."""
    b, L, n, d = x.shape
    c = d // 2
    ct, ch, cw = rope_split(head_dim)

    def table(maxlen, dim):
        inv = 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)
        ang = np.outer(np.arange(maxlen), inv)
        return np.exp(1j * ang)  # polar(1, ang)

    ft = table(1024, d - 4 * (d // 6))
    fh = table(1024, 2 * (d // 6))
    fw = table(1024, 2 * (d // 6))
    freqs = np.concatenate(
        [
            np.broadcast_to(
                ft[start_frame : start_frame + f][:, None, None, :], (f, h, w, ct)
            ),
            np.broadcast_to(fh[:h][None, :, None, :], (f, h, w, ch)),
            np.broadcast_to(fw[:w][None, None, :, :], (f, h, w, cw)),
        ],
        axis=-1,
    ).reshape(L, 1, c)
    xc = x.astype(np.float64).reshape(b, L, n, c, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    out = xc * freqs[None]
    return np.stack([out.real, out.imag], axis=-1).reshape(b, L, n, d)


def test_rope_matches_complex_oracle():
    head_dim = 32  # -> split (6, 5, 5) pairs
    f, h, w, n, b = 3, 4, 5, 2, 1
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, f * h * w, n, head_dim)).astype(np.float32)
    tables = RopeTables.create(head_dim)
    got = np.asarray(rope_apply(x, (f, h, w), tables, 0))
    want = complex_oracle(x, f, h, w, head_dim)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_rope_start_frame_offset():
    head_dim = 32
    f, h, w, n, b = 2, 3, 3, 1, 1
    rng = np.random.default_rng(1)
    x = rng.standard_normal((b, f * h * w, n, head_dim)).astype(np.float32)
    tables = RopeTables.create(head_dim)
    got = np.asarray(rope_apply(x, (f, h, w), tables, 7))
    want = complex_oracle(x, f, h, w, head_dim, start_frame=7)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_rope_split_14b_dims():
    # 14B: head_dim 128 -> pairs (22, 21, 21); 1.3B: 128 as well
    assert rope_split(128) == (22, 21, 21)
    assert sum(rope_split(128)) == 64


def test_sinusoidal_embedding():
    t = np.array([0.0, 500.0, 1000.0], np.float32)
    e = np.asarray(sinusoidal_embedding_1d(256, t))
    assert e.shape == (3, 256)
    half = 128
    inv = np.power(10000.0, -np.arange(half) / half)
    want = np.concatenate(
        [np.cos(np.outer(t, inv)), np.sin(np.outer(t, inv))], axis=1
    )
    # fp32 trig of large angles vs the fp64 oracle: abs error ~1e-3,
    # far below bf16 resolution (the model consumes these in bf16)
    np.testing.assert_allclose(e, want, atol=5e-3)
