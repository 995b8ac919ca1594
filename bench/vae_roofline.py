"""Analytic roofline for the VAE decoder at serving shapes (480x832, one
12-frame block = 3 latents streamed).

Counts every conv's MACs and min HBM traffic by instrumenting the real
decode path (monkeypatched conv2d/conv3d) on tiny-but-real shapes is too
slow at full res on CPU — instead we trace with jax.eval_shape so no FLOPs
are computed, only shapes observed.

Prints per-layer and total: FLOPs, bytes, time at 190 TFLOP/s bf16 (v5e
measured peak) / 380 TOP/s int8 / 700 GB/s HBM, and the max(compute, memory)
speed-of-light total. Compare against the measured per-block decode to see
remaining headroom.
"""
from __future__ import annotations

import os

import jax

# the axon plugin presets JAX_PLATFORMS; only the config update sticks
if os.getenv("ROOFLINE_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from realtime_video_tpu.config import VAE_CONFIGS
from realtime_video_tpu.models import vae as vae_mod

PEAK_BF16 = 190e12
PEAK_INT8 = 380e12
HBM_BPS = 700e9

records = []

_conv2d = vae_mod.conv2d
_conv3d = vae_mod.conv3d


def _record(w_shape, x, y, int8):
    kh, kw, ci, co = w_shape[-4], w_shape[-3], w_shape[-2], w_shape[-1]
    kt = w_shape[0] if len(w_shape) == 5 else 1
    t, ho, wo, _ = y.shape
    macs = t * ho * wo * kh * kw * kt * ci * co
    w_elems = kh * kw * kt * ci * co
    bytes_ = (x.size + y.size) * 2 + w_elems * (1 if int8 else 2)
    records.append(
        (f"conv {kt}x{kh}x{kw} {ci:4d}->{co:4d} @{ho}x{wo}x{t}", macs, bytes_)
    )


def spy_conv2d(p, x, stride=(1, 1), padding="VALID"):
    w = p.get("w", p.get("w_q"))
    y = _conv2d(p, x, stride, padding)
    _record(w.shape[-4:], x, y, "w_q" in p)
    return y


def spy_conv3d(p, x, stride=(1, 1, 1), padding="VALID"):
    w = p.get("w", p.get("w_q"))
    y = _conv3d(p, x, stride, padding)
    _record(w.shape, x, y, "w_q" in p)
    return y


def main() -> None:
    cfg = VAE_CONFIGS["wan2.1"]
    lat_h, lat_w = 60, 104

    vae_mod.conv2d = spy_conv2d
    vae_mod.conv3d = spy_conv3d
    params = jax.eval_shape(
        lambda k: vae_mod.init_vae_params(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    if os.getenv("FUSEUP", "0") == "1":
        params = vae_mod.fuse_decoder_upsample(params)

    z1 = jnp.zeros((1, 1, lat_h, lat_w, cfg.z_dim), jnp.bfloat16)

    # first latent then one streaming latent; a block is first + 2 streaming
    # (or 3 streaming at steady state — same cost shape)
    def first(z):
        return vae_mod.decode_chunks(cfg, params, z, None, first=True)

    records.clear()
    _, cache = jax.eval_shape(first, z1)
    first_recs = list(records)

    records.clear()
    jax.eval_shape(lambda z, c: vae_mod.decode_chunks(cfg, params, z, c, first=False), z1, cache)
    stream_recs = list(records)

    def summarize(tag, recs, mult):
        tot_f = tot_b = 0
        agg = {}
        for name, macs, by in recs:
            f = 2 * macs * mult
            b = by * mult
            tot_f += f
            tot_b += b
            a = agg.setdefault(name, [0, 0, 0])
            a[0] += f
            a[1] += b
            a[2] += 1
        print(f"\n== {tag} (x{mult}) ==")
        for name, (f, b, n) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
            t_c = f / PEAK_BF16 * 1e3
            t_m = b / HBM_BPS * 1e3
            print(f"  {name:34s} x{n:2d}  {f/1e12:6.2f} TF  {b/1e9:6.2f} GB  "
                  f"sol {max(t_c, t_m):5.2f} ms ({'mxu' if t_c > t_m else 'hbm'})")
        sol = sum(max(f / PEAK_BF16, b / HBM_BPS) for _, (f, b, _) in agg.items()
                  for f, b in [(f, b)]) * 1e3
        print(f"  TOTAL {tot_f/1e12:.2f} TFLOP {tot_b/1e9:.2f} GB | "
              f"bf16 sol(sum of per-layer max) ≈ {sol:6.1f} ms | "
              f"pure-mxu {tot_f/PEAK_BF16*1e3:6.1f} ms | pure-hbm {tot_b/HBM_BPS*1e3:6.1f} ms")
        return tot_f, tot_b

    # single-frame anti-drift re-encode (serving pays this every block)
    records.clear()
    px1 = jnp.zeros((1, 1, 480, 832, 3), jnp.bfloat16)
    jax.eval_shape(lambda v: vae_mod.encode_chunks(cfg, params, v, None, stream=False), px1)
    enc_recs = list(records)

    f1, b1 = summarize("first latent (3 px frames)", first_recs, 1)
    fs, bs = summarize("streaming latent (4 px frames)", stream_recs, 1)
    summarize("single-frame re-encode (anti-drift)", enc_recs, 1)
    bf = f1 + 2 * fs
    bb = b1 + 2 * bs
    print(f"\nper 12-frame block (first + 2 streaming): {bf/1e12:.2f} TFLOP, {bb/1e9:.2f} GB")
    print(f"  speed-of-light: bf16 {max(bf/PEAK_BF16, bb/HBM_BPS)*1e3:.0f} ms, "
          f"int8 {max(bf/PEAK_INT8, bb/HBM_BPS)*1e3:.0f} ms")
    print(f"  steady state (3 streaming): {3*fs/1e12:.2f} TFLOP, {3*bs/1e9:.2f} GB -> "
          f"bf16 {max(3*fs/PEAK_BF16, 3*bs/HBM_BPS)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
