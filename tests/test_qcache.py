"""Quantized-param disk cache (utils/qcache.py): the TPU analog of the
reference shipping prebuilt TRT engines / quantized weights
(demo_utils/vae.py:317-390). Cold server starts must load the finished int8
trees from disk instead of re-running init + calibrate + quantize."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.utils import qcache


def test_cache_key_stable_and_distinct():
    a = qcache.cache_key("x", 1.0, ("a", "b"))
    assert a == qcache.cache_key("x", 1.0, ("a", "b"))
    assert a != qcache.cache_key("x", 1.0, ("a", "c"))
    assert len(a) == 16


def test_cached_tree_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("RTV_QUANT_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("RTV_QUANT_CACHE", "1")
    calls = []

    def build():
        calls.append(1)
        return {"cfg": ("not", "an", "array"),
                "params": {"w": jnp.arange(4, dtype=jnp.float32)}}

    t1 = qcache.cached_tree("test", "k1", build)
    t2 = qcache.cached_tree("test", "k1", build)
    assert len(calls) == 1  # second call hit the disk cache
    assert t2["cfg"] == ("not", "an", "array")  # non-array leaves survive
    np.testing.assert_array_equal(np.asarray(t1["params"]["w"]),
                                  np.asarray(t2["params"]["w"]))
    # a different key misses
    qcache.cached_tree("test", "k2", build)
    assert len(calls) == 2


def test_cached_tree_disabled(tmp_path, monkeypatch):
    monkeypatch.setenv("RTV_QUANT_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("RTV_QUANT_CACHE", "0")
    calls = []

    def build():
        calls.append(1)
        return {"w": jnp.zeros(2)}

    qcache.cached_tree("test", "k1", build)
    qcache.cached_tree("test", "k1", build)
    assert len(calls) == 2
    assert not any(f.startswith(".rtv_test_") for f in os.listdir(tmp_path))


def test_cached_tree_corrupt_entry_rebuilds(tmp_path, monkeypatch):
    """A truncated pickle (writer killed mid-dump) is a miss, not a crash."""
    monkeypatch.setenv("RTV_QUANT_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("RTV_QUANT_CACHE", "1")
    calls = []

    def build():
        calls.append(1)
        return {"w": jnp.ones(3)}

    qcache.cached_tree("test", "kc", build)
    (path,) = [tmp_path / f for f in os.listdir(tmp_path)
               if f.startswith(".rtv_test_")]
    path.write_bytes(path.read_bytes()[:7])  # truncate
    t = qcache.cached_tree("test", "kc", build)
    assert len(calls) == 2
    np.testing.assert_array_equal(np.asarray(t["w"]), np.ones(3))
    # the rebuild re-stored a loadable entry
    t2 = qcache.cached_tree("test", "kc", build)
    assert len(calls) == 2
    np.testing.assert_array_equal(np.asarray(t2["w"]), np.ones(3))
    assert not any(".tmp." in f for f in os.listdir(tmp_path))


def test_serving_int8_load_uses_cache(tmp_path, monkeypatch):
    """load_transformer's int8 tier: second load comes from the disk cache
    and produces the same quantized params + a working forward config."""
    monkeypatch.setenv("RTV_QUANT_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("RTV_QUANT_CACHE", "1")
    from realtime_video_tpu.config import load_server_config
    from realtime_video_tpu.serving import models as serving_models

    config = load_server_config(
        model_name="t2v-tiny", enable_int8_dit=True,
        int8_static_scales=True, num_denoising_steps=2,
    )
    tr1 = serving_models.load_transformer(config)
    files = [f for f in os.listdir(tmp_path) if f.startswith(".rtv_dit_q")]
    assert len(files) == 1
    tr2 = serving_models.load_transformer(config)
    assert tr2.cfg == tr1.cfg
    l1 = jax.tree_util.tree_leaves(tr1.params)
    l2 = jax.tree_util.tree_leaves(tr2.params)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_serving_int8_vae_load_uses_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("RTV_QUANT_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("RTV_QUANT_CACHE", "1")
    from realtime_video_tpu.config import VAE_CONFIGS, load_server_config
    from realtime_video_tpu.models.vae_wrapper import VAEWrapper
    from realtime_video_tpu.serving import models as serving_models

    class TinyVAEWrapper(VAEWrapper):
        # from_model_folder loads the full wan2.1 VAE (~1 min host-side
        # calibrate); pin the test to the tiny config
        @classmethod
        def from_model_folder(cls, dtype=jnp.float32, device=None, mesh=None):
            return cls(cfg=VAE_CONFIGS["vae-tiny"], dtype=dtype,
                       device=device, mesh=mesh)

    monkeypatch.setattr(serving_models, "VAEWrapper", TinyVAEWrapper)
    config = load_server_config(enable_int8=True, int8_static_scales=True)
    v1 = serving_models.load_vae(config)
    files = [f for f in os.listdir(tmp_path) if f.startswith(".rtv_vae_q")]
    assert len(files) == 1
    v2 = serving_models.load_vae(config)
    l1 = jax.tree_util.tree_leaves(v1.params)
    l2 = jax.tree_util.tree_leaves(v2.params)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        # both loads (build path and cache-HIT path) must leave params
        # DEVICE-resident — numpy leaves re-upload per decode dispatch
        assert isinstance(a, jax.Array) and isinstance(b, jax.Array)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
