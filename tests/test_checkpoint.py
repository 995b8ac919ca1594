"""Checkpoint converter round-trip: build a torch state dict with the
reference's exact parameter names from our random pytree, convert it back,
and require bit-identical params (validates every name mapping + transpose)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from realtime_video_tpu.config import WanModelConfig, T5_CONFIGS
from realtime_video_tpu.models import t5 as t5_mod
from realtime_video_tpu.models import wan_dit
from realtime_video_tpu.utils import checkpoint as ckpt

CFG = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _wan_state_dict(params, cfg, fused_qkv=False):
    """Emit reference-named tensors (causal_model.py module tree)."""
    sd = {}
    pe_w = np.asarray(params["patch_embedding"]["w"], np.float32)  # [C*4, D]
    pt, ph, pw = cfg.patch_size
    sd["patch_embedding.weight"] = _t(
        pe_w.T.reshape(cfg.dim, cfg.in_dim, pt, ph, pw)
    )
    sd["patch_embedding.bias"] = _t(params["patch_embedding"]["b"])
    for tgt, src in (("text_embedding.0", "fc1"), ("text_embedding.2", "fc2")):
        sd[f"{tgt}.weight"] = _t(np.asarray(params["text_embedding"][src]["w"]).T)
        sd[f"{tgt}.bias"] = _t(params["text_embedding"][src]["b"])
    for tgt, src in (("time_embedding.0", "fc1"), ("time_embedding.2", "fc2")):
        sd[f"{tgt}.weight"] = _t(np.asarray(params["time_embedding"][src]["w"]).T)
        sd[f"{tgt}.bias"] = _t(params["time_embedding"][src]["b"])
    sd["time_projection.1.weight"] = _t(np.asarray(params["time_projection"]["fc"]["w"]).T)
    sd["time_projection.1.bias"] = _t(params["time_projection"]["fc"]["b"])
    bp = params["blocks"]
    for i in range(cfg.num_layers):
        for attn in ("self_attn", "cross_attn"):
            a = bp[attn]
            if fused_qkv and attn == "self_attn":
                w = np.concatenate(
                    [np.asarray(a[n]["w"][i]).T for n in ("q", "k", "v")], axis=0
                )
                b = np.concatenate([np.asarray(a[n]["b"][i]) for n in ("q", "k", "v")])
                sd[f"blocks.{i}.{attn}.to_qkv.weight"] = _t(w)
                sd[f"blocks.{i}.{attn}.to_qkv.bias"] = _t(b)
            else:
                for n in ("q", "k", "v"):
                    sd[f"blocks.{i}.{attn}.{n}.weight"] = _t(np.asarray(a[n]["w"][i]).T)
                    sd[f"blocks.{i}.{attn}.{n}.bias"] = _t(a[n]["b"][i])
            sd[f"blocks.{i}.{attn}.o.weight"] = _t(np.asarray(a["o"]["w"][i]).T)
            sd[f"blocks.{i}.{attn}.o.bias"] = _t(a["o"]["b"][i])
            sd[f"blocks.{i}.{attn}.norm_q.weight"] = _t(a["norm_q"]["scale"][i])
            sd[f"blocks.{i}.{attn}.norm_k.weight"] = _t(a["norm_k"]["scale"][i])
        sd[f"blocks.{i}.ffn.0.weight"] = _t(np.asarray(bp["ffn"]["fc1"]["w"][i]).T)
        sd[f"blocks.{i}.ffn.0.bias"] = _t(bp["ffn"]["fc1"]["b"][i])
        sd[f"blocks.{i}.ffn.2.weight"] = _t(np.asarray(bp["ffn"]["fc2"]["w"][i]).T)
        sd[f"blocks.{i}.ffn.2.bias"] = _t(bp["ffn"]["fc2"]["b"][i])
        sd[f"blocks.{i}.modulation"] = _t(bp["modulation"][i])
        sd[f"blocks.{i}.norm3.weight"] = _t(bp["norm3"]["scale"][i])
        sd[f"blocks.{i}.norm3.bias"] = _t(bp["norm3"]["bias"][i])
    sd["head.head.weight"] = _t(np.asarray(params["head"]["head"]["w"]).T)
    sd["head.head.bias"] = _t(params["head"]["head"]["b"])
    sd["head.modulation"] = _t(params["head"]["modulation"])
    return sd


@pytest.mark.parametrize("fused", [False, True])
def test_wan_dit_converter_roundtrip(fused):
    params = wan_dit.init_wan_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    sd = _wan_state_dict(params, CFG, fused_qkv=fused)
    # wrapper prefix fixup path (release_server.py:160-169)
    sd = {f"model.{k}": v for k, v in sd.items()}
    sd = ckpt.strip_prefix(sd, "model.")
    got = ckpt.convert_wan_dit(sd, CFG, jnp.float32)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(got)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6)


def test_detect_config_by_kweight():
    sd = {"blocks.0.self_attn.k.weight": torch.zeros(1536, 1536)}
    assert ckpt.detect_wan_config(sd).dim == 1536
    sd = {"blocks.0.self_attn.k.weight": torch.zeros(5120, 5120)}
    assert ckpt.detect_wan_config(sd).dim == 5120


def test_t5_converter_roundtrip():
    cfg = T5_CONFIGS["t5-tiny"]
    params = t5_mod.init_t5_encoder_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    sd = {"token_embedding.weight": _t(params["token_embedding"]),
          "norm.weight": _t(params["norm"]["scale"])}
    bp = params["blocks"]
    for i in range(cfg.num_layers):
        sd[f"blocks.{i}.norm1.weight"] = _t(bp["norm1"]["scale"][i])
        sd[f"blocks.{i}.norm2.weight"] = _t(bp["norm2"]["scale"][i])
        for n in ("q", "k", "v", "o"):
            sd[f"blocks.{i}.attn.{n}.weight"] = _t(np.asarray(bp["attn"][n]["w"][i]).T)
        sd[f"blocks.{i}.ffn.gate.0.weight"] = _t(np.asarray(bp["ffn"]["gate"]["w"][i]).T)
        sd[f"blocks.{i}.ffn.fc1.weight"] = _t(np.asarray(bp["ffn"]["fc1"]["w"][i]).T)
        sd[f"blocks.{i}.ffn.fc2.weight"] = _t(np.asarray(bp["ffn"]["fc2"]["w"][i]).T)
        sd[f"blocks.{i}.pos_embedding.embedding.weight"] = _t(bp["rel_emb"][i])
    got = ckpt.convert_t5_encoder(sd, cfg, jnp.float32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6)
