"""Checkpoint loading: torch/safetensors state dicts -> JAX param pytrees.

Handles the reference's checkpoint formats:
  * DiT safetensors with optional "model." prefix fixup (sweep_sample.py:7-21,
    release_server.py:160-169) and 1.3B/14B autodetect from
    blocks.0.self_attn.k.weight (release_server.py:162-165);
  * umt5-xxl encoder safetensors (models_t5_umt5-xxl-enc-bf16.safetensors);
  * Wan2.1_VAE.pth torch pickle.

Torch linear weights are [out,in] -> transposed to [in,out]; conv3d
[out,in,kt,kh,kw] -> [kt,kh,kw,in,out]; per-layer tensors are stacked on a
leading layer axis to match the scan-based models.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from realtime_video_tpu.config import T5Config, VAEConfig, WanModelConfig, WAN_CONFIGS


def _to_np(t) -> np.ndarray:
    """torch tensor (possibly bf16) -> float32 numpy."""
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .safetensors or .pt/.pth file into a name->tensor dict."""
    if path.endswith(".safetensors") or path.endswith(".sft"):
        from safetensors.torch import load_file

        return load_file(path, device="cpu")
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def strip_prefix(sd: Dict[str, Any], prefix: str = "model.") -> Dict[str, Any]:
    """Remove a wrapper prefix if every key carries it (sweep_sample.py:7-21)."""
    if sd and all(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items()}
    # mixed: strip where present
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}
    return sd


def detect_wan_config(sd: Dict[str, Any]) -> WanModelConfig:
    """1.3B vs 14B autodetect (release_server.py:162-165)."""
    w = sd.get("blocks.0.self_attn.k.weight")
    if w is not None and w.shape[0] == 1536:
        return WAN_CONFIGS["t2v-1.3B"]
    return WAN_CONFIGS["t2v-14B"]


def _lin(sd, name, dtype, bias=True) -> Dict[str, jnp.ndarray]:
    p = {"w": jnp.asarray(_to_np(sd[f"{name}.weight"]).T, dtype)}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_to_np(sd[f"{name}.bias"]), dtype)
    return p


def _stack(dicts):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *dicts)


def convert_wan_dit(
    sd: Dict[str, Any], cfg: WanModelConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    sd = strip_prefix(sd, "model.")
    # fused to_qkv checkpoints (server fuses at load; upstream ckpts are split)
    d = cfg.dim

    def attn_params(base: str) -> Dict[str, Any]:
        if f"{base}.to_qkv.weight" in sd:
            w = _to_np(sd[f"{base}.to_qkv.weight"])
            b = _to_np(sd[f"{base}.to_qkv.bias"])
            qw, kw, vw = np.split(w, 3, axis=0)
            qb, kb, vb = np.split(b, 3, axis=0)
            out = {
                "q": {"w": jnp.asarray(qw.T, dtype), "b": jnp.asarray(qb, dtype)},
                "k": {"w": jnp.asarray(kw.T, dtype), "b": jnp.asarray(kb, dtype)},
                "v": {"w": jnp.asarray(vw.T, dtype), "b": jnp.asarray(vb, dtype)},
            }
        else:
            out = {n: _lin(sd, f"{base}.{n}", dtype) for n in ("q", "k", "v")}
        out["o"] = _lin(sd, f"{base}.o", dtype)
        out["norm_q"] = {"scale": jnp.asarray(_to_np(sd[f"{base}.norm_q.weight"]), dtype)}
        out["norm_k"] = {"scale": jnp.asarray(_to_np(sd[f"{base}.norm_k.weight"]), dtype)}
        if f"{base}.k_img.weight" in sd:
            out["k_img"] = _lin(sd, f"{base}.k_img", dtype)
            out["v_img"] = _lin(sd, f"{base}.v_img", dtype)
            out["norm_k_img"] = {
                "scale": jnp.asarray(_to_np(sd[f"{base}.norm_k_img.weight"]), dtype)
            }
        return out

    blocks = []
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        blk = {
            "self_attn": attn_params(f"{b}.self_attn"),
            "cross_attn": attn_params(f"{b}.cross_attn"),
            "ffn": {
                "fc1": _lin(sd, f"{b}.ffn.0", dtype),
                "fc2": _lin(sd, f"{b}.ffn.2", dtype),
            },
            "modulation": jnp.asarray(_to_np(sd[f"{b}.modulation"]), jnp.float32),
        }
        if cfg.cross_attn_norm:
            blk["norm3"] = {
                "scale": jnp.asarray(_to_np(sd[f"{b}.norm3.weight"]), dtype),
                "bias": jnp.asarray(_to_np(sd[f"{b}.norm3.bias"]), dtype),
            }
        blocks.append(blk)

    pe_w = _to_np(sd["patch_embedding.weight"])  # [D, C, pt, ph, pw]
    pe = {
        # flatten (C, pt*ph*pw) row-major to match patchify's token layout
        "w": jnp.asarray(pe_w.reshape(pe_w.shape[0], -1).T, dtype),
        "b": jnp.asarray(_to_np(sd["patch_embedding.bias"]), dtype),
    }
    params = {
        "patch_embedding": pe,
        "text_embedding": {
            "fc1": _lin(sd, "text_embedding.0", dtype),
            "fc2": _lin(sd, "text_embedding.2", dtype),
        },
        "time_embedding": {
            "fc1": _lin(sd, "time_embedding.0", jnp.float32),
            "fc2": _lin(sd, "time_embedding.2", jnp.float32),
        },
        "time_projection": {"fc": _lin(sd, "time_projection.1", jnp.float32)},
        "blocks": _stack(blocks),
        "head": {
            "head": _lin(sd, "head.head", dtype),
            "modulation": jnp.asarray(_to_np(sd["head.modulation"]), jnp.float32),
        },
    }
    if "img_emb.proj.0.weight" in sd:
        params["img_emb"] = {
            "norm1": {
                "scale": jnp.asarray(_to_np(sd["img_emb.proj.0.weight"]), dtype),
                "bias": jnp.asarray(_to_np(sd["img_emb.proj.0.bias"]), dtype),
            },
            "fc1": _lin(sd, "img_emb.proj.1", dtype),
            "fc2": _lin(sd, "img_emb.proj.3", dtype),
            "norm2": {
                "scale": jnp.asarray(_to_np(sd["img_emb.proj.4.weight"]), dtype),
                "bias": jnp.asarray(_to_np(sd["img_emb.proj.4.bias"]), dtype),
            },
        }
    return params


def convert_t5_encoder(
    sd: Dict[str, Any], cfg: T5Config, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    blocks = []
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        blocks.append(
            {
                "norm1": {"scale": jnp.asarray(_to_np(sd[f"{b}.norm1.weight"]), dtype)},
                "attn": {
                    n: _lin(sd, f"{b}.attn.{n}", dtype, bias=False)
                    for n in ("q", "k", "v", "o")
                },
                "norm2": {"scale": jnp.asarray(_to_np(sd[f"{b}.norm2.weight"]), dtype)},
                "ffn": {
                    "gate": _lin(sd, f"{b}.ffn.gate.0", dtype, bias=False),
                    "fc1": _lin(sd, f"{b}.ffn.fc1", dtype, bias=False),
                    "fc2": _lin(sd, f"{b}.ffn.fc2", dtype, bias=False),
                },
                "rel_emb": jnp.asarray(
                    _to_np(sd[f"{b}.pos_embedding.embedding.weight"]), jnp.float32
                ),
            }
        )
    return {
        "token_embedding": jnp.asarray(_to_np(sd["token_embedding.weight"]), dtype),
        "blocks": _stack(blocks),
        "norm": {"scale": jnp.asarray(_to_np(sd["norm.weight"]), dtype)},
    }


def _conv3(sd, name, dtype) -> Dict[str, jnp.ndarray]:
    w = _to_np(sd[f"{name}.weight"])  # [out,in,kt,kh,kw]
    return {
        "w": jnp.asarray(w.transpose(2, 3, 4, 1, 0), dtype),
        "b": jnp.asarray(_to_np(sd[f"{name}.bias"]), dtype),
    }


def _conv2(sd, name, dtype) -> Dict[str, jnp.ndarray]:
    w = _to_np(sd[f"{name}.weight"])  # [out,in,kh,kw]
    return {
        "w": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
        "b": jnp.asarray(_to_np(sd[f"{name}.bias"]), dtype),
    }


def _res_params(sd, base, dtype) -> Dict[str, Any]:
    p = {
        "norm1": {"gamma": jnp.asarray(_to_np(sd[f"{base}.residual.0.gamma"]).reshape(-1), dtype)},
        "conv1": _conv3(sd, f"{base}.residual.2", dtype),
        "norm2": {"gamma": jnp.asarray(_to_np(sd[f"{base}.residual.3.gamma"]).reshape(-1), dtype)},
        "conv2": _conv3(sd, f"{base}.residual.6", dtype),
    }
    if f"{base}.shortcut.weight" in sd:
        p["shortcut"] = _conv3(sd, f"{base}.shortcut", dtype)
    return p


def _attn_params(sd, base, dtype) -> Dict[str, Any]:
    # to_qkv/proj are 1x1 Conv2d [out,in,1,1] -> dense [in,out]
    qkv_w = _to_np(sd[f"{base}.to_qkv.weight"])[:, :, 0, 0]
    proj_w = _to_np(sd[f"{base}.proj.weight"])[:, :, 0, 0]
    return {
        "norm": {"gamma": jnp.asarray(_to_np(sd[f"{base}.norm.gamma"]).reshape(-1), dtype)},
        "to_qkv": {
            "w": jnp.asarray(qkv_w.T, dtype),
            "b": jnp.asarray(_to_np(sd[f"{base}.to_qkv.bias"]), dtype),
        },
        "proj": {
            "w": jnp.asarray(proj_w.T, dtype),
            "b": jnp.asarray(_to_np(sd[f"{base}.proj.bias"]), dtype),
        },
    }


def _resample_params(sd, base, mode, dtype) -> Dict[str, Any]:
    p = {}
    if mode != "none":
        p["conv"] = _conv2(sd, f"{base}.resample.1", dtype)
    if mode in ("upsample3d", "downsample3d"):
        p["time_conv"] = _conv3(sd, f"{base}.time_conv", dtype)
    return p


def convert_vae(sd: Dict[str, Any], cfg: VAEConfig, dtype=jnp.float32) -> Dict[str, Any]:
    from realtime_video_tpu.models.vae import _decoder_plan, _encoder_plan

    def stage(prefix, plan):
        out = []
        for i, spec in enumerate(plan):
            base = f"{prefix}.{i}"
            if spec[0] == "res":
                out.append(_res_params(sd, base, dtype))
            else:
                out.append(_resample_params(sd, base, spec[1], dtype))
        return out

    _, enc_plan = _encoder_plan(cfg)
    _, dec_plan = _decoder_plan(cfg)
    encoder = {
        "conv1": _conv3(sd, "encoder.conv1", dtype),
        "downsamples": stage("encoder.downsamples", enc_plan),
        "middle_res1": _res_params(sd, "encoder.middle.0", dtype),
        "middle_attn": _attn_params(sd, "encoder.middle.1", dtype),
        "middle_res2": _res_params(sd, "encoder.middle.2", dtype),
        "head_norm": {"gamma": jnp.asarray(_to_np(sd["encoder.head.0.gamma"]).reshape(-1), dtype)},
        "head_conv": _conv3(sd, "encoder.head.2", dtype),
    }
    decoder = {
        "conv1": _conv3(sd, "decoder.conv1", dtype),
        "middle_res1": _res_params(sd, "decoder.middle.0", dtype),
        "middle_attn": _attn_params(sd, "decoder.middle.1", dtype),
        "middle_res2": _res_params(sd, "decoder.middle.2", dtype),
        "upsamples": stage("decoder.upsamples", dec_plan),
        "head_norm": {"gamma": jnp.asarray(_to_np(sd["decoder.head.0.gamma"]).reshape(-1), dtype)},
        "head_conv": _conv3(sd, "decoder.head.2", dtype),
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        "conv1": _conv3(sd, "conv1", dtype),
        "conv2": _conv3(sd, "conv2", dtype),
    }


def load_wan_dit(
    checkpoint_path: str, dtype=jnp.bfloat16
) -> Tuple[WanModelConfig, Dict[str, Any]]:
    sd = load_torch_state_dict(checkpoint_path)
    sd = strip_prefix(sd, "model.")
    cfg = detect_wan_config(sd)
    return cfg, convert_wan_dit(sd, cfg, dtype)


def load_t5(checkpoint_path: str, cfg: Optional[T5Config] = None, dtype=jnp.bfloat16):
    from realtime_video_tpu.config import T5_CONFIGS

    cfg = cfg or T5_CONFIGS["umt5-xxl"]
    sd = load_torch_state_dict(checkpoint_path)
    return cfg, convert_t5_encoder(sd, cfg, dtype)


def load_vae(checkpoint_path: str, cfg: Optional[VAEConfig] = None, dtype=jnp.float32):
    from realtime_video_tpu.config import VAE_CONFIGS

    cfg = cfg or VAE_CONFIGS["wan2.1"]
    sd = load_torch_state_dict(checkpoint_path)
    return cfg, convert_vae(sd, cfg, dtype)
