"""Image helpers (reference: demo_utils/utils.py — resize/crop, json io,
LoRA parameter utilities, FramePack heritage)."""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np


def resize_and_center_crop(
    image: np.ndarray, target_width: int, target_height: int
) -> np.ndarray:
    """[H, W, C] uint8/float -> resized + center-cropped to (target_h, target_w)
    (demo_utils/utils.py resize_and_center_crop)."""
    from PIL import Image

    h, w = image.shape[:2]
    scale = max(target_width / w, target_height / h)
    new_w, new_h = int(round(w * scale)), int(round(h * scale))
    arr = image
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    im = Image.fromarray(arr).resize((new_w, new_h), Image.LANCZOS)
    left = (new_w - target_width) // 2
    top = (new_h - target_height) // 2
    im = im.crop((left, top, left + target_width, top + target_height))
    out = np.asarray(im)
    if image.dtype != np.uint8:
        out = out.astype(np.float32) / 255.0
    return out


def resize_without_crop(image: np.ndarray, target_width: int, target_height: int) -> np.ndarray:
    from PIL import Image

    arr = image
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    out = np.asarray(Image.fromarray(arr).resize((target_width, target_height), Image.LANCZOS))
    if image.dtype != np.uint8:
        out = out.astype(np.float32) / 255.0
    return out


def generate_timestamp() -> str:
    import time
    import random

    return time.strftime("%y%m%d_%H%M%S") + f"_{random.randint(0, 9999):04d}"


def read_json(path: str) -> Any:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def write_json(path: str, data: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2)


# -- LoRA parameter utilities (demo_utils/utils.py LoRA helpers) -------------


def merge_lora_delta(
    w: np.ndarray, lora_down: np.ndarray, lora_up: np.ndarray, alpha: float = 1.0
) -> np.ndarray:
    """w[in,out] + alpha * (down[in,r] @ up[r,out]) — fold a LoRA pair into a
    base weight (weights here are [in, out]; torch checkpoints come as
    [out, in] and are transposed by the checkpoint converters)."""
    return w + alpha * (lora_down @ lora_up)


def apply_lora_to_params(
    params: Dict[str, Any],
    lora: Dict[str, Tuple[np.ndarray, np.ndarray]],
    alpha: float = 1.0,
) -> Dict[str, Any]:
    """Apply {path: (down, up)} LoRA pairs to a param pytree; paths use
    '/'-joined keys, e.g. 'blocks/self_attn/q'."""
    import jax

    def walk(p, prefix):
        if isinstance(p, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k) for k, v in p.items()}
        return p

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    for path, (down, up) in lora.items():
        node = out
        keys = path.split("/")
        for k in keys[:-1]:
            node = node[k]
        node[keys[-1]] = merge_lora_delta(np.asarray(node[keys[-1]]), down, up, alpha)
    return out
