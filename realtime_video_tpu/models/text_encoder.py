"""Text encoder wrapper (reference: utils/wan_wrapper.py:20-55 WanTextEncoder).

Tokenise -> umT5 encode -> zero padding positions -> {"prompt_embeds": [B,512,4096]}.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from realtime_video_tpu.config import MODEL_FOLDER, T5Config, T5_CONFIGS
from realtime_video_tpu.models import t5 as t5_mod
from realtime_video_tpu.utils.tokenizer import load_tokenizer


class WanTextEncoder:
    def __init__(
        self,
        cfg: Optional[T5Config] = None,
        params: Optional[Dict[str, Any]] = None,
        tokenizer=None,
        dtype=jnp.bfloat16,
        checkpoint_path: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
    ):
        if params is None and checkpoint_path:
            from realtime_video_tpu.utils.checkpoint import load_t5

            cfg, params = load_t5(checkpoint_path, cfg, dtype)
        if cfg is None:
            cfg = T5_CONFIGS["umt5-xxl"]
        if params is None:
            # random init (dev without checkpoints)
            params = t5_mod.init_t5_encoder_params(jax.random.PRNGKey(0), cfg, dtype)
        self.cfg = cfg
        self.params = params
        if tokenizer is None:
            tokenizer_path = tokenizer_path or os.path.join(
                MODEL_FOLDER, "Wan2.1-T2V-1.3B", "google", "umt5-xxl"
            )
            tokenizer = load_tokenizer(tokenizer_path, seq_len=cfg.text_len)
        self.tokenizer = tokenizer
        self._encode = jax.jit(
            lambda p, ids, mask: t5_mod.encode_prompts(self.cfg, p, ids, mask)
        )

    @classmethod
    def from_model_folder(cls, dtype=jnp.bfloat16) -> "WanTextEncoder":
        ckpt = os.path.join(
            MODEL_FOLDER, "Wan2.1-T2V-1.3B", "models_t5_umt5-xxl-enc-bf16.safetensors"
        )
        return cls(checkpoint_path=ckpt if os.path.exists(ckpt) else None, dtype=dtype)

    def __call__(self, text_prompts: List[str]) -> Dict[str, jnp.ndarray]:
        ids, mask = self.tokenizer(
            text_prompts, return_mask=True, add_special_tokens=True
        )
        ctx = self._encode(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return {"prompt_embeds": ctx}


class StaticTextEncoder:
    """Fixed-embedding stand-in (reference USE_STATIC_ENCODER_COND_DICT,
    release_server.py:125-133) — isolates transformer perf from T5."""

    def __init__(self, prompt_embeds: jnp.ndarray):
        self.prompt_embeds = prompt_embeds

    def __call__(self, text_prompts: List[str]) -> Dict[str, jnp.ndarray]:
        del text_prompts
        return {"prompt_embeds": self.prompt_embeds}
