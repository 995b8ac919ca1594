"""Prompt expansion (reference: wan/utils/prompt_extend.py — DashScope API and
local Qwen expanders, :157/:300).

Network/model-gated: the DashScope expander needs an API key + egress; the
local expander needs a Qwen checkpoint via transformers. Both degrade to a
deterministic template expander so the serving flag keeps working offline.
"""
from __future__ import annotations

import dataclasses
import os
import random
from typing import Optional

#: system prompts mirroring the reference's zh/en expanders
LM_EN_SYS_PROMPT = (
    "You are a prompt engineer for a text-to-video model. Rewrite the user's "
    "prompt into a single detailed English description of the scene: subjects, "
    "their actions over time, environment, lighting, camera movement and "
    "style. Keep it under 100 words. Output only the rewritten prompt."
)


@dataclasses.dataclass
class PromptOutput:
    status: bool
    prompt: str
    seed: int = -1
    system_prompt: str = ""
    message: str = ""


class PromptExpander:
    def __init__(self, model_name: Optional[str] = None, is_vl: bool = False, **kwargs):
        self.model_name = model_name
        self.is_vl = is_vl

    def __call__(self, prompt: str, system_prompt: Optional[str] = None,
                 seed: int = -1, **kwargs) -> PromptOutput:
        return self.extend(prompt, system_prompt or LM_EN_SYS_PROMPT, seed)

    def extend(self, prompt, system_prompt, seed=-1) -> PromptOutput:
        raise NotImplementedError


class DashScopePromptExpander(PromptExpander):
    """Remote expander via DashScope (reference :157). Requires
    DASH_API_KEY + network; raises a clear error otherwise."""

    def extend(self, prompt, system_prompt, seed=-1) -> PromptOutput:
        api_key = os.getenv("DASH_API_KEY")
        if not api_key:
            return PromptOutput(False, prompt, seed, system_prompt,
                                "DASH_API_KEY not set")
        try:
            import dashscope  # optional

            dashscope.api_key = api_key
            resp = dashscope.Generation.call(
                self.model_name or "qwen-plus",
                messages=[
                    {"role": "system", "content": system_prompt},
                    {"role": "user", "content": prompt},
                ],
                result_format="message",
                seed=seed if seed >= 0 else random.randint(0, 2**31),
            )
            text = resp.output.choices[0].message.content
            return PromptOutput(True, text, seed, system_prompt)
        except Exception as e:  # noqa: BLE001
            return PromptOutput(False, prompt, seed, system_prompt, str(e))


class QwenPromptExpander(PromptExpander):
    """Local Qwen expander (reference :300). Requires a local checkpoint."""

    def __init__(self, model_name: Optional[str] = None, **kwargs):
        super().__init__(model_name, **kwargs)
        self._model = None
        self._tokenizer = None

    def _load(self):
        from transformers import AutoModelForCausalLM, AutoTokenizer

        self._tokenizer = AutoTokenizer.from_pretrained(self.model_name)
        self._model = AutoModelForCausalLM.from_pretrained(self.model_name)

    def extend(self, prompt, system_prompt, seed=-1) -> PromptOutput:
        try:
            if self._model is None:
                self._load()
            msgs = [
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": prompt},
            ]
            text = self._tokenizer.apply_chat_template(
                msgs, tokenize=False, add_generation_prompt=True
            )
            inputs = self._tokenizer([text], return_tensors="pt")
            out = self._model.generate(**inputs, max_new_tokens=256)
            reply = self._tokenizer.decode(
                out[0][inputs["input_ids"].shape[1]:], skip_special_tokens=True
            )
            return PromptOutput(True, reply.strip(), seed, system_prompt)
        except Exception as e:  # noqa: BLE001
            return PromptOutput(False, prompt, seed, system_prompt, str(e))


class TemplatePromptExpander(PromptExpander):
    """Deterministic offline fallback: appends cinematic style descriptors."""

    _SUFFIXES = [
        "cinematic lighting, smooth camera motion, highly detailed, 4k",
        "shallow depth of field, natural colors, steady tracking shot",
        "dramatic golden-hour light, gentle dolly-in, film grain",
    ]

    def extend(self, prompt, system_prompt, seed=-1) -> PromptOutput:
        rnd = random.Random(seed if seed >= 0 else 0)
        suffix = rnd.choice(self._SUFFIXES)
        return PromptOutput(True, f"{prompt}, {suffix}", seed, system_prompt)


def get_prompt_expander(kind: str = "auto", model_name: Optional[str] = None) -> PromptExpander:
    if kind == "dashscope":
        return DashScopePromptExpander(model_name)
    if kind == "qwen":
        return QwenPromptExpander(model_name)
    if kind == "template":
        return TemplatePromptExpander(model_name)
    # auto: remote if key present, else offline template
    if os.getenv("DASH_API_KEY"):
        return DashScopePromptExpander(model_name)
    return TemplatePromptExpander(model_name)
