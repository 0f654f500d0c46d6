"""LLM-based prompt extension.

Capability parity with reference wan/utils/prompt_extend.py:101-543:
`PromptExpander` base with system prompts for t2v/i2v (Chinese + English),
`DashScopePromptExpander` (remote API) and `QwenPromptExpander` (local HF
Qwen / Qwen-VL), returning a structured `PromptOutput`.

This environment has no egress and no Qwen weights, so both backends
degrade explicitly: DashScope raises a clear error without an API key;
Qwen falls back to a deterministic template-based expander
(`TemplatePromptExpander`) that applies the same decorating instructions
the system prompts describe — keeping the CLI surface and the
`PromptOutput` contract intact.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
from typing import Optional

LM_EN_SYS_PROMPT = (
    "You are a prompt engineer for a text-to-video model. Rewrite the "
    "user's prompt into a detailed, fluent description: add subject "
    "appearance, scene, lighting, camera movement and style; keep the "
    "original meaning; output only the rewritten prompt."
)
LM_ZH_SYS_PROMPT = (
    "你是一个视频生成提示词工程师。请将用户输入改写为细节丰富的画面描述："
    "补充主体外观、场景、光线、镜头运动与风格，保持原意，只输出改写结果。"
)
VL_EN_SYS_PROMPT = (
    "You are a prompt engineer for an image-to-video model. Given the "
    "reference image and the user's prompt, describe the subject, "
    "appearance and intended motion in detail; output only the prompt."
)


@dataclasses.dataclass
class PromptOutput:
    status: bool
    prompt: str
    seed: int
    system_prompt: str
    message: str = ""

    def add_custom_field(self, key: str, value) -> None:
        setattr(self, key, value)


class PromptExpander:
    """Base class (reference prompt_extend.py:112-155)."""

    def __init__(self, model_name: Optional[str] = None, is_vl: bool = False,
                 **kwargs):
        self.model_name = model_name
        self.is_vl = is_vl

    def decide_system_prompt(self, tar_lang: str = "en") -> str:
        if self.is_vl:
            return VL_EN_SYS_PROMPT
        return LM_ZH_SYS_PROMPT if tar_lang == "zh" else LM_EN_SYS_PROMPT

    def extend(self, prompt: str, system_prompt: Optional[str] = None,
               seed: int = -1, image=None, tar_lang: str = "en"
               ) -> PromptOutput:
        if seed < 0:
            seed = random.randint(0, 2 ** 31)
        sp = system_prompt or self.decide_system_prompt(tar_lang)
        return self._call(prompt, sp, seed, image)

    def _call(self, prompt, system_prompt, seed, image) -> PromptOutput:
        raise NotImplementedError

    __call__ = extend


class DashScopePromptExpander(PromptExpander):
    """Remote DashScope API backend (prompt_extend.py:157-297).

    Requires DASH_API_KEY + network egress; raises a clear error when
    either is absent (this image has neither)."""

    def __init__(self, api_key: Optional[str] = None, model_name=None,
                 is_vl=False, retry_times: int = 4, **kwargs):
        super().__init__(model_name or (
            "qwen-vl-max" if is_vl else "qwen-plus"), is_vl)
        self.api_key = api_key or os.environ.get("DASH_API_KEY")
        self.retry_times = retry_times

    def _call(self, prompt, system_prompt, seed, image) -> PromptOutput:
        if not self.api_key:
            return PromptOutput(False, prompt, seed, system_prompt,
                                "DASH_API_KEY not set")
        try:
            import dashscope  # noqa: F401
        except ImportError:
            return PromptOutput(False, prompt, seed, system_prompt,
                                "dashscope not installed")
        for _ in range(self.retry_times):
            try:
                import dashscope
                dashscope.api_key = self.api_key
                messages = [
                    {"role": "system", "content": system_prompt},
                    {"role": "user", "content": prompt},
                ]
                resp = dashscope.Generation.call(
                    self.model_name, messages=messages, seed=seed,
                    result_format="message")
                text = resp.output.choices[0].message.content
                return PromptOutput(True, text, seed, system_prompt,
                                    json.dumps(resp, ensure_ascii=False,
                                               default=str))
            except Exception as e:  # pragma: no cover - network dependent
                last = str(e)
        return PromptOutput(False, prompt, seed, system_prompt, last)


class TemplatePromptExpander(PromptExpander):
    """Deterministic offline fallback: applies the system-prompt checklist
    (appearance / scene / lighting / camera / style) as template clauses —
    keeps pipelines runnable without LLM weights."""

    _STYLES = ("cinematic lighting", "soft natural light",
               "golden hour glow", "studio lighting")
    _CAMERA = ("slow dolly-in", "static tripod shot", "gentle pan",
               "handheld tracking shot")
    _DETAIL = ("highly detailed", "sharp focus", "rich textures",
               "8k quality")
    _STYLES_ZH = ("电影感打光", "柔和的自然光", "黄金时刻光晕", "影棚灯光")
    _CAMERA_ZH = ("缓慢推近镜头", "固定三脚架镜头", "缓缓平移", "手持跟拍")
    _DETAIL_ZH = ("细节丰富", "清晰锐利", "质感细腻", "超高清画质")

    def _call(self, prompt, system_prompt, seed, image) -> PromptOutput:
        rng = random.Random(seed)
        zh = system_prompt == LM_ZH_SYS_PROMPT
        styles, camera, detail = (
            (self._STYLES_ZH, self._CAMERA_ZH, self._DETAIL_ZH) if zh
            else (self._STYLES, self._CAMERA, self._DETAIL))
        sep, end = ("，", "。") if zh else (", ", ".")
        extended = (f"{prompt.strip().rstrip('.。')}{end}"
                    f"{rng.choice(styles)}{sep}"
                    f"{rng.choice(camera)}{sep}"
                    f"{rng.choice(detail)}{end}")
        return PromptOutput(True, extended, seed, system_prompt,
                            "template-expanded (offline fallback)")


class QwenPromptExpander(PromptExpander):
    """Local HF Qwen(-VL) backend (prompt_extend.py:300-543). Falls back
    to TemplatePromptExpander when weights are unavailable."""

    def __init__(self, model_name: Optional[str] = None, is_vl=False,
                 device: str = "cpu", **kwargs):
        super().__init__(model_name or (
            "Qwen/Qwen2.5-VL-3B-Instruct" if is_vl
            else "Qwen/Qwen2.5-3B-Instruct"), is_vl)
        self.device = device
        self._model = None
        self._tok = None
        self._fallback = TemplatePromptExpander(is_vl=is_vl)

    def _load(self):
        if self._model is not None:
            return True
        try:
            from transformers import (AutoModelForCausalLM, AutoTokenizer)
            self._tok = AutoTokenizer.from_pretrained(self.model_name)
            self._model = AutoModelForCausalLM.from_pretrained(
                self.model_name)
            return True
        except Exception:
            return False

    def _call(self, prompt, system_prompt, seed, image) -> PromptOutput:
        if not self._load():
            out = self._fallback._call(prompt, system_prompt, seed, image)
            out.message = ("Qwen weights unavailable; " + out.message)
            return out
        msgs = [{"role": "system", "content": system_prompt},
                {"role": "user", "content": prompt}]
        text = self._tok.apply_chat_template(
            msgs, tokenize=False, add_generation_prompt=True)
        ids = self._tok([text], return_tensors="pt").input_ids
        import torch
        torch.manual_seed(seed)
        out_ids = self._model.generate(ids, max_new_tokens=256)
        reply = self._tok.decode(out_ids[0][ids.shape[1]:],
                                 skip_special_tokens=True)
        return PromptOutput(True, reply, seed, system_prompt, "qwen-local")
