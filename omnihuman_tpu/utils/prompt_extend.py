"""LLM-based prompt extension.

Capability parity with reference wan/utils/prompt_extend.py:101-543:
`PromptExpander` base with system prompts for t2v/i2v (Chinese + English),
`DashScopePromptExpander` (remote API) and `QwenPromptExpander` (local HF
Qwen / Qwen-VL), returning a structured `PromptOutput`.

The Qwen backend's preferred path is TPU-native: a converted checkpoint
run through the JAX Qwen2 graph (models/qwen.py, parity-tested against
transformers), selected via `checkpoint_path`/`tokenizer_path`. This
environment has no egress and no Qwen weights, so the backends degrade
explicitly: DashScope raises a clear error without an API key; Qwen
falls back to a deterministic template-based expander
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
    """Local Qwen(-VL) backend (prompt_extend.py:300-543).

    Preferred path: a converted checkpoint run through the TPU-native
    JAX Qwen2 graph (models/qwen.py — jitted prefill + lax.scan decode),
    selected by `checkpoint_path` (torch .pt/.safetensors state dict of
    an HF Qwen2ForCausalLM) + `tokenizer_path` (local HF tokenizer dir).
    Second choice: the HF torch model by `model_name`. Falls back to
    TemplatePromptExpander when neither is loadable (this image ships no
    weights and has no egress)."""

    def __init__(self, model_name: Optional[str] = None, is_vl=False,
                 device: str = "cpu", checkpoint_path: Optional[str] = None,
                 tokenizer_path: Optional[str] = None,
                 max_new_tokens: int = 512, **kwargs):
        super().__init__(model_name or (
            "Qwen/Qwen2.5-VL-3B-Instruct" if is_vl
            else "Qwen/Qwen2.5-3B-Instruct"), is_vl)
        self.device = device
        self.checkpoint_path = checkpoint_path
        self.tokenizer_path = tokenizer_path
        self.max_new_tokens = max_new_tokens
        self._model = None
        self._tok = None
        self._jax = None                 # (params, cfg)
        self._fallback = TemplatePromptExpander(is_vl=is_vl)

    def _load_tokenizer(self):
        if self._tok is not None:
            return True
        try:
            from transformers import AutoTokenizer
            self._tok = AutoTokenizer.from_pretrained(
                self.tokenizer_path or self.model_name)
            return True
        except Exception:
            return False

    def _load_jax(self):
        """Converted-checkpoint path through the JAX Qwen2 graph."""
        if self._jax is not None:
            return True
        if not (self.checkpoint_path
                and os.path.exists(self.checkpoint_path)
                and self._load_tokenizer()):
            return False
        try:
            from omnihuman_tpu.models.qwen import load_qwen_checkpoint
            self._jax = load_qwen_checkpoint(self.checkpoint_path)
            return True
        except Exception:
            return False

    def _load(self):
        if self._model is not None:
            return True
        try:
            from transformers import AutoModelForCausalLM
            if not self._load_tokenizer():
                return False
            self._model = AutoModelForCausalLM.from_pretrained(
                self.model_name)
            return True
        except Exception:
            return False

    def _chat_ids(self, prompt, system_prompt):
        msgs = [{"role": "system", "content": system_prompt},
                {"role": "user", "content": prompt}]
        text = self._tok.apply_chat_template(
            msgs, tokenize=False, add_generation_prompt=True)
        return self._tok([text], return_tensors="np").input_ids

    def _call(self, prompt, system_prompt, seed, image) -> PromptOutput:
        if self._load_jax():
            import jax
            import jax.numpy as jnp

            from omnihuman_tpu.models.qwen import qwen_generate
            params, cfg = self._jax
            ids = self._chat_ids(prompt, system_prompt)
            eos = int(self._tok.eos_token_id or -1)
            out = qwen_generate(
                params, jnp.asarray(ids, jnp.int32),
                jnp.asarray([ids.shape[1]]), cfg,
                max_new_tokens=self.max_new_tokens,
                key=jax.random.key(max(seed, 0)), eos_id=eos)
            toks = [int(t) for t in out[0] if int(t) != eos]
            reply = self._tok.decode(toks, skip_special_tokens=True)
            return PromptOutput(True, reply, seed, system_prompt,
                                "qwen-jax")
        if self._load():
            ids = self._chat_ids(prompt, system_prompt)
            import torch
            torch.manual_seed(seed)
            out_ids = self._model.generate(torch.tensor(ids),
                                           max_new_tokens=256)
            reply = self._tok.decode(out_ids[0][ids.shape[1]:],
                                     skip_special_tokens=True)
            return PromptOutput(True, reply, seed, system_prompt,
                                "qwen-local")
        out = self._fallback._call(prompt, system_prompt, seed, image)
        out.message = ("Qwen weights unavailable; " + out.message)
        return out
