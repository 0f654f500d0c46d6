"""Read-only loader for the PyTorch reference modules (/root/reference).

Used by test_reference_parity.py to prove end-to-end forward parity of the
weight conversion (utils/convert.py) against the actual torch modules the
checkpoints were built for (reference wan/modules/model.py:377 `WanModel`,
vae.py:483 `WanVAE_`).

The reference imports two things unavailable here:
  - diffusers (ConfigMixin/ModelMixin/register_to_config) — stubbed with
    minimal no-op equivalents; WanModel assigns all hyperparameters itself
    (model.py:444-462) so nothing of diffusers' behavior is needed.
  - flash-attn CUDA kernels — its `flash_attention` shim hard-asserts CUDA
    (attention.py:54). We patch in an exact fp32 SDPA with the same varlen
    semantics (per-sample k_lens masking) BEFORE model.py binds the name,
    which also pins the golden numerics to fp32 (the reference's fp16/bf16
    autocast contexts are no-ops on CPU).

Nothing is copied from the reference: its files are exec'd from their
read-only location.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import logging
import sys
import types

import torch

REF_MODULES = "/root/reference/seaweed_apt/wan/modules"
_PKG = "refwan"


def flash_attention_fp32(q, k, v, q_lens=None, k_lens=None, dropout_p=0.0,
                         softmax_scale=None, q_scale=None, causal=False,
                         window_size=(-1, -1), deterministic=False,
                         dtype=torch.bfloat16, version=None):
    """fp32 SDPA with the reference shim's varlen masking semantics
    (attention.py:24-131): [B, L, N, C] layout, per-sample k_lens exclude
    padded keys, no softmax-scale override in the Wan call sites."""
    assert tuple(window_size) == (-1, -1) and not causal and dropout_p == 0.0
    b, lq, n, c = q.shape
    lk = k.shape[1]
    out_dtype = q.dtype
    qf, kf, vf = q.float(), k.float(), v.float()
    if q_scale is not None:
        qf = qf * q_scale
    scale = softmax_scale if softmax_scale is not None else c ** -0.5
    logits = torch.einsum("binc,bjnc->bnij", qf, kf) * scale
    if k_lens is not None:
        kmask = torch.arange(lk)[None, :] >= k_lens[:, None].long()
        logits = logits.masked_fill(kmask[:, None, None, :], float("-inf"))
    attn = logits.softmax(dim=-1)
    out = torch.einsum("bnij,bjnc->binc", attn, vf)
    if q_lens is not None:
        qmask = torch.arange(lq)[None, :] < q_lens[:, None].long()
        out = out * qmask[:, :, None, None].float()
    return out.to(out_dtype)


def _stub_module(name: str) -> types.ModuleType:
    # A bare ModuleType has __spec__=None, which makes a LATER
    # importlib.util.find_spec(name) raise ValueError — transformers
    # probes find_spec("torchvision") at import time, so the T5/CLIP
    # parity tests fail if they import transformers after these stubs
    # are installed. Attach a real (loader-less) spec.
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _ensure_stubs():
    if "torchvision" not in sys.modules:
        # clip.py imports torchvision.transforms at module scope but only
        # uses it inside `_clip(return_transforms=True)`, which the parity
        # tests never call — an empty stub is sufficient.
        tv = _stub_module("torchvision")
        tvt = _stub_module("torchvision.transforms")
        tv.transforms = tvt
        sys.modules.update({"torchvision": tv,
                            "torchvision.transforms": tvt})
    if "diffusers" not in sys.modules:
        cu = _stub_module("diffusers.configuration_utils")

        class ConfigMixin:
            pass

        cu.ConfigMixin = ConfigMixin
        cu.register_to_config = lambda fn: fn
        mu = _stub_module("diffusers.models.modeling_utils")
        mu.ModelMixin = torch.nn.Module
        models = _stub_module("diffusers.models")
        models.modeling_utils = mu
        diff = _stub_module("diffusers")
        diff.configuration_utils = cu
        diff.models = models
        sys.modules.update({
            "diffusers": diff,
            "diffusers.configuration_utils": cu,
            "diffusers.models": models,
            "diffusers.models.modeling_utils": mu,
        })
    if "logger" not in sys.modules:
        lg = _stub_module("logger")
        lg.logger = logging.getLogger("refwan")
        sys.modules["logger"] = lg


def _load(name: str, filename: str):
    spec = importlib.util.spec_from_file_location(
        name, f"{REF_MODULES}/{filename}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Returns (attention, model, vae) reference modules, import-cached."""
    if f"{_PKG}.vae" in sys.modules:
        return (sys.modules[f"{_PKG}.attention"],
                sys.modules[f"{_PKG}.model"],
                sys.modules[f"{_PKG}.vae"])
    _ensure_stubs()
    pkg = types.ModuleType(_PKG)
    pkg.__path__ = [REF_MODULES]
    sys.modules[_PKG] = pkg
    attn = _load(f"{_PKG}.attention", "attention.py")
    # must happen before model.py executes `from .attention import ...`
    attn.flash_attention = flash_attention_fp32
    model = _load(f"{_PKG}.model", "model.py")
    vae = _load(f"{_PKG}.vae", "vae.py")
    return attn, model, vae


def load_reference_clip():
    """Returns the reference clip module (clip.py:328 `XLMRobertaCLIP`),
    with its `flash_attention` (used by the ViT blocks + AttentionPool)
    patched to the exact fp32 SDPA above."""
    if f"{_PKG}.clip" in sys.modules:
        return sys.modules[f"{_PKG}.clip"]
    load_reference()
    # the real tokenizers.py needs ftfy (absent); clip.py only references
    # HuggingfaceTokenizer inside `_clip(return_tokenizer=True)`
    tok = types.ModuleType(f"{_PKG}.tokenizers")
    tok.HuggingfaceTokenizer = object
    sys.modules[f"{_PKG}.tokenizers"] = tok
    _load(f"{_PKG}.xlm_roberta", "xlm_roberta.py")
    return _load(f"{_PKG}.clip", "clip.py")
