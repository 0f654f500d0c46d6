"""PyTorch checkpoint → params-PyTree weight converters.

The reference loads diffusers-format DiT dirs (`WanModel.from_pretrained`,
text2video.py:86), raw `torch.save` state dicts for the VAE
(vae.py:611-614) and umT5 (t5.py:513), and EMA/student `.pt` files
(eval_ema.py, distilled_trainer.py:176-178). These converters map those
state-dict names onto our PyTrees. Input is a flat {name: numpy array}
dict — load with `load_torch_state_dict` (torch CPU) or safetensors.

Layout conventions converted here:
  torch Linear weight [out, in]      → ours [in, out]           (transpose)
  torch Conv3d weight [O,I,kt,kh,kw] → ours [kt,kh,kw,I,O]
  torch Conv2d weight [O,I,kh,kw]    → ours [kh,kw,I,O]
  patch_embedding Conv3d             → flattened GEMM weight
      [O, I*kt*kh*kw] → [I*kt*kh*kw, O]  (matches _patchify's (c,pt,ph,pw)
      patch-vector ordering, models/wan_dit.py)
  block params are stacked along a leading [num_layers] axis.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping

import jax.numpy as jnp
import numpy as np

from omnihuman_tpu.configs.wan import T5Config, VAEConfig, WanModelConfig
from omnihuman_tpu.models.vae import decoder_spec, encoder_spec

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Load a .pt/.pth/.safetensors file into numpy (host-side)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _lin(sd: StateDict, name: str, bias: bool = True) -> Dict[str, Any]:
    p = {"w": jnp.asarray(sd[f"{name}.weight"]).T}
    if bias:
        p["b"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _conv3d(sd: StateDict, name: str) -> Dict[str, Any]:
    w = np.asarray(sd[f"{name}.weight"])
    return {"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
            "b": jnp.asarray(sd[f"{name}.bias"])}


def _conv2d(sd: StateDict, name: str) -> Dict[str, Any]:
    w = np.asarray(sd[f"{name}.weight"])
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "b": jnp.asarray(sd[f"{name}.bias"])}


def _gamma(sd: StateDict, name: str) -> Dict[str, Any]:
    return {"gamma": jnp.asarray(np.asarray(sd[f"{name}.gamma"]).reshape(-1))}


# ---------------------------------------------------------------------------
# DiT


def convert_wan_dit(sd: StateDict, cfg: WanModelConfig) -> Dict[str, Any]:
    """WanModel state dict (reference model.py:377-489 module names)."""
    params: Dict[str, Any] = {}

    pe = np.asarray(sd["patch_embedding.weight"])        # [O, I, kt, kh, kw]
    params["patch_embedding"] = {
        "w": jnp.asarray(pe.reshape(pe.shape[0], -1).T),
        "b": jnp.asarray(sd["patch_embedding.bias"]),
    }
    params["text_fc1"] = _lin(sd, "text_embedding.0")
    params["text_fc2"] = _lin(sd, "text_embedding.2")
    params["time_fc1"] = _lin(sd, "time_embedding.0")
    params["time_fc2"] = _lin(sd, "time_embedding.2")
    params["time_proj"] = _lin(sd, "time_projection.1")
    params["head"] = {
        "w": jnp.asarray(np.asarray(sd["head.head.weight"]).T),
        "b": jnp.asarray(sd["head.head.bias"]),
        "modulation": jnp.asarray(np.asarray(sd["head.modulation"])[0]),
    }
    if "img_emb.proj.0.weight" in sd:
        params["img_emb"] = {
            "ln1": {"w": jnp.asarray(sd["img_emb.proj.0.weight"]),
                    "b": jnp.asarray(sd["img_emb.proj.0.bias"])},
            "fc1": _lin(sd, "img_emb.proj.1"),
            "fc2": _lin(sd, "img_emb.proj.3"),
            "ln2": {"w": jnp.asarray(sd["img_emb.proj.4.weight"]),
                    "b": jnp.asarray(sd["img_emb.proj.4.bias"])},
        }

    def attn(i: int, which: str, i2v: bool) -> Dict[str, Any]:
        base = f"blocks.{i}.{which}"
        p = {k: _lin(sd, f"{base}.{k}") for k in ("q", "k", "v", "o")}
        p["norm_q"] = {"w": jnp.asarray(sd[f"{base}.norm_q.weight"])}
        p["norm_k"] = {"w": jnp.asarray(sd[f"{base}.norm_k.weight"])}
        if i2v:
            p["k_img"] = _lin(sd, f"{base}.k_img")
            p["v_img"] = _lin(sd, f"{base}.v_img")
            p["norm_k_img"] = {
                "w": jnp.asarray(sd[f"{base}.norm_k_img.weight"])}
        return p

    blocks: List[Dict[str, Any]] = []
    for i in range(cfg.num_layers):
        bp = {
            "self_attn": attn(i, "self_attn", False),
            "cross_attn": attn(i, "cross_attn", cfg.model_type == "i2v"),
            "ffn_fc1": _lin(sd, f"blocks.{i}.ffn.0"),
            "ffn_fc2": _lin(sd, f"blocks.{i}.ffn.2"),
            "modulation": jnp.asarray(
                np.asarray(sd[f"blocks.{i}.modulation"])[0]),
        }
        if cfg.cross_attn_norm:
            bp["norm3"] = {"w": jnp.asarray(sd[f"blocks.{i}.norm3.weight"]),
                           "b": jnp.asarray(sd[f"blocks.{i}.norm3.bias"])}
        blocks.append(bp)
    import jax
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params


# ---------------------------------------------------------------------------
# VAE


def _vae_res(sd: StateDict, base: str, cin: int, cout: int) -> Dict[str, Any]:
    p = {
        "norm1": _gamma(sd, f"{base}.residual.0"),
        "conv1": _conv3d(sd, f"{base}.residual.2"),
        "norm2": _gamma(sd, f"{base}.residual.3"),
        "conv2": _conv3d(sd, f"{base}.residual.6"),
    }
    if cin != cout:
        p["shortcut"] = _conv3d(sd, f"{base}.shortcut")
    return p


def _vae_attn(sd: StateDict, base: str) -> Dict[str, Any]:
    return {
        "norm": _gamma(sd, f"{base}.norm"),
        "to_qkv": _conv2d(sd, f"{base}.to_qkv"),
        "proj": _conv2d(sd, f"{base}.proj"),
    }


def _vae_resample(sd: StateDict, base: str, mode: str) -> Dict[str, Any]:
    p = {"conv": _conv2d(sd, f"{base}.resample.1")}
    if mode in ("upsample3d", "downsample3d"):
        p["time_conv"] = _conv3d(sd, f"{base}.time_conv")
    return p


def _vae_stack(sd: StateDict, prefix: str, spec, mid_start: int):
    """Map one spec list onto torch's conv1/downsamples/middle/head names."""
    out = []
    seq_idx = 0
    for si, item in enumerate(spec):
        kind = item[0]
        if kind == "conv_in":
            out.append({"conv": _conv3d(sd, f"{prefix}.conv1")})
        elif kind == "head":
            out.append({"norm": _gamma(sd, f"{prefix}.head.0"),
                        "conv": _conv3d(sd, f"{prefix}.head.2")})
        elif si >= mid_start:  # middle blocks: res, attn, res
            mi = si - mid_start
            base = f"{prefix}.middle.{mi}"
            if kind == "res":
                out.append(_vae_res(sd, base, item[1], item[2]))
            else:
                out.append(_vae_attn(sd, base))
        else:
            base = f"{prefix}.{'downsamples' if prefix.endswith('encoder') else 'upsamples'}.{seq_idx}"
            if kind == "res":
                out.append(_vae_res(sd, base, item[1], item[2]))
            elif kind == "attn":
                out.append(_vae_attn(sd, base))
            elif kind == "resample":
                out.append(_vae_resample(sd, base, item[2]))
            seq_idx += 1
    return out


def convert_vae(sd: StateDict, cfg: VAEConfig) -> Dict[str, Any]:
    """WanVAE_ state dict (reference vae.py:483-506 module names)."""
    es = encoder_spec(cfg)
    ds = decoder_spec(cfg)
    # encoder spec: [conv_in, <downsamples...>, res, attn, res, head]
    enc_mid = len(es) - 4
    # decoder spec: [conv_in, res, attn, res, <upsamples...>, head]
    # torch decoder: conv1, middle.{0,1,2}, upsamples.{...}, head
    out_e = _vae_stack(sd, "encoder", es, enc_mid)

    out_d = []
    for si, item in enumerate(ds):
        kind = item[0]
        if kind == "conv_in":
            out_d.append({"conv": _conv3d(sd, "decoder.conv1")})
        elif si in (1, 2, 3):  # middle res/attn/res
            base = f"decoder.middle.{si - 1}"
            out_d.append(_vae_res(sd, base, item[1], item[2])
                         if kind == "res" else _vae_attn(sd, base))
        elif kind == "head":
            out_d.append({"norm": _gamma(sd, "decoder.head.0"),
                          "conv": _conv3d(sd, "decoder.head.2")})
        else:
            idx = si - 4
            base = f"decoder.upsamples.{idx}"
            if kind == "res":
                out_d.append(_vae_res(sd, base, item[1], item[2]))
            elif kind == "attn":
                out_d.append(_vae_attn(sd, base))
            elif kind == "resample":
                out_d.append(_vae_resample(sd, base, item[2]))

    return {
        "encoder": out_e,
        "decoder": out_d,
        "conv1": _conv3d(sd, "conv1"),
        "conv2": _conv3d(sd, "conv2"),
    }


# ---------------------------------------------------------------------------
# umT5


def convert_t5(sd: StateDict, cfg: T5Config) -> Dict[str, Any]:
    """T5Encoder state dict (reference t5.py:277-306 module names)."""
    import jax

    def block(i: int) -> Dict[str, Any]:
        b = f"blocks.{i}"
        return {
            "norm1": {"w": jnp.asarray(sd[f"{b}.norm1.weight"])},
            "q": jnp.asarray(np.asarray(sd[f"{b}.attn.q.weight"]).T),
            "k": jnp.asarray(np.asarray(sd[f"{b}.attn.k.weight"]).T),
            "v": jnp.asarray(np.asarray(sd[f"{b}.attn.v.weight"]).T),
            "o": jnp.asarray(np.asarray(sd[f"{b}.attn.o.weight"]).T),
            "pos_emb": jnp.asarray(sd[f"{b}.pos_embedding.embedding.weight"]),
            "norm2": {"w": jnp.asarray(sd[f"{b}.norm2.weight"])},
            "gate": jnp.asarray(np.asarray(sd[f"{b}.ffn.gate.0.weight"]).T),
            "fc1": jnp.asarray(np.asarray(sd[f"{b}.ffn.fc1.weight"]).T),
            "fc2": jnp.asarray(np.asarray(sd[f"{b}.ffn.fc2.weight"]).T),
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"w": jnp.asarray(sd["norm.weight"])},
    }


def convert_t5_hf(sd: StateDict, cfg: T5Config) -> Dict[str, Any]:
    """HuggingFace `UMT5EncoderModel` state dict → our T5 PyTree.

    umT5 is the checkpoint family the reference targets (t5.py:465-478);
    HF-format exports use `encoder.block.{i}.layer.{0,1}` naming with the
    gated FFN split as wi_0 (gate) / wi_1 (linear). Our corrected encoder
    block (models/t5.py — the reference's own block is truncated,
    t5.py:175-185) is exactly the HF graph, so this mapping is lossless.
    """
    import jax

    def block(i: int) -> Dict[str, Any]:
        a = f"encoder.block.{i}.layer.0"
        f = f"encoder.block.{i}.layer.1"
        return {
            "norm1": {"w": jnp.asarray(sd[f"{a}.layer_norm.weight"])},
            "q": jnp.asarray(np.asarray(sd[f"{a}.SelfAttention.q.weight"]).T),
            "k": jnp.asarray(np.asarray(sd[f"{a}.SelfAttention.k.weight"]).T),
            "v": jnp.asarray(np.asarray(sd[f"{a}.SelfAttention.v.weight"]).T),
            "o": jnp.asarray(np.asarray(sd[f"{a}.SelfAttention.o.weight"]).T),
            "pos_emb": jnp.asarray(
                sd[f"{a}.SelfAttention.relative_attention_bias.weight"]),
            "norm2": {"w": jnp.asarray(sd[f"{f}.layer_norm.weight"])},
            "gate": jnp.asarray(
                np.asarray(sd[f"{f}.DenseReluDense.wi_0.weight"]).T),
            "fc1": jnp.asarray(
                np.asarray(sd[f"{f}.DenseReluDense.wi_1.weight"]).T),
            "fc2": jnp.asarray(
                np.asarray(sd[f"{f}.DenseReluDense.wo.weight"]).T),
        }

    tok = sd.get("shared.weight", sd.get("encoder.embed_tokens.weight"))
    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "token_embedding": jnp.asarray(tok),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"w": jnp.asarray(sd["encoder.final_layer_norm.weight"])},
    }


# ---------------------------------------------------------------------------
# CLIP (XLM-RoBERTa ViT-H/14)


def convert_clip(sd: StateDict, cfg) -> Dict[str, Any]:
    """XLMRobertaCLIP state dict (reference clip.py:328-499 +
    xlm_roberta.py:76-144 module names). The XLM-R per-block q/k/v linears
    are fused into our qkv layout; vision to_qkv is already fused."""
    import jax

    def vit_block(i):
        b = f"visual.transformer.{i}"
        return {
            "norm1": {"w": jnp.asarray(sd[f"{b}.norm1.weight"]),
                      "b": jnp.asarray(sd[f"{b}.norm1.bias"])},
            "qkv": _lin(sd, f"{b}.attn.to_qkv"),
            "proj": _lin(sd, f"{b}.attn.proj"),
            "norm2": {"w": jnp.asarray(sd[f"{b}.norm2.weight"]),
                      "b": jnp.asarray(sd[f"{b}.norm2.bias"])},
            "fc1": _lin(sd, f"{b}.mlp.0"),
            "fc2": _lin(sd, f"{b}.mlp.2"),
        }

    pe = np.asarray(sd["visual.patch_embedding.weight"])  # [O, 3, p, p]
    visual = {
        "patch_embedding": {"w": jnp.asarray(pe.reshape(pe.shape[0], -1).T)},
        "cls_embedding": jnp.asarray(sd["visual.cls_embedding"]),
        "pos_embedding": jnp.asarray(sd["visual.pos_embedding"]),
        "pre_norm": {"w": jnp.asarray(sd["visual.pre_norm.weight"]),
                     "b": jnp.asarray(sd["visual.pre_norm.bias"])},
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[vit_block(i) for i in range(cfg.vision_layers)]),
        "post_norm": {"w": jnp.asarray(sd["visual.post_norm.weight"]),
                      "b": jnp.asarray(sd["visual.post_norm.bias"])},
        "head": jnp.asarray(sd["visual.head"]),
    }

    def xlm_block(i):
        b = f"textual.blocks.{i}"
        qw = np.asarray(sd[f"{b}.attn.q.weight"])
        kw = np.asarray(sd[f"{b}.attn.k.weight"])
        vw = np.asarray(sd[f"{b}.attn.v.weight"])
        qb = np.asarray(sd[f"{b}.attn.q.bias"])
        kb = np.asarray(sd[f"{b}.attn.k.bias"])
        vb = np.asarray(sd[f"{b}.attn.v.bias"])
        return {
            "norm1": {"w": jnp.asarray(sd[f"{b}.norm1.weight"]),
                      "b": jnp.asarray(sd[f"{b}.norm1.bias"])},
            "qkv": {"w": jnp.asarray(
                        np.concatenate([qw.T, kw.T, vw.T], axis=1)),
                    "b": jnp.asarray(np.concatenate([qb, kb, vb]))},
            "proj": _lin(sd, f"{b}.attn.o"),
            "norm2": {"w": jnp.asarray(sd[f"{b}.norm2.weight"]),
                      "b": jnp.asarray(sd[f"{b}.norm2.bias"])},
            "fc1": _lin(sd, f"{b}.ffn.0"),
            "fc2": _lin(sd, f"{b}.ffn.2"),
        }

    textual = {
        "token_embedding": jnp.asarray(sd["textual.token_embedding.weight"]),
        "type_embedding": jnp.asarray(sd["textual.type_embedding.weight"]),
        "pos_embedding": jnp.asarray(sd["textual.pos_embedding.weight"]),
        "norm": {"w": jnp.asarray(sd["textual.norm.weight"]),
                 "b": jnp.asarray(sd["textual.norm.bias"])},
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[xlm_block(i) for i in range(cfg.text_layers)]),
        "head_fc1": {"w": jnp.asarray(
            np.asarray(sd["textual.head.0.weight"]).T)},
        "head_fc2": {"w": jnp.asarray(
            np.asarray(sd["textual.head.2.weight"]).T)},
    }
    out = {"visual": visual, "textual": textual}
    if "log_scale" in sd:
        out["log_scale"] = jnp.asarray(sd["log_scale"])
    return out


def load_wan_checkpoint_dir(ckpt_dir: str, model_cfg: WanModelConfig,
                            vae_cfg: "VAEConfig" = None, vae_seed: int = 1):
    """Load a Wan checkpoint directory using the reference layout
    (text2video.py:118-135 convention, shared by the generate / omni
    train / omni inference CLIs):

      *.safetensors shards   → convert_wan_dit  (None if absent)
      Wan2.1_VAE.pth         → convert_vae (random-init fallback when
                               vae_cfg given and the file is missing)

    Returns (dit_params | None, vae_params | None).
    """
    import os

    dit_sd: StateDict = {}
    for fn in sorted(os.listdir(ckpt_dir)):
        if fn.endswith(".safetensors"):
            dit_sd.update(load_torch_state_dict(
                os.path.join(ckpt_dir, fn)))
    dit_params = convert_wan_dit(dit_sd, model_cfg) if dit_sd else None

    vae_params = None
    if vae_cfg is not None:
        vae_path = os.path.join(ckpt_dir, "Wan2.1_VAE.pth")
        if os.path.exists(vae_path):
            vae_params = convert_vae(load_torch_state_dict(vae_path),
                                     vae_cfg)
        else:
            from omnihuman_tpu.models.vae import init_vae
            vae_params = init_vae(jax.random.key(vae_seed), vae_cfg)
    return dit_params, vae_params
