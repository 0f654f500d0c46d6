"""XLM-RoBERTa-CLIP (ViT-H/14) — image encoder for the i2v pipeline.

Capability parity with reference wan/modules/clip.py:60-542 +
xlm_roberta.py:76-170:
  - VisionTransformer: conv patch-embed (no bias, pre-norm variant),
    cls token + learned positional embedding, pre-norm blocks with GELU
    MLP, `use_31_block` truncation (skip the last block, return all 257
    tokens — clip.py:295-297) feeding WanModel's img_emb MLPProj.
  - AttentionPool / token-head paths for the full CLIP embedding.
  - XLM-RoBERTa text tower (post-norm blocks, padded-position embedding
    via cumsum trick, mean-pool + 2-layer head — xlm_roberta.py:119-170).
  - CLIPModel.visual preprocessing: bicubic resize to 224, CLIP
    normalisation (clip.py:527-542).

Functional params PyTree, blocks stacked + scanned like the other models.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omnihuman_tpu.configs.wan import CLIPConfig
from omnihuman_tpu.ops.attention import flash_attention
from omnihuman_tpu.ops.norms import layer_norm

Params = Dict[str, Any]

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


# ---------------------------------------------------------------------------
# init


def _lin(key, din, dout, bias=True, gain=None):
    kw, _ = jax.random.split(key)
    g = gain if gain is not None else 1.0 / math.sqrt(din)
    p = {"w": jax.random.normal(kw, (din, dout)) * g}
    if bias:
        p["b"] = jnp.zeros((dout,))
    return p


def _ln(dim):
    return {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def _vit_block_init(key, dim, mlp_ratio):
    ks = jax.random.split(key, 4)
    return {
        "norm1": _ln(dim),
        "qkv": _lin(ks[0], dim, dim * 3),
        "proj": _lin(ks[1], dim, dim),
        "norm2": _ln(dim),
        "fc1": _lin(ks[2], dim, int(dim * mlp_ratio)),
        "fc2": _lin(ks[3], int(dim * mlp_ratio), dim),
    }


def init_clip_vision(key: jax.Array, cfg: CLIPConfig) -> Params:
    ks = jax.random.split(key, 6)
    dim = cfg.vision_dim
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    gain = 1.0 / math.sqrt(dim)
    block_keys = jax.random.split(ks[0], cfg.vision_layers)
    blocks = [_vit_block_init(k, dim, cfg.vision_mlp_ratio)
              for k in block_keys]
    return {
        # Conv2d stride==kernel == GEMM over flattened patches (pre-norm
        # variant has no bias, clip.py:247-252)
        "patch_embedding": {
            "w": jax.random.normal(
                ks[1], (cfg.patch_size * cfg.patch_size * 3, dim)) * gain},
        "cls_embedding": jax.random.normal(ks[2], (1, 1, dim)) * gain,
        "pos_embedding": jax.random.normal(
            ks[3], (1, n_patches + 1, dim)) * gain,
        "pre_norm": _ln(dim),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "post_norm": _ln(dim),
        "head": jax.random.normal(ks[4], (dim, cfg.embed_dim)) * gain,
    }


def init_xlm_roberta(key: jax.Array, cfg: CLIPConfig) -> Params:
    ks = jax.random.split(key, 6)
    dim = cfg.text_dim
    block_keys = jax.random.split(ks[0], cfg.text_layers)

    def block_init(k):
        kk = jax.random.split(k, 4)
        return {
            "norm1": _ln(dim),
            "qkv": _lin(kk[0], dim, dim * 3),
            "proj": _lin(kk[1], dim, dim),
            "norm2": _ln(dim),
            "fc1": _lin(kk[2], dim, dim * 4),
            "fc2": _lin(kk[3], dim * 4, dim),
        }

    blocks = [block_init(k) for k in block_keys]
    mid = (dim + cfg.embed_dim) // 2
    return {
        "token_embedding": jax.random.normal(
            ks[1], (cfg.vocab_size, dim)) * 0.02,
        "type_embedding": jax.random.normal(ks[2], (cfg.type_size, dim))
        * 0.02,
        "pos_embedding": jax.random.normal(
            ks[3], (cfg.max_text_len, dim)) * 0.02,
        "norm": _ln(dim),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "head_fc1": _lin(ks[4], dim, mid, bias=False),
        "head_fc2": _lin(ks[5], mid, cfg.embed_dim, bias=False),
    }


def init_clip(key: jax.Array, cfg: CLIPConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "visual": init_clip_vision(k1, cfg),
        "textual": init_xlm_roberta(k2, cfg),
        "log_scale": jnp.asarray(math.log(1.0 / 0.07)),
    }


# ---------------------------------------------------------------------------
# forward


def _mha(p, x, mask_bias=None, num_heads=16, compute_dtype=jnp.float32):
    """Fused-QKV multi-head self-attention (clip.py:56-91)."""
    b, s, c = x.shape
    d = c // num_heads
    xc = x.astype(compute_dtype)
    qkv = xc @ p["qkv"]["w"].astype(compute_dtype) + p["qkv"]["b"].astype(
        compute_dtype)
    q, k, v = jnp.split(qkv.reshape(b, s, 3, num_heads, d), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
    if mask_bias is None:
        y = flash_attention(q, k, v, dtype=compute_dtype)
    else:
        # additive padding mask (xlm_roberta.py:135-139) — dense path
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (d ** -0.5) + mask_bias
        attn = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
        y = jnp.einsum("bnqk,bknd->bqnd", attn, v)
    y = y.reshape(b, s, c)
    return y @ p["proj"]["w"].astype(compute_dtype) + p["proj"]["b"].astype(
        compute_dtype)


def clip_visual_forward(params: Params, images: jnp.ndarray,
                        cfg: CLIPConfig, use_31_block: Optional[bool] = None,
                        compute_dtype=jnp.float32) -> jnp.ndarray:
    """[B, 3, 224, 224] (CLIP-normalized) → [B, 257, vision_dim] tokens
    (use_31_block) or pooled [B, embed_dim]."""
    vp = params["visual"] if "visual" in params else params
    if use_31_block is None:
        use_31_block = cfg.use_31_block
    b = images.shape[0]
    p = cfg.patch_size
    # patchify: [B, 3, H, W] → [B, L, 3*p*p] ordered (c, ph, pw) to match
    # the flattened torch Conv2d kernel
    x = images.reshape(b, 3, cfg.image_size // p, p, cfg.image_size // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
        b, (cfg.image_size // p) ** 2, 3 * p * p)
    x = x.astype(compute_dtype) @ vp["patch_embedding"]["w"].astype(
        compute_dtype)

    cls = jnp.broadcast_to(vp["cls_embedding"], (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + vp["pos_embedding"].astype(x.dtype)
    x = layer_norm(x, vp["pre_norm"]["w"], vp["pre_norm"]["b"], eps=1e-5)

    n_blocks = cfg.vision_layers - 1 if use_31_block else cfg.vision_layers

    def block(x, bp):
        h = layer_norm(x, bp["norm1"]["w"], bp["norm1"]["b"], eps=1e-5)
        x = x + _mha(bp, h, num_heads=cfg.vision_heads,
                     compute_dtype=compute_dtype)
        h = layer_norm(x, bp["norm2"]["w"], bp["norm2"]["b"], eps=1e-5)
        h = h.astype(compute_dtype) @ bp["fc1"]["w"].astype(compute_dtype) \
            + bp["fc1"]["b"].astype(compute_dtype)
        h = jax.nn.gelu(h, approximate=False)   # clip config: 'gelu'
        h = h @ bp["fc2"]["w"].astype(compute_dtype) + bp["fc2"]["b"].astype(
            compute_dtype)
        return x + h, None

    trunk = jax.tree.map(lambda a: a[:n_blocks], vp["blocks"])
    x, _ = jax.lax.scan(block, x, trunk)

    if use_31_block:
        return x                                     # [B, 257, vision_dim]
    x = layer_norm(x, vp["post_norm"]["w"], vp["post_norm"]["b"], eps=1e-5)
    return x[:, 0] @ vp["head"]                      # token pool


def clip_textual_forward(params: Params, ids: jnp.ndarray,
                         cfg: CLIPConfig,
                         compute_dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] ids → [B, embed_dim] (XLMRobertaWithHead, clip.py:303-326)."""
    tp = params["textual"] if "textual" in params else params
    b, s = ids.shape
    mask = (ids != cfg.pad_id).astype(jnp.int32)
    pos_ids = cfg.pad_id + jnp.cumsum(mask, axis=1) * mask
    x = (tp["token_embedding"][ids]
         + tp["type_embedding"][jnp.zeros_like(ids)]
         + tp["pos_embedding"][pos_ids]).astype(jnp.float32)
    # post_norm=True: embedding norm first (xlm_roberta.py:128-131)
    x = layer_norm(x, tp["norm"]["w"], tp["norm"]["b"], eps=1e-5)
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, jnp.float32(-1e30))

    def block(x, bp):
        # post-norm residual blocks (xlm_roberta.py AttentionBlock)
        h = _mha(bp, x, mask_bias=bias, num_heads=cfg.text_heads,
                 compute_dtype=compute_dtype)
        x = layer_norm(x + h, bp["norm1"]["w"], bp["norm1"]["b"], eps=1e-5)
        h = x.astype(compute_dtype) @ bp["fc1"]["w"].astype(compute_dtype) \
            + bp["fc1"]["b"].astype(compute_dtype)
        h = jax.nn.gelu(h, approximate=False)
        h = h @ bp["fc2"]["w"].astype(compute_dtype) + bp["fc2"]["b"].astype(
            compute_dtype)
        x = layer_norm(x + h, bp["norm2"]["w"], bp["norm2"]["b"], eps=1e-5)
        return x, None

    x, _ = jax.lax.scan(block, x, tp["blocks"])
    # mean pool over valid tokens + projection head
    m = mask[:, :, None].astype(jnp.float32)
    pooled = (x * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
    h = pooled @ tp["head_fc1"]["w"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ tp["head_fc2"]["w"]


# ---------------------------------------------------------------------------
# high-level wrapper (CLIPModel equivalent, clip.py:501-542)


def preprocess_images(images: np.ndarray, image_size: int = 224
                      ) -> jnp.ndarray:
    """[B, 3, H, W] in [-1, 1] → CLIP-normalized [B, 3, 224, 224]
    (bicubic resize like clip.py:529-537)."""
    import jax.image
    x = jnp.asarray(images, jnp.float32)
    x = jax.image.resize(x, (x.shape[0], 3, image_size, image_size),
                         method="bicubic")
    x = x * 0.5 + 0.5
    mean = jnp.asarray(CLIP_MEAN)[None, :, None, None]
    std = jnp.asarray(CLIP_STD)[None, :, None, None]
    return (x - mean) / std


class CLIPModel:
    """visual() front-end for the i2v pipeline."""

    def __init__(self, cfg: CLIPConfig, params: Optional[Params] = None,
                 init_seed: int = 0):
        self.cfg = cfg
        self.params = (params if params is not None
                       else init_clip(jax.random.key(init_seed), cfg))

    def visual(self, videos: jnp.ndarray) -> jnp.ndarray:
        """[B, 3, H, W] first frames in [-1, 1] → [B, 257, 1280]."""
        x = preprocess_images(videos, self.cfg.image_size)
        return clip_visual_forward(self.params, x, self.cfg,
                                   use_31_block=True)
