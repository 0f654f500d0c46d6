"""umT5 text encoder — TPU-native functional implementation.

Capability parity with reference wan/modules/t5.py (from-scratch umT5:
relative-position-bucket attention, GELU-gated FFN, encoder-only umt5-xxl:
vocab 256384, dim 4096, 24 layers, 64 heads, per-layer position embeddings
(shared_pos=False), t5.py:465-478).

Semantics notes vs the reference:
  - T5 attention has NO 1/sqrt(d) scaling (t5.py:115), softmax in fp32
    (t5.py:116), additive position bias + additive -inf padding mask.
  - The reference's `T5SelfAttention.forward` (t5.py:175-185) is visibly
    truncated ("Simplified; add remaining steps as needed"): it drops the
    FFN and applies the residual around the *normed* input. That breaks
    the umt5-xxl checkpoint it loads. We implement the CORRECT pre-norm
    block x += attn(norm1(x)); x += ffn(norm2(x)) — matching
    transformers' umT5 (the checkpoint's training-time graph) and the
    fp16_clamp guards of the intact decoder block (t5.py:219-224). The
    checkpoint's norm2/ffn weights exist in the reference module too, so
    weight conversion is complete either way.
  - Blocks are stacked + lax.scan'd like the DiT; each block carries its
    own relative-position embedding table (umT5), looked up from one
    shared static bucket matrix.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from omnihuman_tpu.configs.wan import T5Config
from omnihuman_tpu.ops.norms import rms_norm

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# relative position buckets (t5.py:256-275)


def relative_position_buckets(lq: int, lk: int, num_buckets: int,
                              max_dist: int,
                              bidirectional: bool = True) -> np.ndarray:
    """Static [Lq, Lk] int32 bucket matrix (host-side, baked as constant)."""
    rel_pos = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    if bidirectional:
        nb = num_buckets // 2
        rel_buckets = (rel_pos > 0).astype(np.int64) * nb
        rel_pos = np.abs(rel_pos)
    else:
        nb = num_buckets
        rel_buckets = np.zeros_like(rel_pos)
        rel_pos = -np.minimum(rel_pos, 0)

    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        rel_large = max_exact + (
            np.log(np.maximum(rel_pos, 1) / max_exact)
            / math.log(max_dist / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    rel_large = np.minimum(rel_large, nb - 1)
    rel_buckets = rel_buckets + np.where(rel_pos < max_exact, rel_pos,
                                         rel_large)
    return rel_buckets.astype(np.int32)


# ---------------------------------------------------------------------------
# init (reference init_weights, t5.py:27-43)


def init_t5_encoder(key: jax.Array, cfg: T5Config) -> Params:
    ks = jax.random.split(key, 3)
    d, da, dff, n = cfg.dim, cfg.dim_attn, cfg.dim_ffn, cfg.num_heads

    def block_init(k):
        kk = jax.random.split(k, 8)
        return {
            "norm1": {"w": jnp.ones((d,))},
            "q": jax.random.normal(kk[0], (d, da)) * (d * da) ** -0.5,
            "k": jax.random.normal(kk[1], (d, da)) * d ** -0.5,
            "v": jax.random.normal(kk[2], (d, da)) * d ** -0.5,
            "o": jax.random.normal(kk[3], (da, d)) * (n * da) ** -0.5,
            "pos_emb": jax.random.normal(kk[4], (cfg.num_buckets, n))
            * (2 * cfg.num_buckets * n) ** -0.5,
            "norm2": {"w": jnp.ones((d,))},
            "gate": jax.random.normal(kk[5], (d, dff)) * d ** -0.5,
            "fc1": jax.random.normal(kk[6], (d, dff)) * d ** -0.5,
            "fc2": jax.random.normal(kk[7], (dff, d)) * dff ** -0.5,
        }

    block_keys = jax.random.split(ks[0], cfg.num_layers)
    blocks = [block_init(k) for k in block_keys]
    return {
        "token_embedding": jax.random.normal(ks[1], (cfg.vocab_size, cfg.dim)),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"w": jnp.ones((cfg.dim,))},
    }


# ---------------------------------------------------------------------------
# forward


def _t5_gelu(x):
    """The reference's tanh-approx GELU (t5.py:46-50)."""
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


def _t5_attention(bp, x, mask_bias, buckets, cfg: T5Config, compute_dtype):
    """Unscaled T5 attention with additive position bias, softmax fp32."""
    b, l, _ = x.shape
    n = cfg.num_heads
    hd = cfg.dim_attn // n

    xc = x.astype(compute_dtype)
    q = (xc @ bp["q"].astype(compute_dtype)).reshape(b, l, n, hd)
    k = (xc @ bp["k"].astype(compute_dtype)).reshape(b, l, n, hd)
    v = (xc @ bp["v"].astype(compute_dtype)).reshape(b, l, n, hd)

    pos_bias = bp["pos_emb"][buckets]                   # [L, L, N]
    pos_bias = pos_bias.transpose(2, 0, 1)[None]        # [1, N, L, L] fp32

    logits = jnp.einsum("binc,bjnc->bnij", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits + pos_bias.astype(jnp.float32) + mask_bias
    attn = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
    y = jnp.einsum("bnij,bjnc->binc", attn, v,
                   preferred_element_type=jnp.float32)
    y = y.reshape(b, l, n * hd).astype(compute_dtype)
    return y @ bp["o"].astype(compute_dtype)


def t5_encode(
    params: Params,
    ids: jnp.ndarray,                 # [B, L] int32 token ids
    mask: Optional[jnp.ndarray],      # [B, L] 1=valid, 0=pad
    cfg: T5Config,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """[B, L] ids → [B, L, dim] embeddings (fp32).

    Equivalent of `T5Encoder.forward` + `T5EncoderModel.__call__`
    (t5.py:308-321, 518-529) — but returns the dense padded batch; callers
    use `mask`/seq_lens for downstream masking instead of per-sample
    trimmed lists.
    """
    b, l = ids.shape
    x = params["token_embedding"][ids].astype(jnp.float32)   # [B, L, dim]

    buckets = jnp.asarray(relative_position_buckets(
        l, l, cfg.num_buckets, cfg.max_dist, bidirectional=True))

    if mask is not None:
        mask_bias = jnp.where(mask[:, None, None, :] > 0, 0.0,
                              jnp.float32(-1e30))
    else:
        mask_bias = jnp.zeros((b, 1, 1, l), jnp.float32)

    def block(x, bp):
        h = rms_norm(x, bp["norm1"]["w"], eps=1e-6)
        x = x + _t5_attention(bp, h, mask_bias, buckets, cfg,
                              compute_dtype).astype(jnp.float32)
        h = rms_norm(x, bp["norm2"]["w"], eps=1e-6)
        hc = h.astype(compute_dtype)
        ff = (hc @ bp["fc1"].astype(compute_dtype)) * _t5_gelu(
            hc @ bp["gate"].astype(compute_dtype))
        ff = ff @ bp["fc2"].astype(compute_dtype)
        return x + ff.astype(jnp.float32), None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    x = rms_norm(x, params["norm"]["w"], eps=1e-6)
    if mask is not None:
        x = x * (mask[:, :, None] > 0)
    return x


def count_t5_params(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


class T5TextEncoder:
    """Tokenizer + umT5 parameter bundle with a prompt cache.

    The standalone equivalent of the reference's `T5EncoderModel`
    (t5.py:465-529: checkpoint load + tokenizer + encode) used by every
    consumer that needs text embeddings without a full generation
    pipeline (omni trainer/inference). Params come from a converted
    torch checkpoint (`models_t5_umt5-xxl-enc-bf16.pth` in ckpt_dir) or
    random init (smoke runs). Repeated prompts (video captions recur
    every epoch) hit a host-side cache instead of re-encoding.
    """

    def __init__(self, cfg: T5Config, text_len: int,
                 tokenizer_name: str = "google/umt5-xxl",
                 ckpt_dir: Optional[str] = None,
                 param_dtype: jnp.dtype = jnp.bfloat16,
                 seed: int = 0, cache_size: int = 4096):
        import os

        from omnihuman_tpu.models.tokenizers import HuggingfaceTokenizer

        self.cfg = cfg
        self.text_len = text_len
        self.tokenizer = HuggingfaceTokenizer(
            name=tokenizer_name, seq_len=text_len, clean="whitespace")
        cast = lambda t: jax.tree.map(lambda x: x.astype(param_dtype), t)
        t5_path = (os.path.join(ckpt_dir, "models_t5_umt5-xxl-enc-bf16.pth")
                   if ckpt_dir else None)
        if t5_path and os.path.exists(t5_path):
            from omnihuman_tpu.utils import convert
            self.params = cast(convert.convert_t5(
                convert.load_torch_state_dict(t5_path), cfg))
        else:
            self.params = jax.jit(lambda k: cast(init_t5_encoder(k, cfg)))(
                jax.random.key(seed))
        self._encode = jax.jit(
            lambda p, ids, mask: t5_encode(p, ids, mask, cfg))
        self._cache: Dict[str, np.ndarray] = {}
        self._cache_size = cache_size

    def __call__(self, prompts) -> jnp.ndarray:
        """[str, ...] → [B, text_len, dim] fp32 context."""
        return self.encode(prompts)[0]

    def encode(self, prompts):
        """[str, ...] → (context [B, text_len, dim] fp32, lens [B] int32
        true token counts — the reference's context_lens,
        model.py:530-531)."""
        missing = [p for p in dict.fromkeys(prompts)
                   if p not in self._cache]
        if missing:
            ids, mask = self.tokenizer(missing, return_mask=True)
            ctx = np.asarray(self._encode(self.params, jnp.asarray(ids),
                                          jnp.asarray(mask)), np.float32)
            lens = np.asarray(mask).sum(axis=1).astype(np.int32)
            for p, c, n in zip(missing, ctx, lens):
                self._cache[p] = (c, int(n))
            # evict oldest entries NOT needed by this batch (wholesale
            # clear() would drop same-batch prompts and KeyError below)
            if len(self._cache) > self._cache_size:
                keep = set(prompts)
                for p in [p for p in self._cache if p not in keep]:
                    del self._cache[p]
                    if len(self._cache) <= self._cache_size:
                        break
        ctx = jnp.asarray(np.stack([self._cache[p][0] for p in prompts]))
        lens = jnp.asarray([self._cache[p][1] for p in prompts],
                           jnp.int32)
        return ctx, lens
