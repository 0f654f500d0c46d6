"""Qwen2/2.5 causal decoder — TPU-native functional implementation.

Weights-day enabler for the LOCAL LLM prompt expander the reference runs
(wan/utils/prompt_extend.py:300-543, QwenPromptExpander over
Qwen2.5-3B/7B/14B-Instruct): the same convert-from-torch strategy as
wav2vec/I3D/Inception, so dropping released Qwen weights in makes
`utils.prompt_extend.QwenPromptExpander` produce real LLM expansions
instead of the deterministic template fallback.

Architecture (Qwen2 family): pre-RMSNorm blocks, rotary (rotate-half)
position embeddings, grouped-query attention with q/k/v bias and
bias-free o_proj, SwiGLU MLP, final RMSNorm, optionally weight-tied LM
head (3B-and-under checkpoints tie; 7B+ don't).

TPU notes: blocks are stacked on a leading layer axis and lax.scan'd
(one compiled block regardless of depth); generation is a single jitted
program — one prefill at the static padded prompt length, then a
lax.scan over decode steps against a preallocated static-shape KV cache
(no per-token retrace, no dynamic shapes). Prompt-expansion sequences
are short (<=1k tokens), so attention is plain XLA dense-causal — the
MXU-bound flash kernel only pays off at video-token lengths.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omnihuman_tpu.ops.norms import rms_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class QwenConfig:
    """Qwen2/2.5 decoder hyperparameters (HF Qwen2Config names)."""

    vocab_size: int = 151936
    dim: int = 2048                      # hidden_size
    ffn_dim: int = 11008                 # intermediate_size
    num_layers: int = 36
    num_heads: int = 16
    num_kv_heads: int = 2
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    tie_embeddings: bool = True

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


# Qwen2.5-Instruct released sizes (config.json values)
QWEN_CONFIGS = {
    "qwen2.5-0.5b": QwenConfig(dim=896, ffn_dim=4864, num_layers=24,
                               num_heads=14, num_kv_heads=2),
    "qwen2.5-1.5b": QwenConfig(dim=1536, ffn_dim=8960, num_layers=28,
                               num_heads=12, num_kv_heads=2),
    "qwen2.5-3b": QwenConfig(dim=2048, ffn_dim=11008, num_layers=36,
                             num_heads=16, num_kv_heads=2),
    "qwen2.5-7b": QwenConfig(dim=3584, ffn_dim=18944, num_layers=28,
                             num_heads=28, num_kv_heads=4,
                             tie_embeddings=False),
    "qwen2.5-14b": QwenConfig(dim=5120, ffn_dim=13824, num_layers=48,
                              num_heads=40, num_kv_heads=8,
                              tie_embeddings=False),
}


# ---------------------------------------------------------------------------
# init


def _lin(key, din, dout, bias=True):
    p = {"w": jax.random.normal(key, (din, dout), jnp.float32)
         * (din ** -0.5)}
    if bias:
        p["b"] = jnp.zeros((dout,), jnp.float32)
    return p


def init_qwen(key: jax.Array, cfg: QwenConfig) -> Params:
    ke, kb, kh = jax.random.split(key, 3)
    d, hd = cfg.dim, cfg.head_dim
    kv_d = cfg.num_kv_heads * hd

    def block(k):
        kk = jax.random.split(k, 7)
        return {
            "ln1": jnp.ones((d,), jnp.float32),
            "q": _lin(kk[0], d, d),
            "k": _lin(kk[1], d, kv_d),
            "v": _lin(kk[2], d, kv_d),
            "o": _lin(kk[3], d, d, bias=False),
            "ln2": jnp.ones((d,), jnp.float32),
            "gate": _lin(kk[4], d, cfg.ffn_dim, bias=False),
            "up": _lin(kk[5], d, cfg.ffn_dim, bias=False),
            "down": _lin(kk[6], cfg.ffn_dim, d, bias=False),
        }

    blocks = jax.vmap(block)(jax.random.split(kb, cfg.num_layers))
    params = {
        "embed": jax.random.normal(ke, (cfg.vocab_size, d), jnp.float32)
        * 0.02,
        "norm": jnp.ones((d,), jnp.float32),
        "blocks": blocks,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = _lin(kh, d, cfg.vocab_size, bias=False)
    return params


# ---------------------------------------------------------------------------
# forward


def _rope(x: jnp.ndarray, positions: jnp.ndarray,
          theta: float) -> jnp.ndarray:
    """Rotate-half rotary embedding. x: [B, L, N, hd]; positions: [B, L]."""
    hd = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    ang = positions[..., None].astype(jnp.float32) * inv      # [B, L, hd/2]
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x2 * cos + x1 * sin], -1).astype(x.dtype)


def _attend(q, k, v, mask):
    """q [B,Lq,N,hd]; k/v [B,Lk,Nkv,hd]; mask [B,Lq,Lk] bool → [B,Lq,N*hd]."""
    b, lq, n, hd = q.shape
    nkv = k.shape[2]
    k = jnp.repeat(k, n // nkv, axis=2)
    v = jnp.repeat(v, n // nkv, axis=2)
    s = jnp.einsum("bqnd,bknd->bnqk", q, k,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    s = jnp.where(mask[:, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", p, v).reshape(b, lq, n * hd)


def _block(bp: Params, x, positions, mask, cfg: QwenConfig,
           kv_hook=None):
    """One decoder block. kv_hook(k, v) -> (k_attend, v_attend) lets the
    decode step scatter this call's K/V into its cache and attend against
    the full cache; returns (x, whatever the hook returned)."""
    b, l, d = x.shape
    n, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    h = rms_norm(x, bp["ln1"], eps=cfg.rms_eps)
    q = (h @ bp["q"]["w"] + bp["q"]["b"]).reshape(b, l, n, hd)
    k = (h @ bp["k"]["w"] + bp["k"]["b"]).reshape(b, l, nkv, hd)
    v = (h @ bp["v"]["w"] + bp["v"]["b"]).reshape(b, l, nkv, hd)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)
    ka, va = (k, v) if kv_hook is None else kv_hook(k, v)
    att = _attend(q, ka.astype(q.dtype), va.astype(q.dtype), mask)
    x = x + att @ bp["o"]["w"]
    h = rms_norm(x, bp["ln2"], eps=cfg.rms_eps)
    ff = (jax.nn.silu(h @ bp["gate"]["w"]) * (h @ bp["up"]["w"])
          ) @ bp["down"]["w"]
    return x + ff, (ka, va)


def _logits(params: Params, x, cfg: QwenConfig):
    h = rms_norm(x, params["norm"], eps=cfg.rms_eps)
    if cfg.tie_embeddings:
        return h @ params["embed"].T
    return h @ params["lm_head"]["w"]


def qwen_forward(params: Params, tokens: jnp.ndarray, cfg: QwenConfig,
                 seq_lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full causal forward. tokens [B, L] int32 → logits [B, L, V] fp32.

    seq_lens (optional, [B]): valid lengths for left-padded-free batches;
    keys past a row's length are masked out (positions stay 0..L-1)."""
    b, l = tokens.shape
    x = params["embed"][tokens]
    positions = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
    mask = jnp.tril(jnp.ones((l, l), bool))[None]
    if seq_lens is not None:
        mask = mask & (jnp.arange(l)[None, None, :]
                       < seq_lens[:, None, None])

    def body(x, bp):
        x, _ = _block(bp, x, positions, mask, cfg)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _logits(params, x, cfg).astype(jnp.float32)


# ---------------------------------------------------------------------------
# generation (single jitted program: prefill + lax.scan decode)


def qwen_generate(params: Params, prompt: jnp.ndarray,
                  prompt_lens: jnp.ndarray, cfg: QwenConfig,
                  max_new_tokens: int, temperature: float = 0.0,
                  key: Optional[jax.Array] = None,
                  eos_id: int = -1) -> jnp.ndarray:
    """Greedy (temperature=0) or sampled generation.

    prompt: [B, L0] right-padded int32; prompt_lens: [B] valid lengths.
    Returns [B, max_new_tokens] — tokens generated after each row's
    prompt; positions past EOS are filled with eos_id when eos_id >= 0.
    Static shapes throughout: one prefill at L0 plus a lax.scan of
    single-token decode steps over a [B, L0+T] KV cache.
    """
    b, l0 = prompt.shape
    t_max = max_new_tokens
    m = l0 + t_max
    n_layers = cfg.num_layers
    nkv, hd = cfg.num_kv_heads, cfg.head_dim
    if key is None:
        key = jax.random.key(0)

    # ---- prefill: full causal forward, collecting per-layer KV ----------
    x = params["embed"][prompt]
    positions = jnp.broadcast_to(jnp.arange(l0)[None], (b, l0))
    mask = (jnp.tril(jnp.ones((l0, l0), bool))[None]
            & (jnp.arange(l0)[None, None, :]
               < prompt_lens[:, None, None]))
    kc0 = jnp.zeros((n_layers, b, m, nkv, hd), x.dtype)
    vc0 = jnp.zeros_like(kc0)

    # run blocks once to get hidden states AND per-layer prefill K/V: the
    # scan carries x; ys collect each layer's [B, L0] K/V for the cache
    def pre_body(x, bp):
        return _block(bp, x, positions, mask, cfg)

    x, (k_pre, v_pre) = jax.lax.scan(pre_body, x, params["blocks"])
    # zero the K/V of padded prompt slots: generated tokens are scatter-
    # ADDED into those very slots (row-ragged), and the decode mask
    # (slot <= pos) would otherwise attend pad garbage
    valid = (jnp.arange(l0)[None, :]
             < prompt_lens[:, None])[None, :, :, None, None]
    k_pre = jnp.where(valid, k_pre, 0.0)
    v_pre = jnp.where(valid, v_pre, 0.0)
    kc0 = jax.lax.dynamic_update_slice(kc0, k_pre, (0, 0, 0, 0, 0))
    vc0 = jax.lax.dynamic_update_slice(vc0, v_pre, (0, 0, 0, 0, 0))

    # last VALID prompt token's logits seed the first generated token
    last = jnp.take_along_axis(
        x, (prompt_lens - 1)[:, None, None].astype(jnp.int32), axis=1)
    logits0 = _logits(params, last, cfg)[:, 0].astype(jnp.float32)

    def pick(logits, k):
        if temperature > 0.0:
            return jax.random.categorical(k, logits / temperature, axis=-1)
        return jnp.argmax(logits, axis=-1)

    key, k0 = jax.random.split(key)
    tok0 = pick(logits0, k0).astype(jnp.int32)
    done0 = (tok0 == eos_id) if eos_id >= 0 else jnp.zeros((b,), bool)

    # ---- decode steps: one token per step against the static cache ------
    def step(carry, i):
        tok, done, kc, vc, key = carry
        pos = prompt_lens + i                       # [B] write positions
        x = params["embed"][tok][:, None]           # [B, 1, D]
        # attend against cache slots < pos+1 (ragged rows handled by mask)
        kmask = (jnp.arange(m)[None, None, :]
                 <= pos[:, None, None])              # [B, 1, M]

        # per-row cache write position differs (ragged prompts): scatter
        # this step's K/V into the cache via one-hot add, attend the cache
        hot = (jnp.arange(m)[None, :] == pos[:, None])  # [B, M]

        def block_ragged(x, layer):
            bp, kc_l, vc_l = layer

            def write(k, v):
                return (kc_l + hot[:, :, None, None] * k,
                        vc_l + hot[:, :, None, None] * v)

            return _block(bp, x, pos[:, None], kmask, cfg, kv_hook=write)

        x, (kc, vc) = jax.lax.scan(block_ragged, x, (params["blocks"],
                                                     kc, vc))
        logits = _logits(params, x, cfg)[:, 0].astype(jnp.float32)
        key, ks = jax.random.split(key)
        nxt = pick(logits, ks).astype(jnp.int32)
        if eos_id >= 0:
            nxt = jnp.where(done, eos_id, nxt)
        done = done | ((nxt == eos_id) if eos_id >= 0
                       else jnp.zeros((b,), bool))
        return (nxt, done, kc, vc, key), tok

    (tok_last, _, _, _, _), toks = jax.lax.scan(
        step, (tok0, done0, kc0, vc0, key), jnp.arange(1, t_max))
    out = jnp.concatenate([toks.T, tok_last[:, None]], axis=1)  # [B, T]
    return out


# ---------------------------------------------------------------------------
# torch checkpoint conversion (HF Qwen2ForCausalLM state dict)


def _t(a) -> np.ndarray:
    try:
        return a.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(a, np.float32)


def convert_qwen(state_dict, cfg: QwenConfig) -> Params:
    """HF `Qwen2ForCausalLM.state_dict()` → init_qwen param tree."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}

    def lin(name, bias):
        p = {"w": _t(sd[f"{name}.weight"]).T}
        if bias:
            p["b"] = _t(sd[f"{name}.bias"])
        return p

    def block(i):
        pre = f"layers.{i}"
        return {
            "ln1": _t(sd[f"{pre}.input_layernorm.weight"]),
            "q": lin(f"{pre}.self_attn.q_proj", True),
            "k": lin(f"{pre}.self_attn.k_proj", True),
            "v": lin(f"{pre}.self_attn.v_proj", True),
            "o": lin(f"{pre}.self_attn.o_proj", False),
            "ln2": _t(sd[f"{pre}.post_attention_layernorm.weight"]),
            "gate": lin(f"{pre}.mlp.gate_proj", False),
            "up": lin(f"{pre}.mlp.up_proj", False),
            "down": lin(f"{pre}.mlp.down_proj", False),
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    params = {
        "embed": _t(sd["embed_tokens.weight"]),
        "norm": _t(sd["norm.weight"]),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {"w": _t(sd["lm_head.weight"]).T}
    return jax.tree.map(jnp.asarray, params)


def infer_qwen_config(state_dict, num_heads: Optional[int] = None
                      ) -> QwenConfig:
    """Recover QwenConfig from an HF state dict's shapes.

    num_heads disambiguates the head dim (not recoverable from shapes
    alone — q_proj is square); without it, released-size defaults apply
    (head_dim 128 for >=3B widths, 64 below)."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    vocab, dim = sd["embed_tokens.weight"].shape
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))
    kv_d = sd["layers.0.self_attn.k_proj.weight"].shape[0]
    ffn = sd["layers.0.mlp.gate_proj.weight"].shape[0]
    if num_heads:
        hd = int(dim) // int(num_heads)
    else:
        hd = 128 if dim % 128 == 0 and dim >= 2048 else 64
    # raw torch state_dicts of TIED models still carry lm_head.weight
    # (same storage as the embedding); only an actually-distinct head
    # means untied
    head = state_dict.get("lm_head.weight")
    tied = head is None or np.array_equal(_t(head),
                                          _t(sd["embed_tokens.weight"]))
    return QwenConfig(vocab_size=int(vocab), dim=int(dim),
                      ffn_dim=int(ffn), num_layers=n_layers,
                      num_heads=int(dim) // hd,
                      num_kv_heads=int(kv_d) // hd,
                      tie_embeddings=tied)


def load_qwen_checkpoint(path: str) -> Tuple[Params, QwenConfig]:
    """Load a converted (params, cfg) pair from an HF checkpoint.

    `path` may be a single state-dict file (.pt/.pth/.safetensors) or an
    HF model DIRECTORY (config.json + one or more weight shards). The
    directory route reads config.json for the exact head count instead
    of the released-size heuristic."""
    import json
    import os

    from omnihuman_tpu.utils.convert import load_torch_state_dict

    num_heads, hf_cfg = None, {}
    if os.path.isdir(path):
        cfg_file = os.path.join(path, "config.json")
        if os.path.exists(cfg_file):
            with open(cfg_file) as fh:
                hf_cfg = json.load(fh)
            num_heads = hf_cfg.get("num_attention_heads")
        shards = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith((".safetensors", ".bin", ".pt", ".pth"))
            and "index" not in f)
        if not shards:
            raise FileNotFoundError(f"no weight files in {path}")
        sd = {}
        for s in shards:
            sd.update(load_torch_state_dict(s))
    else:
        sd = load_torch_state_dict(path)
    cfg = infer_qwen_config(sd, num_heads=num_heads)
    if hf_cfg:
        cfg = dataclasses.replace(
            cfg,
            rope_theta=float(hf_cfg.get("rope_theta", cfg.rope_theta)),
            rms_eps=float(hf_cfg.get("rms_norm_eps", cfg.rms_eps)))
    return convert_qwen(sd, cfg), cfg
