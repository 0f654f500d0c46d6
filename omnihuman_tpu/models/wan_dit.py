"""Wan 2.1 DiT denoiser — TPU-native functional implementation.

Capability parity with reference wan/modules/model.py:377-612 (`WanModel`):
3D patch-embed → N attention blocks (self-attn with 3D RoPE + cross-attn on
text [+ CLIP image tokens for i2v] + AdaLN-modulated FFN) → AdaLN head →
unpatchify. Velocity prediction for flow matching.

TPU-first redesign (SURVEY §7.1), not a translation:
  - init/apply pair over a params PyTree; no modules, no hooks, no autocast.
  - Block parameters are STACKED along a leading layer axis and the block
    loop is a `lax.scan` — O(1) compile time in depth, per-block remat via
    `jax.checkpoint`, and clean fsdp sharding of [L, ...] leaves.
  - Patch embedding: stride==kernel Conv3d is a reshape + one GEMM (MXU),
    replacing cuDNN conv (model.py:463-464,515).
  - RoPE: precomputed real sin/cos tables passed in as arrays
    (ops/rope.py), replacing the complex-f64 Python loop (model.py:41-69).
  - Mixed precision is explicit: residual stream + AdaLN/time/gates in
    fp32, matmuls in bf16 — replacing autocast scatter (model.py:287-296,
    540) and matching where the reference keeps fp32.
  - Static shapes everywhere: x is a dense [B, C, F, H, W] batch, context
    is padded to text_len with context_lens masking — no Python lists of
    per-sample tensors (model.py:511-522).
  - The reference's OOM hacks are deliberately NOT replicated
    (FFN-on-CPU for block_idx>10, empty_cache, None-input zero-fills —
    model.py:317-324,503,99-104; SURVEY §2.1 'quirks to NOT replicate').
  - Feature taps for the APT discriminator (reference uses forward hooks,
    seaweed_apt/model.py:150-155) are an explicit `collect_layers` output.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from omnihuman_tpu.configs.wan import DTypePolicy, WanModelConfig
from omnihuman_tpu.ops.attention import flash_attention
from omnihuman_tpu.ops.norms import layer_norm, rms_norm
from omnihuman_tpu.ops.rope import apply_rope

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initialisation helpers


def _xavier(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def _normal(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def _linear_init(key, d_in, d_out, init=_xavier):
    kw, _ = jax.random.split(key)
    return {"w": init(kw, (d_in, d_out)), "b": jnp.zeros((d_out,))}


def _linear(p, x, compute_dtype=None):
    if "w_q" in p:   # int8 serving weights (ops/quant.py W8A8 path)
        from omnihuman_tpu.ops.quant import int8_linear
        return int8_linear(
            p, x if compute_dtype is None else x.astype(compute_dtype))
    w, b = p["w"], p["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        b = b.astype(compute_dtype)
    return x @ w + b


def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """[B] -> [B, dim]: cat(cos, sin) ordering (reference model.py:17-27)."""
    half = dim // 2
    pos = position.astype(jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = pos[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)


# ---------------------------------------------------------------------------
# init


def _attn_init(key, dim, cross_i2v=False):
    ks = jax.random.split(key, 8)
    p = {
        "q": _linear_init(ks[0], dim, dim),
        "k": _linear_init(ks[1], dim, dim),
        "v": _linear_init(ks[2], dim, dim),
        "o": _linear_init(ks[3], dim, dim),
        "norm_q": {"w": jnp.ones((dim,))},
        "norm_k": {"w": jnp.ones((dim,))},
    }
    if cross_i2v:
        p["k_img"] = _linear_init(ks[4], dim, dim)
        p["v_img"] = _linear_init(ks[5], dim, dim)
        p["norm_k_img"] = {"w": jnp.ones((dim,))}
    return p


def _block_init(key, cfg: WanModelConfig):
    ks = jax.random.split(key, 6)
    dim, ffn = cfg.dim, cfg.ffn_dim
    p = {
        "self_attn": _attn_init(ks[0], dim),
        "cross_attn": _attn_init(ks[1], dim,
                                 cross_i2v=cfg.model_type == "i2v"),
        "ffn_fc1": _linear_init(ks[2], dim, ffn),
        "ffn_fc2": _linear_init(ks[3], ffn, dim),
        "modulation": jax.random.normal(ks[4], (6, dim)) / dim ** 0.5,
    }
    if cfg.cross_attn_norm:
        p["norm3"] = {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}
    return p


def init_wan_model(key: jax.Array, cfg: WanModelConfig) -> Params:
    """Initialise the full parameter PyTree (reference init_weights,
    model.py:590-612: xavier linears, normal(0.02) embeddings, zero head)."""
    ks = jax.random.split(key, 10)
    dim = cfg.dim
    patch_in = cfg.in_dim * math.prod(cfg.patch_size)

    params: Params = {
        "patch_embedding": _linear_init(ks[0], patch_in, dim),
        "text_fc1": _linear_init(ks[1], cfg.text_dim, dim, init=_normal),
        "text_fc2": _linear_init(ks[2], dim, dim, init=_normal),
        "time_fc1": _linear_init(ks[3], cfg.freq_dim, dim, init=_normal),
        "time_fc2": _linear_init(ks[4], dim, dim, init=_normal),
        "time_proj": _linear_init(ks[5], dim, dim * 6),
        "head": {
            "w": jnp.zeros((dim, math.prod(cfg.patch_size) * cfg.out_dim)),
            "b": jnp.zeros((math.prod(cfg.patch_size) * cfg.out_dim,)),
            "modulation": jax.random.normal(ks[6], (2, dim)) / dim ** 0.5,
        },
    }

    # stacked blocks: every leaf gets a leading [num_layers] axis
    block_keys = jax.random.split(ks[7], cfg.num_layers)
    blocks = [_block_init(k, cfg) for k in block_keys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    if cfg.model_type == "i2v":
        kk = jax.random.split(ks[8], 2)
        params["img_emb"] = {
            "ln1": {"w": jnp.ones((cfg.clip_embed_dim,)),
                    "b": jnp.zeros((cfg.clip_embed_dim,))},
            "fc1": _linear_init(kk[0], cfg.clip_embed_dim, cfg.clip_embed_dim),
            "fc2": _linear_init(kk[1], cfg.clip_embed_dim, dim),
            "ln2": {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))},
        }
    return params


# ---------------------------------------------------------------------------
# forward pieces


def _self_attention(p, x, rope_sin, rope_cos, seq_lens, cfg, policy,
                    attn_impl):
    """x: [B, S, dim] fp32 → [B, S, dim] (reference model.py:107-162)."""
    b, s, _ = x.shape
    n, d = cfg.num_heads, cfg.head_dim
    cd = policy.compute

    xc = x.astype(cd)
    q = rms_norm(_linear(p["q"], xc), p["norm_q"]["w"], eps=cfg.eps)
    k = rms_norm(_linear(p["k"], xc), p["norm_k"]["w"], eps=cfg.eps)
    v = _linear(p["v"], xc)
    q = q.reshape(b, s, n, d)
    k = k.reshape(b, s, n, d)
    v = v.reshape(b, s, n, d)

    # RoPE in fp32 (ops/rope.py), then flash attention
    q = apply_rope(q, rope_sin, rope_cos)
    k = apply_rope(k, rope_sin, rope_cos)

    y = flash_attention(q, k, v, k_lens=seq_lens,
                        window_size=cfg.window_size, dtype=cd,
                        implementation=attn_impl)
    y = y.reshape(b, s, n * d)
    return _linear(p["o"], y.astype(cd))


def _cross_attention(p, x, context, context_lens, cfg, policy, attn_impl):
    """x: [B, S, dim]; context: [B, Lc, dim] (reference model.py:164-230).

    Sequence-parallel impls apply to SELF attention only — the text
    context is short and replicated (the reference likewise keeps
    cross-attention replicated under USP, xdit_context_parallel.py
    — SURVEY §5.7).

    For i2v the first `clip_tokens` context entries are CLIP image tokens
    with separate K/V projections; their attention output is ADDED to the
    text-attention output before the output projection (model.py:211-229).
    """
    b, s, _ = x.shape
    n, d = cfg.num_heads, cfg.head_dim
    cd = policy.compute
    if attn_impl in ("ring", "ulysses"):
        # q tokens stay sp-sharded; kv is short and replicated. A bare
        # Pallas call on sharded q cannot be GSPMD-partitioned, so this
        # must route through the shard_map sp_cross wrapper (it falls
        # back to pallas/xla itself when no sp mesh is active).
        attn_impl = "sp_cross"

    xc = x.astype(cd)
    ctx = context.astype(cd)
    q = rms_norm(_linear(p["q"], xc), p["norm_q"]["w"], eps=cfg.eps)
    q = q.reshape(b, s, n, d)

    if cfg.model_type == "i2v":
        t = cfg.clip_tokens
        ctx_img, ctx_txt = ctx[:, :t], ctx[:, t:]
        k_img = rms_norm(_linear(p["k_img"], ctx_img),
                         p["norm_k_img"]["w"], eps=cfg.eps)
        v_img = _linear(p["v_img"], ctx_img)
        k_img = k_img.reshape(b, t, n, d)
        v_img = v_img.reshape(b, t, n, d)
        y_img = flash_attention(q, k_img, v_img, dtype=cd,
                                implementation=attn_impl)
    else:
        ctx_txt = ctx

    lc = ctx_txt.shape[1]
    k = rms_norm(_linear(p["k"], ctx_txt), p["norm_k"]["w"], eps=cfg.eps)
    v = _linear(p["v"], ctx_txt)
    k = k.reshape(b, lc, n, d)
    v = v.reshape(b, lc, n, d)
    y = flash_attention(q, k, v, k_lens=context_lens, dtype=cd,
                        implementation=attn_impl)

    if cfg.model_type == "i2v":
        y = y + y_img
    y = y.reshape(b, s, n * d)
    return _linear(p["o"], y.astype(cd))


def _block_forward(bp, x, e0, context, context_lens, rope_sin, rope_cos,
                   seq_lens, cfg: WanModelConfig, policy: DTypePolicy,
                   attn_impl: str, audio_ctx=None):
    rd = policy.residual
    """One transformer block. x, e0 fp32 (reference model.py:279-330).

    audio_ctx: optional [B, La, dim] audio tokens; when the block params
    carry an 'audio_attn' adapter (OmniHuman, omni/model.py), they are
    injected via an extra zero-init-gated cross-attention after the text
    cross-attention (README.md:121-129 'injects tokens into MMDiT via
    cross-attention' — the wiring the reference never finished,
    SURVEY §2.6 caveat).

    Note: a fused AdaLN-GEMM Pallas path (ln+modulate in fc1's prologue,
    GELU+gated-residual in fc2's epilogue) was built and measured AGAINST
    this XLA formulation on the real v5e at both 1.3B (4205 vs 3957 ms
    step) and 14B FFN widths (81 vs 134 TFLOP/s) — XLA's GEMM+epilogue
    fusions win both regimes, so the family was deleted
    (REPORTS/perf_r3.md A/B, REPORTS/perf_r4.md §8).
    """
    cd = policy.compute
    # AdaLN: modulation table + time projection, fp32, 6 chunks
    e = bp["modulation"][None].astype(jnp.float32) + e0     # [B, 6, dim]
    e_sa_shift, e_sa_scale, e_sa_gate, e_ff_shift, e_ff_scale, e_ff_gate = [
        e[:, i][:, None] for i in range(6)]                  # each [B,1,dim]

    # self-attention
    h = layer_norm(x, eps=cfg.eps, out_dtype=jnp.float32)
    h = h * (1.0 + e_sa_scale) + e_sa_shift
    y = _self_attention(bp["self_attn"], h, rope_sin, rope_cos,
                        seq_lens, cfg, policy, attn_impl)
    x = (x + (y.astype(jnp.float32) * e_sa_gate).astype(rd)).astype(rd)

    # cross-attention (pre-norm, affine when cross_attn_norm)
    if cfg.cross_attn_norm:
        h = layer_norm(x, bp["norm3"]["w"], bp["norm3"]["b"],
                       eps=cfg.eps, out_dtype=jnp.float32)
    else:
        h = x
    y = _cross_attention(bp["cross_attn"], h, context, context_lens,
                         cfg, policy, attn_impl)
    x = x + y.astype(rd)

    # OmniHuman audio injection (adapter params present only in omni models)
    if audio_ctx is not None and "audio_attn" in bp:
        ap = bp["audio_attn"]
        h = layer_norm(x, ap["norm"]["w"], ap["norm"]["b"], eps=cfg.eps,
                       out_dtype=jnp.float32)
        y = _cross_attention(
            {k: ap[k] for k in ("q", "k", "v", "o", "norm_q", "norm_k")},
            h, audio_ctx, None, dataclasses.replace(cfg, model_type="t2v"),
            policy, attn_impl)
        x = (x.astype(jnp.float32)
             + y.astype(jnp.float32) * ap["gate"].astype(jnp.float32)
             ).astype(rd)

    # FFN with AdaLN modulation
    h = layer_norm(x, eps=cfg.eps, out_dtype=jnp.float32)
    h = h * (1.0 + e_ff_scale) + e_ff_shift
    h = _linear(bp["ffn_fc1"], h.astype(cd))
    h = jax.nn.gelu(h, approximate=True)
    h = _linear(bp["ffn_fc2"], h)
    x = x + (h.astype(jnp.float32) * e_ff_gate).astype(rd)
    return x


def _patchify(p, x, cfg: WanModelConfig, policy: DTypePolicy):
    """[B, C, F, H, W] → [B, L, dim] tokens (stride==kernel conv as GEMM).

    Token order matches the reference's conv→flatten(2) (f, h, w) order
    and the patch vector is ordered (c, pt, ph, pw) to match the flattened
    Conv3d kernel, so converted torch weights are bit-compatible.
    """
    b, c, f, h, w = x.shape
    pt, ph, pw = cfg.patch_size
    x = x.reshape(b, c, f // pt, pt, h // ph, ph, w // pw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)   # b, F', H', W', c, pt, ph, pw
    x = x.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)
    return _linear(p["patch_embedding"], x.astype(policy.compute)
                   ).astype(jnp.float32)


def _unpatchify(x, grid, cfg: WanModelConfig):
    """[B, L, prod(patch)*out] → [B, out, F, H, W] (model.py:565-588)."""
    b = x.shape[0]
    f, h, w = grid
    pt, ph, pw = cfg.patch_size
    c = cfg.out_dim
    x = x[:, :f * h * w]
    x = x.reshape(b, f, h, w, pt, ph, pw, c)
    x = jnp.einsum("bfhwpqrc->bcfphqwr", x)
    return x.reshape(b, c, f * pt, h * ph, w * pw)


# ---------------------------------------------------------------------------
# public forward


def wan_model_forward(
    params: Params,
    x: jnp.ndarray,                 # [B, in_dim(16), F, H, W] latents
    t: jnp.ndarray,                 # [B] diffusion timestep (0..999 float)
    context: jnp.ndarray,           # [B, text_len, text_dim] padded text emb
    *,
    cfg: WanModelConfig,
    seq_len: int,                   # padded token length (pipeline supplies)
    rope_sin: jnp.ndarray,          # [seq_len, head_dim//2]
    rope_cos: jnp.ndarray,
    context_lens: Optional[jnp.ndarray] = None,   # [B] true text lengths
    clip_fea: Optional[jnp.ndarray] = None,       # [B, 257, 1280] (i2v)
    y: Optional[jnp.ndarray] = None,              # [B, 20, F, H, W] (i2v)
    policy: DTypePolicy = DTypePolicy(),
    remat: bool = True,
    attn_impl: str = "auto",
    collect_layers: Optional[Sequence[int]] = None,
    token_sharding=None,
    audio_ctx: Optional[jnp.ndarray] = None,
):
    """Velocity prediction v = model(x_t, t, context).

    Returns [B, out_dim, F, H, W], or (v, {layer_idx: [B, S, dim]}) when
    `collect_layers` is given (explicit APT-discriminator feature taps
    replacing the reference's forward hooks, seaweed_apt/model.py:150-155).
    """
    b = x.shape[0]
    if y is not None:   # i2v: mask+ref latent channel concat (model.py:511)
        x = jnp.concatenate([x, y], axis=1)

    grid = (x.shape[2] // cfg.patch_size[0],
            x.shape[3] // cfg.patch_size[1],
            x.shape[4] // cfg.patch_size[2])
    n_tokens = grid[0] * grid[1] * grid[2]

    tokens = _patchify(params, x, cfg, policy)          # [B, n_tokens, dim]
    out, taps = dit_body(
        params, tokens, t, context, cfg=cfg, seq_len=seq_len,
        rope_sin=rope_sin, rope_cos=rope_cos, n_tokens=n_tokens,
        context_lens=context_lens, clip_fea=clip_fea, policy=policy,
        remat=remat, attn_impl=attn_impl, collect_layers=collect_layers,
        token_sharding=token_sharding, audio_ctx=audio_ctx)

    v = _unpatchify(out, grid, cfg).astype(jnp.float32)
    if collect_layers is not None:
        return v, taps
    return v


def dit_body(
    params: Params,
    tokens: jnp.ndarray,            # [B, n_tokens, dim] pre-built tokens
    t: jnp.ndarray,
    context: jnp.ndarray,
    *,
    cfg: WanModelConfig,
    seq_len: int,
    rope_sin: jnp.ndarray,
    rope_cos: jnp.ndarray,
    n_tokens: int,                  # true (unpadded) token count
    context_lens: Optional[jnp.ndarray] = None,
    clip_fea: Optional[jnp.ndarray] = None,
    policy: DTypePolicy = DTypePolicy(),
    remat=True,
    attn_impl: str = "auto",
    collect_layers: Optional[Sequence[int]] = None,
    token_sharding=None,
    audio_ctx: Optional[jnp.ndarray] = None,
):
    """The shared DiT trunk on pre-built tokens: pad → shard → time/text
    embeds → block scan (plain / grouped remat / tapped) → modulated head.

    ONE body serves both the standard video path (wan_model_forward) and
    OmniHuman's packed video+reference+motion sequences (omni/model.py) —
    so grouped two-level remat, discriminator taps, seq-len padding and
    sp sharding behave identically everywhere.

    Returns (out [B, seq_len, prod(patch)*out_dim], taps).
    """
    b = tokens.shape[0]
    assert n_tokens <= seq_len, f"{n_tokens} tokens > seq_len {seq_len}"
    tokens = tokens.astype(policy.residual)
    if n_tokens < seq_len:
        tokens = jnp.pad(tokens, ((0, 0), (0, seq_len - n_tokens), (0, 0)))
    if rope_sin.shape[0] < seq_len:
        # identity rotation on padding (cos=1, sin=0) — packed callers
        # build tables for the true length only
        pad = seq_len - rope_sin.shape[0]
        rope_sin = jnp.pad(rope_sin, ((0, pad), (0, 0)))
        rope_cos = jnp.pad(rope_cos, ((0, pad), (0, 0)),
                           constant_values=1.0)
    if token_sharding is not None:
        # sequence-parallel annotation: GSPMD shards the token axis over
        # the `sp` mesh axis (replaces xdit_context_parallel.py:130-133's
        # explicit chunking; collectives are compiler-inserted)
        tokens = jax.lax.with_sharding_constraint(tokens, token_sharding)
    seq_lens = jnp.full((b,), n_tokens, dtype=jnp.int32)

    # time path, fp32 (model.py:526-528)
    e = sinusoidal_embedding_1d(cfg.freq_dim, t)
    e = _linear(params["time_fc1"], e, jnp.float32)
    e = jax.nn.silu(e)
    e = _linear(params["time_fc2"], e)                   # [B, dim]
    e0 = _linear(params["time_proj"], jax.nn.silu(e))
    e0 = e0.reshape(b, 6, cfg.dim)                       # [B, 6, dim]

    # text context MLP, fp32 like reference (outside autocast, model.py:534)
    ctx = _linear(params["text_fc1"], context, jnp.float32)
    ctx = jax.nn.gelu(ctx, approximate=True)
    ctx = _linear(params["text_fc2"], ctx)               # [B, text_len, dim]

    if clip_fea is not None:
        ie = params["img_emb"]
        ci = layer_norm(clip_fea, ie["ln1"]["w"], ie["ln1"]["b"],
                        out_dtype=jnp.float32)
        ci = _linear(ie["fc1"], ci)
        ci = jax.nn.gelu(ci, approximate=False)          # torch GELU() exact
        ci = _linear(ie["fc2"], ci)
        ci = layer_norm(ci, ie["ln2"]["w"], ie["ln2"]["b"],
                        out_dtype=jnp.float32)
        ctx = jnp.concatenate([ci, ctx], axis=1)
        if context_lens is not None:
            context_lens = context_lens + cfg.clip_tokens

    block_fn = functools.partial(
        _block_forward, context=ctx, context_lens=context_lens,
        rope_sin=rope_sin, rope_cos=rope_cos, seq_lens=seq_lens,
        cfg=cfg, policy=policy, attn_impl=attn_impl, audio_ctx=audio_ctx)

    # two-level (sqrt-L) rematerialisation: remat=<int g> groups the layer
    # scan into num_layers/g segments and checkpoints each SEGMENT, so the
    # backward stores only num_layers/g residual-stream carries instead of
    # one per layer (at 14B/75k tokens the flat scan's 40 fp32 carries are
    # ~29 GB/device — the dominant training-memory term; g=8 cuts it 8x
    # for one extra forward recompute). SURVEY §7.3(5) remat policy.
    grouped_remat = (isinstance(remat, int) and not isinstance(remat, bool)
                     and remat > 1 and not collect_layers)

    inner_fn = block_fn
    if remat:
        inner_fn = jax.checkpoint(
            block_fn, policy=jax.checkpoint_policies.nothing_saveable)

    taps: Dict[int, jnp.ndarray] = {}
    if grouped_remat:
        g = remat
        assert cfg.num_layers % g == 0, (
            f"remat group {g} must divide num_layers {cfg.num_layers}")
        grouped = jax.tree.map(
            lambda x: x.reshape((cfg.num_layers // g, g) + x.shape[1:]),
            params["blocks"])

        def run_group(carry, gp):
            def body(c, bp):
                return inner_fn(bp, c, e0), None
            out, _ = jax.lax.scan(body, carry, gp)
            return out

        def group_body(carry, gp):
            return jax.checkpoint(run_group)(carry, gp), None

        x_out, _ = jax.lax.scan(group_body, tokens, grouped)
    elif collect_layers:
        # Scan with tapped activations scattered into a fixed [T, B, S, dim]
        # carry buffer — O(1) compile time in depth and remat-compatible,
        # unlike an unrolled Python loop (the reference reads taps via
        # forward hooks on an unrolled module list, seaweed_apt/
        # model.py:150-155; at 40 layers an unrolled graph is a compile-
        # size and activation-memory blowup, SURVEY §7.3).
        taps_list = tuple(sorted(set(int(i) for i in collect_layers)))
        taps_idx = jnp.asarray(taps_list, jnp.int32)
        n_taps = len(taps_list)
        tap_buf = jnp.zeros((n_taps,) + tokens.shape, tokens.dtype)

        def scan_body(carry, inp):
            h, buf = carry
            bp, i = inp
            h = inner_fn(bp, h, e0)
            pos = jnp.clip(jnp.searchsorted(taps_idx, i), 0, n_taps - 1)
            is_tap = taps_idx[pos] == i
            buf = jax.lax.cond(
                is_tap,
                lambda b: jax.lax.dynamic_update_slice_in_dim(
                    b, h[None].astype(b.dtype), pos, axis=0),
                lambda b: b, buf)
            return (h, buf), None

        (x_out, tap_buf), _ = jax.lax.scan(
            scan_body, (tokens, tap_buf),
            (params["blocks"], jnp.arange(cfg.num_layers)))
        taps = {layer: tap_buf[j] for j, layer in enumerate(taps_list)}
    else:
        def scan_body(carry, bp):
            return inner_fn(bp, carry, e0), None

        x_out, _ = jax.lax.scan(scan_body, tokens, params["blocks"])

    # head (fp32, modulation 2-chunk — model.py:332-359)
    hp = params["head"]
    he = hp["modulation"][None].astype(jnp.float32) + e[:, None]  # [B,2,dim]
    h = layer_norm(x_out, eps=cfg.eps, out_dtype=jnp.float32)
    h = h * (1.0 + he[:, 1][:, None]) + he[:, 0][:, None]
    out = h @ hp["w"] + hp["b"]
    return out, taps


def count_params(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
