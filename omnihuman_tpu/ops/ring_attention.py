"""Ring flash attention over the `sp` mesh axis — long-context subsystem.

This replaces the reference's xDiT "USP" stack (SURVEY §5.7:
xdit_context_parallel.py — Ulysses head all-to-all + ring P2P via
xFuserLongContextAttention, installed by monkey-patching every block's
forward): tokens stay sharded on the `sp` axis; K/V blocks rotate around
the ring with `jax.lax.ppermute` while each device accumulates its
queries' attention over every block with a flash-decoding-style
log-sum-exp merge. No padding hacks, no patched forwards — call it under
`shard_map` and GSPMD handles the rest of the model.

Varlen masking uses GLOBAL key indices derived from each block's home
shard, so per-rank RoPE/padding tricks (xdit_context_parallel.py:52-57)
are unnecessary. Differentiable end-to-end: the ring is a `lax.scan` of
`ppermute`s, so reverse-mode autodiff produces the reverse ring
automatically.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from omnihuman_tpu.ops.flash_pallas import (
    DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, _flash_bwd, _flash_fwd_nd)


def _chunk_attention(q, k, v, k_len, scale, compute_dtype,
                     causal=False, window=(-1, -1), q_off=0, k_off=0):
    """Per-chunk attention → (normalized out [B,Lq,N,D] fp32,
    lse [B,N,Lq] fp32). Fully-masked rows get out=0, lse=-inf.
    q_off/k_off: GLOBAL token offsets of this chunk's q/k for
    causal/window masking (same convention as flash_pallas._mask_block)."""
    lq, lk = q.shape[1], k.shape[1]
    logits = jnp.einsum("bqnd,bknd->bnqk", q.astype(compute_dtype),
                        k.astype(compute_dtype),
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.arange(lk)[None, None, None, :] < k_len.reshape(-1, 1, 1, 1)
    if causal or tuple(window) != (-1, -1):
        qg = jnp.arange(lq)[None, None, :, None] + q_off
        kg = jnp.arange(lk)[None, None, None, :] + k_off
        if causal:
            mask &= kg <= qg
        left, right = window
        if left >= 0:
            mask &= (qg - kg) <= left
        if right >= 0:
            mask &= (kg - qg) <= right
    logits = jnp.where(mask, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1)                        # [B,N,Lq]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m_safe[..., None])
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1)                             # [B,N,Lq]
    o = jnp.einsum("bnqk,bknd->bqnd", p.astype(compute_dtype),
                   v.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    l_safe = jnp.where(l > 0, l, 1.0)
    o = o / l_safe.transpose(0, 2, 1)[..., None]
    lse = jnp.where(l > 0, m_safe + jnp.log(l_safe), -jnp.inf)
    return o, lse


def _merge(o0, lse0, o1, lse1):
    """Combine two normalized partial attentions by their lse weights."""
    m = jnp.maximum(lse0, lse1)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w0 = jnp.where(jnp.isfinite(lse0), jnp.exp(lse0 - m_safe), 0.0)
    w1 = jnp.where(jnp.isfinite(lse1), jnp.exp(lse1 - m_safe), 0.0)
    denom = jnp.maximum(w0 + w1, 1e-30)

    def bw(x):  # [B,N,Lq] → [B,Lq,N,1]
        return x.transpose(0, 2, 1)[..., None]

    o = o0 * bw(w0 / denom) + o1 * bw(w1 / denom)
    lse = jnp.where(denom > 1e-30, m_safe + jnp.log(denom), -jnp.inf)
    return o, lse


# ---------------------------------------------------------------------------
# flash ring: per-chunk Pallas flash kernel + lse merge (VERDICT missing #2)
#
# The forward scans the KV ring calling the flash forward (with_lse=True) on
# each resident chunk — per-device live memory is O(Lq_local·Lk_local /
# block) inside the kernel, never a dense [B,N,Lq,Lk] logits array. The
# backward is a second ring pass: with the GLOBAL lse and delta, per-chunk
# flash backwards are independent and sum (dq) / travel home with the ring
# (dk/dv) — the same structure the reference gets from flash-attn inside
# xFuserLongContextAttention (xdit_context_parallel.py:179-184).


def _ring_flash_fwd_pass(q, k, v, seq_lens, axis_name, scale, head_dim,
                         interpret, block_q, block_k,
                         causal=False, window=(-1, -1)):
    """q/k/v: [B, L_local, N*D] flattened. Returns (out, lse [B,N,Lq]).

    causal/window are evaluated in GLOBAL coordinates: each chunk's call
    passes (my_idx*Lq, src*Lk) offsets into the kernel's mask."""
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, lq, nd = q.shape
    lk_local = k.shape[1]
    n = nd // head_dim
    perm = [(j, (j - 1) % n_dev) for j in range(n_dev)]

    masked = causal or tuple(window) != (-1, -1)

    def body(carry, i):
        k_cur, v_cur, o_acc, lse_acc = carry
        src = (my_idx + i) % n_dev
        k_len = jnp.clip(seq_lens - src * lk_local, 0, lk_local)
        offs = (jnp.stack([my_idx * lq, src * lk_local]).astype(jnp.int32)
                if masked else None)
        o_i, lse_i = _flash_fwd_nd(
            q, k_cur, v_cur, k_len, scale, causal, window, block_q,
            block_k, interpret, jax.lax.Precision.DEFAULT, with_lse=True,
            head_dim=head_dim, offsets=offs)
        o_i = o_i.astype(jnp.float32).reshape(b, lq, n, head_dim)
        o_acc, lse_acc = _merge(o_acc, lse_acc, o_i, lse_i)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, o_acc, lse_acc), None

    o0 = jnp.zeros((b, lq, n, head_dim), jnp.float32)
    lse0 = jnp.full((b, n, lq), -jnp.inf, jnp.float32)
    (_, _, out, lse), _ = jax.lax.scan(body, (k, v, o0, lse0),
                                       jnp.arange(n_dev))
    return out.reshape(b, lq, nd).astype(q.dtype), lse


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _ring_flash(q, k, v, seq_lens, axis_name, scale, head_dim, interpret,
                block_q, block_k, causal, window):
    out, _ = _ring_flash_fwd_pass(q, k, v, seq_lens, axis_name, scale,
                                  head_dim, interpret, block_q, block_k,
                                  causal, window)
    return out


def _ring_flash_fwd_rule(q, k, v, seq_lens, axis_name, scale, head_dim,
                         interpret, block_q, block_k, causal, window):
    out, lse = _ring_flash_fwd_pass(q, k, v, seq_lens, axis_name, scale,
                                    head_dim, interpret, block_q, block_k,
                                    causal, window)
    return out, (q, k, v, seq_lens, out, lse)


def _ring_flash_bwd_rule(axis_name, scale, head_dim, interpret, block_q,
                         block_k, causal, window, res, g):
    q, k, v, seq_lens, out, lse = res
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    lq = q.shape[1]
    lk_local = k.shape[1]
    perm = [(j, (j - 1) % n_dev) for j in range(n_dev)]
    g = g.astype(q.dtype)

    masked = causal or tuple(window) != (-1, -1)

    def body(carry, i):
        k_cur, v_cur, dk_cur, dv_cur, dq_acc = carry
        src = (my_idx + i) % n_dev
        k_len = jnp.clip(seq_lens - src * lk_local, 0, lk_local)
        offs = (jnp.stack([my_idx * lq, src * lk_local]).astype(jnp.int32)
                if masked else None)
        dq_i, dk_i, dv_i = _flash_bwd(
            (q, k_cur, v_cur, k_len, out, lse), g, scale, causal, window,
            block_q, block_k, interpret, jax.lax.Precision.DEFAULT,
            head_dim, offsets=offs)
        dq_acc = dq_acc + dq_i.astype(jnp.float32)
        # dk/dv accumulators travel WITH their kv chunk: after n_dev hops
        # each chunk's gradient lands back on its home device
        dk_cur = jax.lax.ppermute(dk_cur + dk_i.astype(jnp.float32),
                                  axis_name, perm)
        dv_cur = jax.lax.ppermute(dv_cur + dv_i.astype(jnp.float32),
                                  axis_name, perm)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, dk_cur, dv_cur, dq_acc), None

    zeros_kv = jnp.zeros(k.shape, jnp.float32)
    (_, _, dk, dv, dq), _ = jax.lax.scan(
        body, (k, v, zeros_kv, zeros_kv, jnp.zeros(q.shape, jnp.float32)),
        jnp.arange(n_dev))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None)


_ring_flash.defvjp(_ring_flash_fwd_rule, _ring_flash_bwd_rule)


def _ring_flash_local(q, k, v, seq_lens, *, axis_name: str, scale: float,
                      compute_dtype, interpret: bool, block_q: int,
                      block_k: int, causal: bool = False,
                      window: Tuple[int, int] = (-1, -1)):
    """shard_map body: [B, L_local, N, D] 4D wrapper around _ring_flash."""
    b, lq, n, d = q.shape
    lk = k.shape[1]
    out = _ring_flash(
        q.astype(compute_dtype).reshape(b, lq, n * d),
        k.astype(compute_dtype).reshape(b, lk, n * d),
        v.astype(compute_dtype).reshape(b, lk, n * d),
        seq_lens, axis_name, scale, d, interpret, block_q, block_k,
        causal, tuple(window))
    return out.reshape(b, lq, n, d).astype(q.dtype)


def _ring_attention_local(q, k, v, seq_lens, *, axis_name: str,
                          scale: float, compute_dtype,
                          causal: bool = False,
                          window: Tuple[int, int] = (-1, -1)):
    """Per-device body under shard_map. q/k/v: [B, L_local, N, D];
    seq_lens: [B] GLOBAL valid token count."""
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    lk_local = k.shape[1]
    b, lq, n, d = q.shape
    perm = [(j, (j - 1) % n_dev) for j in range(n_dev)]

    def body(carry, i):
        k_cur, v_cur, o_acc, lse_acc = carry
        src = (my_idx + i) % n_dev            # home shard of this block
        k_len_chunk = jnp.clip(seq_lens - src * lk_local, 0, lk_local)
        o_i, lse_i = _chunk_attention(q, k_cur, v_cur, k_len_chunk,
                                      scale, compute_dtype,
                                      causal=causal, window=window,
                                      q_off=my_idx * lq,
                                      k_off=src * lk_local)
        o_acc, lse_acc = _merge(o_acc, lse_acc, o_i, lse_i)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, o_acc, lse_acc), None

    o0 = jnp.zeros((b, lq, n, d), jnp.float32)
    lse0 = jnp.full((b, n, lq), -jnp.inf, jnp.float32)
    (_, _, out, _), _ = jax.lax.scan(body, (k, v, o0, lse0),
                                     jnp.arange(n_dev))
    return out.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh,
    seq_lens: Optional[jnp.ndarray] = None,
    axis: str = "sp",
    softmax_scale: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
    impl: str = "auto",
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
) -> jnp.ndarray:
    """Varlen attention with the token axis sharded on `axis`.
    q/k/v: [B, L, N, D] global arrays; seq_lens: [B] global valid
    counts (same contract as ops.attention.flash_attention).

    causal/window_size are honored in GLOBAL token coordinates — each
    ring chunk's mask is offset by its home shard (VERDICT r4 item 7),
    so the mesh path carries the full reference attention contract
    (seaweed_apt/wan/modules/attention.py:24-131).

    impl: 'flash' (Pallas kernel per ring chunk — the scale-viable path,
    O(block) memory), 'dense' (per-chunk jnp softmax — tiny shapes /
    arbitrary head_dim on compiled backends), or 'auto'.
    """
    from jax.experimental.shard_map import shard_map
    b, l, n, d = q.shape
    scale = float(softmax_scale if softmax_scale is not None else d ** -0.5)
    if seq_lens is None:
        seq_lens = jnp.full((b,), l, jnp.int32)

    interpret = jax.default_backend() != "tpu"
    if impl == "auto":
        # compiled TPU kernels need lane-aligned head_dim; interpret mode
        # (CPU tests) takes the flash path for any shape
        impl = "flash" if (interpret or d % 128 == 0) else "dense"

    spec_x = P(None, axis, None, None)
    if impl == "flash":
        fn = functools.partial(
            _ring_flash_local, axis_name=axis, scale=scale,
            compute_dtype=compute_dtype, interpret=interpret,
            block_q=block_q, block_k=block_k, causal=causal,
            window=tuple(window_size))
    else:
        fn = functools.partial(_ring_attention_local, axis_name=axis,
                               scale=scale, compute_dtype=compute_dtype,
                               causal=causal, window=tuple(window_size))
    return shard_map(
        fn, mesh=mesh,
        in_specs=(spec_x, spec_x, spec_x, P(None)),
        out_specs=spec_x,
        check_rep=False,
    )(q, k, v, seq_lens)


def sp_cross_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh,
    k_lens: Optional[jnp.ndarray] = None,
    axis: str = "sp",
    softmax_scale: Optional[float] = None,
    q_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Cross-attention with query tokens sharded on `axis` and the short
    K/V context REPLICATED — embarrassingly parallel: each shard runs the
    flash kernel over its local queries and the full context; no
    collectives are emitted.

    This is the sp>1 companion to ring/ulysses self-attention: a bare
    Pallas call on sp-sharded queries cannot be partitioned by GSPMD
    ("Mosaic kernels cannot be automatically partitioned"), so the DiT's
    cross-attention must go through this shard_map wrapper whenever the
    token axis is sharded. The reference likewise keeps cross-attention
    local per sp rank (xdit_context_parallel.py — SURVEY §5.7).

    causal/window_size: masked in GLOBAL query coordinates — each
    shard's q offset corrects the kernel's end-aligned (lk - lq) diag
    so the result matches the unsharded flash/xla call exactly.
    """
    from jax.experimental.shard_map import shard_map

    from omnihuman_tpu.ops.flash_pallas import pallas_flash_attention

    b, l, n, d = q.shape
    lk = k.shape[1]
    scale = float(softmax_scale if softmax_scale is not None else d ** -0.5)
    if k_lens is None:
        k_lens = jnp.full((b,), lk, jnp.int32)
    interpret = jax.default_backend() != "tpu"
    masked = causal or tuple(window_size) != (-1, -1)
    sp = int(mesh.shape[axis])
    lq_local = l // sp

    def local(q, k, v, kl):
        offsets = None
        if masked:
            # kernel diag is (lk - lq_local); global semantics need
            # (lk - L_global) + my_idx*lq_local — fold the difference
            # into the q offset
            my = jax.lax.axis_index(axis)
            offsets = jnp.stack(
                [(my + 1) * lq_local - l, 0]).astype(jnp.int32)
        return pallas_flash_attention(
            q, k, v, k_lens=kl, softmax_scale=scale, q_scale=q_scale,
            causal=causal, window_size=tuple(window_size),
            compute_dtype=compute_dtype, interpret=interpret,
            offsets=offsets)

    spec_q = P(None, axis, None, None)
    spec_kv = P(None, None, None, None)
    return shard_map(local, mesh=mesh,
                     in_specs=(spec_q, spec_kv, spec_kv, P(None)),
                     out_specs=spec_q, check_rep=False)(q, k, v, k_lens)


# ---------------------------------------------------------------------------
# Ulysses (head all-to-all) sequence parallelism
#
# The reference's USP combines Ulysses and ring (SURVEY §5.7). Ring above
# is the bandwidth-optimal default; this is the Ulysses variant: tokens
# gather / heads scatter via all_to_all so each device runs DENSE
# attention over the full sequence for a subset of heads — preferable
# when n_heads % sp == 0 and the sequence fits per-device.


def _ulysses_local(q, k, v, seq_lens, *, axis_name: str, scale: float,
                   compute_dtype, impl: str = "flash",
                   causal: bool = False,
                   window: Tuple[int, int] = (-1, -1)):
    """q/k/v: [B, L_local, N, D] → all_to_all → [B, L, N_local, D]."""
    n_dev = jax.lax.psum(1, axis_name)

    def scatter_heads(x):
        # [B, Ls, N, D] → [B, Ls, n_dev, N/n_dev, D] → gather seq
        b, ls, n, d = x.shape
        x = x.reshape(b, ls, n_dev, n // n_dev, d)
        # all_to_all over axis: split heads dim, concat seq dim
        x = jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                               tiled=False)
        return x.reshape(b, ls * n_dev, n // n_dev, d)

    def gather_heads(x):
        b, l, nl, d = x.shape
        x = x.reshape(b, n_dev, l // n_dev, nl, d)
        x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=3,
                               tiled=False)
        return x.reshape(b, l // n_dev, nl * n_dev, d)

    qh = scatter_heads(q)
    kh = scatter_heads(k)
    vh = scatter_heads(v)
    if impl == "flash":
        # full-sequence flash over the local head subset — replaces the
        # dense [B, N_local, L, L] softmax that made Ulysses
        # memory-infeasible at the flagship 32k tokens
        from omnihuman_tpu.ops.flash_pallas import pallas_flash_attention
        # post-all_to_all each device sees the FULL sequence for its head
        # subset: causal/window need no offsets here
        o = pallas_flash_attention(
            qh, kh, vh, k_lens=seq_lens, softmax_scale=scale,
            causal=causal, window_size=tuple(window),
            compute_dtype=compute_dtype).astype(jnp.float32)
    else:
        o, _ = _chunk_attention(qh, kh, vh, seq_lens, scale, compute_dtype,
                                causal=causal, window=window)
    return gather_heads(o.astype(q.dtype))


def ulysses_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh,
    seq_lens: Optional[jnp.ndarray] = None,
    axis: str = "sp",
    softmax_scale: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
    impl: str = "auto",
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
) -> jnp.ndarray:
    """Head-scatter sequence parallelism (requires num_heads % sp == 0)."""
    from jax.experimental.shard_map import shard_map
    b, l, n, d = q.shape
    sp = int(mesh.shape[axis])
    assert n % sp == 0, f"num_heads {n} not divisible by sp {sp}"
    scale = float(softmax_scale if softmax_scale is not None else d ** -0.5)
    if seq_lens is None:
        seq_lens = jnp.full((b,), l, jnp.int32)
    if impl == "auto":
        # pallas_flash_attention itself falls back to dense XLA for
        # non-lane-aligned head dims on compiled backends
        impl = "flash"

    spec_x = P(None, axis, None, None)
    fn = functools.partial(_ulysses_local, axis_name=axis, scale=scale,
                           compute_dtype=compute_dtype, impl=impl,
                           causal=causal, window=tuple(window_size))
    return shard_map(fn, mesh=mesh,
                     in_specs=(spec_x, spec_x, spec_x, P(None)),
                     out_specs=spec_x, check_rep=False)(q, k, v, seq_lens)
