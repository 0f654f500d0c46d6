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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _chunk_attention(q, k, v, k_len, scale, compute_dtype):
    """Per-chunk attention → (normalized out [B,Lq,N,D] fp32,
    lse [B,N,Lq] fp32). Fully-masked rows get out=0, lse=-inf."""
    lk = k.shape[1]
    logits = jnp.einsum("bqnd,bknd->bnqk", q.astype(compute_dtype),
                        k.astype(compute_dtype),
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.arange(lk)[None, None, None, :] < k_len.reshape(-1, 1, 1, 1)
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


def _ring_attention_local(q, k, v, seq_lens, *, axis_name: str,
                          scale: float, compute_dtype):
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
                                      scale, compute_dtype)
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
) -> jnp.ndarray:
    """Full (non-causal) varlen attention with the token axis sharded on
    `axis`. q/k/v: [B, L, N, D] global arrays; seq_lens: [B] global valid
    counts (same contract as ops.attention.flash_attention)."""
    from jax.experimental.shard_map import shard_map
    b, l, n, d = q.shape
    scale = float(softmax_scale if softmax_scale is not None else d ** -0.5)
    if seq_lens is None:
        seq_lens = jnp.full((b,), l, jnp.int32)

    spec_x = P(None, axis, None, None)
    fn = functools.partial(_ring_attention_local, axis_name=axis,
                           scale=scale, compute_dtype=compute_dtype)
    return shard_map(
        fn, mesh=mesh,
        in_specs=(spec_x, spec_x, spec_x, P(None)),
        out_specs=spec_x,
        check_rep=False,
    )(q, k, v, seq_lens)


# ---------------------------------------------------------------------------
# Ulysses (head all-to-all) sequence parallelism
#
# The reference's USP combines Ulysses and ring (SURVEY §5.7). Ring above
# is the bandwidth-optimal default; this is the Ulysses variant: tokens
# gather / heads scatter via all_to_all so each device runs DENSE
# attention over the full sequence for a subset of heads — preferable
# when n_heads % sp == 0 and the sequence fits per-device.


def _ulysses_local(q, k, v, seq_lens, *, axis_name: str, scale: float,
                   compute_dtype):
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
    o, _ = _chunk_attention(qh, kh, vh, seq_lens, scale, compute_dtype)
    return gather_heads(o.astype(q.dtype))


def ulysses_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh,
    seq_lens: Optional[jnp.ndarray] = None,
    axis: str = "sp",
    softmax_scale: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Head-scatter sequence parallelism (requires num_heads % sp == 0)."""
    from jax.experimental.shard_map import shard_map
    b, l, n, d = q.shape
    sp = int(mesh.shape[axis])
    assert n % sp == 0, f"num_heads {n} not divisible by sp {sp}"
    scale = float(softmax_scale if softmax_scale is not None else d ** -0.5)
    if seq_lens is None:
        seq_lens = jnp.full((b,), l, jnp.int32)

    spec_x = P(None, axis, None, None)
    fn = functools.partial(_ulysses_local, axis_name=axis, scale=scale,
                           compute_dtype=compute_dtype)
    return shard_map(fn, mesh=mesh,
                     in_specs=(spec_x, spec_x, spec_x, P(None)),
                     out_specs=spec_x, check_rep=False)(q, k, v, seq_lens)
