"""Attention front-end — the TPU replacement for the reference's
flash-attn 2/3 CUDA shim (wan/modules/attention.py:24-179).

Same call contract as the reference `flash_attention`:
    q [B, Lq, N, D], k [B, Lk, N, D], v [B, Lk, N, D]
    q_lens/k_lens [B] int32 — per-sample valid lengths (varlen masking)
    window_size (left, right) — sliding-window local attention
    causal, softmax_scale, q_scale

Back-ends:
  - 'pallas' : blockwise flash-attention Pallas kernel (ops/flash_pallas.py),
    the TPU-native equivalent of the FA2/FA3 wheels. Used on TPU.
  - 'xla'    : dense jnp implementation with explicit masks. XLA fuses it
    well enough for CPU tests and small cross-attention; also the golden
    reference the kernel is parity-tested against.

Unlike the CUDA shim there is no packing into cu_seqlens: TPU kernels want
static shapes, so padding stays and masking is done inside the kernel —
padded K/V columns are excluded from the softmax, padded Q rows compute
garbage that downstream code never reads (identical observable behaviour
to the reference's varlen path).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _length_mask(lens: Optional[jnp.ndarray], size: int,
                 batch: int) -> Optional[jnp.ndarray]:
    if lens is None:
        return None
    idx = jnp.arange(size)[None, :]
    return idx < lens[:, None]  # [B, size]


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_lens: Optional[jnp.ndarray] = None,
    k_lens: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    q_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Dense masked attention. Softmax in fp32, matmuls in compute_dtype."""
    b, lq, n, d = q.shape
    lk = k.shape[1]
    out_dtype = q.dtype

    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    qc = q.astype(compute_dtype)
    if q_scale is not None:
        qc = qc * jnp.asarray(q_scale, compute_dtype)
    kc = k.astype(compute_dtype)
    vc = v.astype(compute_dtype)

    # [B, N, Lq, Lk]. precision=highest is a no-op for bf16 inputs (native
    # MXU path) but keeps f32 inputs exactly f32 for parity testing.
    logits = jnp.einsum("bqnd,bknd->bnqk", qc, kc,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    logits = logits * jnp.float32(scale)

    mask = jnp.ones((1, 1, lq, lk), dtype=bool)
    kmask = _length_mask(k_lens, lk, b)
    if kmask is not None:
        mask = mask & kmask[:, None, None, :]
    if causal or window_size != (-1, -1):
        qi = jnp.arange(lq)[:, None] + (lk - lq)  # align diagonals
        ki = jnp.arange(lk)[None, :]
        if causal:
            mask = mask & (ki <= qi)[None, None]
        left, right = window_size
        if left >= 0:
            mask = mask & (qi - ki <= left)[None, None]
        if right >= 0:
            mask = mask & (ki - qi <= right)[None, None]

    logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", probs, vc,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(out_dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_lens: Optional[jnp.ndarray] = None,
    k_lens: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    q_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    deterministic: bool = True,
    dtype: jnp.dtype = jnp.bfloat16,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Drop-in equivalent of reference flash_attention (attention.py:24-131).

    dropout_p/deterministic are accepted for API parity; dropout is not used
    anywhere on the reference's hot path and is not implemented.
    """
    del dropout_p, deterministic
    if implementation == "auto":
        implementation = (
            "pallas" if jax.default_backend() == "tpu" else "xla")

    if implementation in ("ring", "ulysses"):
        # sequence-parallel paths need the active mesh (parallel.use_mesh)
        from omnihuman_tpu.parallel.mesh import current_mesh
        mesh = current_mesh()
        if mesh is None or mesh.shape.get("sp", 1) == 1:
            implementation = ("pallas" if jax.default_backend() == "tpu"
                              else "xla")
        else:
            from omnihuman_tpu.ops.ring_attention import (
                ring_attention, ulysses_attention)
            fn = (ring_attention if implementation == "ring"
                  else ulysses_attention)
            return fn(q, k, v, mesh, seq_lens=k_lens,
                      softmax_scale=softmax_scale, compute_dtype=dtype)

    if implementation == "pallas":
        from omnihuman_tpu.ops.flash_pallas import pallas_flash_attention
        return pallas_flash_attention(
            q, k, v, q_lens=q_lens, k_lens=k_lens,
            softmax_scale=softmax_scale, q_scale=q_scale, causal=causal,
            window_size=window_size, compute_dtype=dtype)
    return attention_xla(
        q, k, v, q_lens=q_lens, k_lens=k_lens, softmax_scale=softmax_scale,
        q_scale=q_scale, causal=causal, window_size=window_size,
        compute_dtype=dtype)


# `attention` in the reference falls back to SDPA when flash-attn wheels are
# missing (attention.py:133-179); here both names resolve to the same
# dispatcher since the fallback is first-class.
attention = flash_attention
