"""Fused AdaLN-FFN Pallas kernels for the DiT block (serving path).

Motivation (REPORTS/perf_r3.md, optimized-HLO evidence): XLA leaves
three exposed full-stream passes around the FFN of every block —
the LN+modulate pass feeding fc1, a separate GELU kLoop rewriting the
[2, 32768, 8960] intermediate (~84 ms/step), and the fp32 gated
residual update after fc2 (~36 ms/step). Reference block:
seaweed_apt/wan/modules/model.py:305-330 (norm2 → modulate → ffn →
gated residual add).

Two kernels replace `layer_norm → modulate → fc1 → gelu → fc2 →
x + gelu_out*gate`:

  ln_mod_gemm:        x_f32 --LN--> ·(1+scale)+shift --bf16--> @W1 + b1
                      (K = model dim stays whole per block, so the
                      row statistics are exact)
  gelu_gemm_gate_add: gelu(mid) @ W2 + b2, then out = res + y·gate
                      (K = ffn dim is grid-chunked with an f32 VMEM
                      accumulator; GELU is applied per-chunk in the
                      prologue — elementwise, so chunk-safe)

Forward-only (serving): differentiation raises (no VJP defined);
trainers keep the XLA path. Under an active mesh a bare pallas_call
cannot be GSPMD-partitioned — callers must resolve to "xla" there
(same rule as ops/attention.py / the VAE conv dispatcher).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2_OVER_PI = 0.7978845608028654


def _gelu_tanh(x):
    """tanh-approximate GELU, matching jax.nn.gelu(approximate=True)."""
    return 0.5 * x * (1.0 + jnp.tanh(
        _SQRT_2_OVER_PI * (x + 0.044715 * x * x * x)))


def _pick_block(n: int, cap: int, align: int = 128) -> int:
    """Largest multiple of `align` that divides n and is <= cap; n itself
    if n < align (tiny test dims)."""
    if n <= align or n % align:
        return n
    best = align
    for b in range(align, cap + 1, align):
        if n % b == 0:
            best = b
    return best


_VMEM_BUDGET = 10 * 1024 * 1024


def _fit_blocks(s: int, n: int, cap_m: int, cap_n: int,
                row_bytes, fixed_bytes) -> Tuple[int, int]:
    """(mb, nb) whose Mosaic working set fits the scoped-VMEM budget.

    row_bytes(nb) / fixed_bytes(nb) are callables modelling bytes per
    token row and nb-dependent fixed cost, BOTH including the 2x
    double-buffering of streamed blocks (a single-counted model produced
    a 17.3M > 16M rejection at 14B widths — real-compiler AOT)."""
    nb = _pick_block(n, cap_n)
    # keep the nb-dependent fixed cost (the resident weight block) at or
    # under half the budget before squeezing the token dim — a tiny mb
    # starves the MXU harder than a narrower nb does
    while fixed_bytes(nb) > _VMEM_BUDGET // 2:
        nxt = _pick_block(n, nb // 2)
        if nxt >= nb:
            break
        nb = nxt
    mb = _pick_block(s, cap_m, 8)
    while fixed_bytes(nb) + mb * row_bytes(nb) > _VMEM_BUDGET:
        nxt = _pick_block(s, mb // 2, 8)
        if nxt < mb:
            mb = nxt
            continue
        nn = _pick_block(n, nb // 2)
        if nn >= nb:
            break
        nb = nn
    return mb, nb


# ---------------------------------------------------------------------------
# kernel 1: LN -> AdaLN modulate -> GEMM (+bias)


def _ln_mod_kernel(x_ref, sc_ref, sh_ref, w_ref, b_ref, o_ref, *, eps):
    x = x_ref[0]                                     # [Mb, K] f32
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    h = xn * (1.0 + sc_ref[0]) + sh_ref[0]           # mods: [1, K] blocks
    acc = jax.lax.dot_general(
        h.astype(jnp.bfloat16), w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    # match models.wan_dit._linear: dot result in bf16, bias added in bf16
    o_ref[0] = acc.astype(jnp.bfloat16) + b_ref[0].astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "interpret", "eps"))
def ln_mod_gemm(
    x: jnp.ndarray,          # [B, S, K] fp32 residual stream
    scale: jnp.ndarray,      # [B, K] AdaLN scale (e_ff_scale / e_sa_scale)
    shift: jnp.ndarray,      # [B, K]
    w: jnp.ndarray,          # [K, N] bf16
    b: jnp.ndarray,          # [N]
    eps: float = 1e-6,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """layer_norm(x)·(1+scale)+shift, then @w + b — one pass, bf16 out."""
    bsz, s, k = x.shape
    n = w.shape[-1]
    # rows: x f32 (2x streamed) + bf16 cast + out (2x) + acc;
    # fixed: w block (2x) + modulation vectors
    mb, nb = _fit_blocks(
        s, n, block_m, block_n,
        row_bytes=lambda nb: k * 10 + nb * 8,
        fixed_bytes=lambda nb: k * nb * 4 + 4 * k * 4)
    grid = (bsz, s // mb, n // nb)
    return pl.pallas_call(
        functools.partial(_ln_mod_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, mb, k), lambda bi, mi, ni: (bi, mi, 0)),
            # per-batch vectors carry a singleton middle dim so the block's
            # last-two-dims satisfy the (8, 128)-or-whole-array rule
            pl.BlockSpec((1, 1, k), lambda bi, mi, ni: (bi, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda bi, mi, ni: (bi, 0, 0)),
            pl.BlockSpec((k, nb), lambda bi, mi, ni: (0, ni)),
            # bias as [1, N]: 1-D bf16 operands get a mismatched XLA
            # tiled layout ("does not match Mosaic layout", AOT-observed)
            pl.BlockSpec((1, nb), lambda bi, mi, ni: (0, ni)),
        ],
        out_specs=pl.BlockSpec((1, mb, nb),
                               lambda bi, mi, ni: (bi, mi, ni)),
        out_shape=jax.ShapeDtypeStruct((bsz, s, n), jnp.bfloat16),
        interpret=interpret,
    )(x.astype(jnp.float32), scale.astype(jnp.float32)[:, None],
      shift.astype(jnp.float32)[:, None], w.astype(jnp.bfloat16),
      b.astype(jnp.bfloat16)[None])


# ---------------------------------------------------------------------------
# kernel 2: GELU -> GEMM (+bias) -> gated residual add


def _gelu_gemm_kernel(m_ref, w_ref, b_ref, g_ref, r_ref, o_ref, acc_ref,
                      *, nk, out_dtype, apply_gelu):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if apply_gelu:
        mid = _gelu_tanh(m_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    else:
        mid = m_ref[0].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        mid, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    @pl.when(ki == nk - 1)
    def _():
        y = acc_ref[...].astype(jnp.bfloat16) + b_ref[0].astype(
            jnp.bfloat16)
        out = r_ref[0] + y.astype(jnp.float32) * g_ref[0]  # gate: [1, Nb]
        o_ref[0] = out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "block_m", "block_n", "block_k", "interpret", "out_dtype",
    "apply_gelu"))
def gelu_gemm_gate_add(
    mid: jnp.ndarray,        # [B, S, F] raw fc1 output (pre-GELU), bf16
    w: jnp.ndarray,          # [F, N] bf16
    b: jnp.ndarray,          # [N]
    gate: jnp.ndarray,       # [B, N] AdaLN gate (e_ff_gate)
    residual: jnp.ndarray,   # [B, S, N] fp32 residual stream
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 1536,
    interpret: bool = False,
    out_dtype=jnp.float32,
    apply_gelu: bool = True,
) -> jnp.ndarray:
    """residual + (act(mid) @ w + b)·gate — the fc2 half of the FFN with
    the gated residual update fused into the epilogue. apply_gelu=False
    turns it into a plain projection + gated residual add (the
    attention o-proj epilogue)."""
    bsz, s, f = mid.shape
    n = w.shape[-1]
    kb = _pick_block(f, block_k)
    # rows: mid chunk bf16 (2x streamed) + f32 gelu temp + acc f32 +
    # res f32 (2x) + out (2x); fixed: w chunk (2x) + bias/gate
    mb, nb = _fit_blocks(
        s, n, block_m, block_n,
        row_bytes=lambda nb: kb * 8 + nb * 20,
        fixed_bytes=lambda nb: kb * nb * 4 + nb * 16)
    nk = f // kb
    grid = (bsz, s // mb, n // nb, nk)
    return pl.pallas_call(
        functools.partial(_gelu_gemm_kernel, nk=nk, out_dtype=out_dtype,
                          apply_gelu=apply_gelu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, mb, kb), lambda bi, mi, ni, ki: (bi, mi, ki)),
            pl.BlockSpec((kb, nb), lambda bi, mi, ni, ki: (ki, ni)),
            pl.BlockSpec((1, nb), lambda bi, mi, ni, ki: (0, ni)),
            pl.BlockSpec((1, 1, nb), lambda bi, mi, ni, ki: (bi, 0, ni)),
            pl.BlockSpec((1, mb, nb), lambda bi, mi, ni, ki: (bi, mi, ni)),
        ],
        out_specs=pl.BlockSpec((1, mb, nb),
                               lambda bi, mi, ni, ki: (bi, mi, ni)),
        out_shape=jax.ShapeDtypeStruct((bsz, s, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((mb, nb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(mid.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
      b.astype(jnp.bfloat16)[None],
      gate.astype(jnp.float32)[:, None], residual.astype(jnp.float32))


# ---------------------------------------------------------------------------
# block-level wrapper


def fused_adaln_ffn(
    x: jnp.ndarray,          # [B, S, dim] fp32 residual stream
    scale: jnp.ndarray,      # [B, 1, dim]
    shift: jnp.ndarray,      # [B, 1, dim]
    gate: jnp.ndarray,       # [B, 1, dim]
    fc1: dict, fc2: dict,    # {"w", "b"} params
    eps: float = 1e-6,
    residual_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """The full FFN half of a Wan block (model.py:305-330) in two fused
    kernels; returns the updated residual stream."""
    mid = ln_mod_gemm(x, scale[:, 0], shift[:, 0],
                      fc1["w"], fc1["b"], eps=eps, interpret=interpret)
    return gelu_gemm_gate_add(mid, fc2["w"], fc2["b"], gate[:, 0], x,
                              interpret=interpret,
                              out_dtype=residual_dtype)


def resolve_ffn_impl(requested: str = "auto", mesh=None) -> str:
    """Serving-path resolution. Measured on the real v5e chip
    (REPORTS/perf_r3.md A/B, 1.3B fused-CFG step): the fused kernels
    LOSE to XLA's own GEMM+epilogue fusions — 4205 ms vs 3957 ms
    baseline — so "auto" resolves to XLA everywhere. The kernels remain
    available as an explicit opt-in ("pallas") for future-hardware
    re-evaluation; they are forward-only, and bare pallas_calls cannot
    be GSPMD-partitioned, so "pallas" under an active mesh is rejected
    here with a clear error instead of a confusing Mosaic one."""
    if requested == "pallas" and mesh is not None and not mesh.empty:
        raise ValueError(
            "ffn_impl='pallas' is single-chip only: bare pallas_call "
            "kernels cannot be GSPMD-partitioned under a mesh "
            "(Mosaic: 'Mosaic kernels cannot be automatically "
            "partitioned'). Use ffn_impl='xla' on mesh runs.")
    if requested != "auto":
        return requested
    return "xla"
