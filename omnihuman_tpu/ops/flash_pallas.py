"""Blockwise flash attention as Pallas TPU kernels (forward + backward).

This is the TPU-native replacement for the reference's flash-attn 2/3 CUDA
wheels (wan/modules/attention.py:94-127): online-softmax tiling so the
[Lq, Lk] score matrix never materialises in HBM, with varlen masking via
per-sample k_lens, optional causal and sliding-window masks.

Performance design:
  - Kernels index the NATIVE [B, L, N*D] activation layout directly via
    BlockSpec offsets (block (1, block_q, D) at last-dim block index n),
    so the [B,L,N,D] -> [B,N,L,D] transposes (3 full-tensor HBM round
    trips per attention at 32k tokens) disappear entirely.
  - D = 128 for every Wan model — exactly one lane tile; block_q/block_k
    default to 512 to keep the MXU fed and amortise the VPU softmax.
  - The log-sum-exp tensor is only produced under differentiation
    (custom_vjp fwd rule); plain inference skips the write.
  - Backward is the standard two-pass flash backward: dk/dv with k-blocks
    resident scanning q-blocks, then dq with q-blocks resident — no
    atomics.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1024   # fwd: ~124 TFLOP/s at 32k tokens on v5e
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30
# NEG_INF must stay FINITE: the hoisted per-block p-mask in the forward
# kernels relies on exp(s - m) with s == m == NEG_INF evaluating to
# exp(0) == 1 (then zeroed by the mask); with -inf it would be
# exp(nan) == nan and all-masked rows would corrupt the output.
import math as _math
assert _math.isfinite(NEG_INF), "NEG_INF must be finite (see comment)"
# softmax domain: exp2 (log2 domain) is cheaper on the VPU but measurably
# less accurate on this TPU generation; OMNIHUMAN_EXP2=1 opts in
import os as _os
USE_EXP2 = _os.environ.get("OMNIHUMAN_EXP2", "0") == "1"
LOG2E = 1.4426950408889634 if USE_EXP2 else 1.0
LN2 = 0.6931471805599453 if USE_EXP2 else 1.0
_exp = jnp.exp2 if USE_EXP2 else jnp.exp
_log = jnp.log2 if USE_EXP2 else jnp.log


def _block_sizes(lq: int, lk: int, bq: int, bk: int) -> Tuple[int, int]:
    return min(bq, lq), min(bk, lk)


def _pad_seq(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    rem = (-x.shape[1]) % mult
    if rem == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, rem), (0, 0)))


def _mask_block(iq, ik, block_q, block_k, k_len, lk_total, lq_total,
                causal: bool, window: Tuple[int, int],
                q_off=0, k_off=0):
    """Boolean [block_q, block_k] mask of valid (q, k) pairs.

    q_off/k_off (scalars, may be traced): GLOBAL index offsets of this
    call's q/k tokens — the sequence-parallel paths (ring chunks,
    sp-sharded queries) pass each block's home-shard offset so the
    causal/window diagonal is evaluated in global coordinates
    (VERDICT r4 item 7)."""
    q_idx = iq * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)
    k_idx = ik * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    mask = k_idx < k_len
    if causal or window != (-1, -1):
        qg = q_idx + q_off + (lk_total - lq_total)
        kg = k_idx + k_off
        if causal:
            mask &= kg <= qg
        left, right = window
        if left >= 0:
            mask &= (qg - kg) <= left
        if right >= 0:
            mask &= (kg - qg) <= right
    return mask


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(klen_ref, *args, scale, causal, window, lq_total,
                lk_total, block_q, block_k, num_k_blocks, precision,
                with_lse, with_offsets=False):
    # with_offsets=True threads a (2,) SMEM (q_off, k_off) scalar pair
    # for sequence-parallel global masks; the flag keeps the hot
    # (maskless) program IDENTICAL to the offset-free kernel — the
    # unconditional SMEM input measured a 88->118 ms regression at 32k
    if with_offsets:
        offs_ref, q_ref, k_ref, v_ref, *refs = args
        q_off, k_off = offs_ref[0], offs_ref[1]
    else:
        q_ref, k_ref, v_ref, *refs = args
        q_off = k_off = 0
    if with_lse:
        # m in lanes [0,64), l in [64,128) of ONE scratch buffer: two
        # separate 128-lane buffers push the with_lse unroll-2 config
        # 180 KB over the 16 MB scoped-VMEM limit. The lane-select write
        # costs ~7% — only the lse (training) path pays it; inference
        # keeps the two plain broadcast buffers.
        o_ref, lse_ref, ml_ref, acc_ref = refs
        lane = jax.lax.broadcasted_iota(jnp.int32, ml_ref.shape, 1)
        m_ld = lambda: ml_ref[:, 0]
        l_ld = lambda: ml_ref[:, 64]

        def ml_st(m_cur, l_cur):
            ml_ref[:] = jnp.where(lane < 64, m_cur[:, None], l_cur[:, None])

        def ml_init():
            ml_ref[:] = jnp.where(lane < 64, NEG_INF, 0.0)
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
        lse_ref = None
        m_ld = lambda: m_ref[:, 0]
        l_ld = lambda: l_ref[:, 0]

        def ml_st(m_cur, l_cur):
            m_ref[:] = jnp.broadcast_to(m_cur[:, None], m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_cur[:, None], l_ref.shape)

        def ml_init():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        ml_init()
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                          # [bq, D]
    k = k_ref[0]                          # [bk, D]
    v = v_ref[0]
    k_len = klen_ref[pl.program_id(0)]

    # scores scaled into the log2 domain: exp2 is cheaper than exp
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision) * (scale * LOG2E)
    # masking is free here — the kernel is pipeline-bound (a statically
    # maskless variant measured within noise at 32k tokens on v5e)
    mask = _mask_block(iq, ik, block_q, block_k, k_len,
                       lk_total, lq_total, causal, window, q_off, k_off)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ld()
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = _exp(m_prev - m_cur)
    # no p-side select: masked entries are NEG_INF - m_cur → exp
    # underflows to exactly 0 whenever the row has ANY valid key;
    # all-masked rows self-correct on the first real block via
    # alpha = exp(NEG_INF - m_real) = 0, and rows that never see a
    # valid key are zeroed in _finalize (m stays NEG_INF)
    p = _exp(s - m_cur[:, None])

    l_cur = l_ld() * alpha + jnp.sum(p, axis=-1)
    acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    ml_st(m_cur, l_cur)

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        l = l_ld()
        # rows with NO valid key keep m == NEG_INF (any valid key makes it
        # finite): zero them exactly — the per-block p-select they used to
        # rely on was hoisted out of the hot loop
        valid = m_ld() > NEG_INF * 0.5
        denom = jnp.where(l == 0.0, 1.0, l)
        o = acc_ref[:] / denom[:, None]
        o_ref[0] = jnp.where(valid[:, None], o, 0.0).astype(o_ref.dtype)
        if lse_ref is not None:
            # store the NATURAL-log lse for the backward kernels
            lse = jnp.where(valid, (m_ld() + _log(denom)) * LN2,
                            NEG_INF)
            lse_ref[0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[1:])


def _fwd_kernel_u2(klen_ref, *args, scale, causal, window, lq_total,
                   lk_total, block_q, block_k, num_k2_blocks, precision,
                   with_lse, with_offsets=False):
    """Unroll-by-2 forward: each grid step consumes TWO k-blocks with two
    independent q·k dots. The dot→softmax→dot chain of the plain kernel
    serialises MXU and VPU; here softmax(s0) overlaps the s1 dot and
    softmax(s1) overlaps the p0·v0 dot in the VLIW schedule — measured
    88.2 ms vs 97.5 ms (+10%, 150 TFLOP/s) at 32k tokens on v5e, and
    bit-identical to the sequential kernel (same merge order)."""
    if with_offsets:                      # see _fwd_kernel
        offs_ref, q_ref, k_ref, v_ref, *refs = args
        q_off, k_off = offs_ref[0], offs_ref[1]
    else:
        q_ref, k_ref, v_ref, *refs = args
        q_off = k_off = 0
    if with_lse:
        # merged m|l scratch: see _fwd_kernel — needed to fit scoped VMEM
        o_ref, lse_ref, ml_ref, acc_ref = refs
        lane = jax.lax.broadcasted_iota(jnp.int32, ml_ref.shape, 1)
        m_ld = lambda: ml_ref[:, 0]
        l_ld = lambda: ml_ref[:, 64]

        def ml_st(m_cur, l_cur):
            ml_ref[:] = jnp.where(lane < 64, m_cur[:, None], l_cur[:, None])

        def ml_init():
            ml_ref[:] = jnp.where(lane < 64, NEG_INF, 0.0)
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
        lse_ref = None
        m_ld = lambda: m_ref[:, 0]
        l_ld = lambda: l_ref[:, 0]

        def ml_st(m_cur, l_cur):
            m_ref[:] = jnp.broadcast_to(m_cur[:, None], m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_cur[:, None], l_ref.shape)

        def ml_init():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
    iq, ik2 = pl.program_id(2), pl.program_id(3)
    k_len = klen_ref[pl.program_id(0)]

    @pl.when(ik2 == 0)
    def _init():
        ml_init()
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k2 = k_ref[0]                        # [2*bk, D]
    v2 = v_ref[0]

    s0 = jax.lax.dot_general(
        q, k2[:block_k], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision) * (scale * LOG2E)
    s1 = jax.lax.dot_general(
        q, k2[block_k:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision) * (scale * LOG2E)
    s0 = jnp.where(_mask_block(iq, 2 * ik2, block_q, block_k, k_len,
                               lk_total, lq_total, causal, window,
                               q_off, k_off),
                   s0, NEG_INF)
    s1 = jnp.where(_mask_block(iq, 2 * ik2 + 1, block_q, block_k, k_len,
                               lk_total, lq_total, causal, window,
                               q_off, k_off),
                   s1, NEG_INF)

    m_prev = m_ld()
    m0 = jnp.maximum(m_prev, jnp.max(s0, axis=-1))
    a0 = _exp(m_prev - m0)
    p0 = _exp(s0 - m0[:, None])
    pv0 = jax.lax.dot_general(
        p0.astype(v2.dtype), v2[:block_k], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    m1 = jnp.maximum(m0, jnp.max(s1, axis=-1))
    a1 = _exp(m0 - m1)
    p1 = _exp(s1 - m1[:, None])
    pv1 = jax.lax.dot_general(
        p1.astype(v2.dtype), v2[block_k:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    l_cur = (l_ld() * a0 + jnp.sum(p0, -1)) * a1 + jnp.sum(p1, -1)
    acc_ref[:] = (acc_ref[:] * a0[:, None] + pv0) * a1[:, None] + pv1
    ml_st(m1, l_cur)

    @pl.when(ik2 == num_k2_blocks - 1)
    def _finalize():
        l = l_ld()
        valid = m_ld() > NEG_INF * 0.5
        denom = jnp.where(l == 0.0, 1.0, l)
        o = acc_ref[:] / denom[:, None]
        o_ref[0] = jnp.where(valid[:, None], o, 0.0).astype(o_ref.dtype)
        if lse_ref is not None:
            lse = jnp.where(valid, (m_ld() + _log(denom)) * LN2,
                            NEG_INF)
            lse_ref[0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[1:])


def _flash_fwd_nd(q, k, v, k_lens, scale, causal, window, block_q, block_k,
                  interpret, precision, with_lse, head_dim, offsets=None):
    """q/k/v: [B, L, N*D]; returns ([B, Lq, N*D], lse [B, N, Lq] | None).

    offsets: optional [2] int32 (q_off, k_off) — global index offsets for
    causal/window masking on sequence-parallel shards (_mask_block);
    None keeps the offset-free kernel (the hot serving program)."""
    with_offsets = offsets is not None
    b, lq, nd = q.shape
    lk = k.shape[1]
    d = head_dim
    n = nd // d
    block_q, block_k = _block_sizes(lq, lk, block_q, block_k)
    qp = _pad_seq(q, block_q)
    # the unroll-2 kernel (+10% on v5e) consumes k-blocks in pairs; K/V
    # pad to a 2*block_k multiple when more than one k-block exists
    unroll2 = lk > block_k
    kp = _pad_seq(k, 2 * block_k if unroll2 else block_k)
    vp = _pad_seq(v, 2 * block_k if unroll2 else block_k)
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    nq, nk = lq_p // block_q, lk_p // block_k

    if unroll2:
        kernel = functools.partial(
            _fwd_kernel_u2, scale=scale, causal=causal, window=window,
            lq_total=lq, lk_total=lk, block_q=block_q, block_k=block_k,
            num_k2_blocks=nk // 2, precision=precision, with_lse=with_lse,
            with_offsets=with_offsets)
        grid = (b, n, nq, nk // 2)
        kv_block = 2 * block_k
    else:
        kernel = functools.partial(
            _fwd_kernel, scale=scale, causal=causal, window=window,
            lq_total=lq, lk_total=lk, block_q=block_q, block_k=block_k,
            num_k_blocks=nk, precision=precision, with_lse=with_lse,
            with_offsets=with_offsets)
        grid = (b, n, nq, nk)
        kv_block = block_k

    in_specs = [
        pl.BlockSpec((b,), lambda b_, n_, iq, ik: (0,),
                     memory_space=pltpu.SMEM),
    ] + ([pl.BlockSpec((2,), lambda b_, n_, iq, ik: (0,),
                       memory_space=pltpu.SMEM)] if with_offsets else []
         ) + [
        pl.BlockSpec((1, block_q, d), lambda b_, n_, iq, ik: (b_, iq, n_)),
        pl.BlockSpec((1, kv_block, d), lambda b_, n_, iq, ik: (b_, ik, n_)),
        pl.BlockSpec((1, kv_block, d), lambda b_, n_, iq, ik: (b_, ik, n_)),
    ]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda b_, n_, iq, ik: (b_, iq, n_)),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, lq_p, nd), q.dtype)]
    if with_lse:
        out_specs.append(pl.BlockSpec(
            (1, block_q, 128),
            lambda b_, n_, iq, ik: (b_ * n + n_, iq, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((b * n, lq_p, 128), jnp.float32))

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=([pltpu.VMEM((block_q, 128), jnp.float32)]  # m|l
                        if with_lse else
                        [pltpu.VMEM((block_q, 128), jnp.float32),   # m
                         pltpu.VMEM((block_q, 128), jnp.float32)])  # l
                       + [pltpu.VMEM((block_q, d), jnp.float32)],   # acc
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * lq_p * lk_p * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * n * lq_p * lk_p,
        ),
        interpret=interpret,
    )(k_lens, *([offsets.astype(jnp.int32)] if with_offsets else []),
      qp, kp, vp)

    if with_lse:
        out, lse = res
        return out[:, :lq], lse[:, :lq, 0].reshape(b, n, lq)
    return res[0][:, :lq], None


# ---------------------------------------------------------------------------
# backward


def _bwd_dkdv_kernel(klen_ref, *args, scale, causal, window, lq_total,
                     lk_total, block_q, block_k, num_q_blocks, precision,
                     with_offsets=False):
    if with_offsets:                      # see _fwd_kernel
        offs_ref, *args = args
        q_off, k_off = offs_ref[0], offs_ref[1]
    else:
        q_off = k_off = 0
    (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
     dk_acc, dv_acc) = args
    ik, iq = pl.program_id(2), pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, 0]
    delta = delta_ref[0][:, 0]
    k_len = klen_ref[pl.program_id(0)]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision) * (scale * LOG2E)
    mask = _mask_block(iq, ik, block_q, block_k, k_len,
                       lk_total, lq_total, causal, window, q_off, k_off)
    p = jnp.where(mask, _exp(s - lse[:, None] * LOG2E), 0.0)

    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    ds = p * (dp - delta[:, None]) * scale
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(iq == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(klen_ref, *args, scale, causal, window, lq_total,
                   lk_total, block_q, block_k, num_k_blocks, precision,
                   with_offsets=False):
    if with_offsets:                      # see _fwd_kernel
        offs_ref, *args = args
        q_off, k_off = offs_ref[0], offs_ref[1]
    else:
        q_off = k_off = 0
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc = args
    iq, ik = pl.program_id(2), pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, 0]
    delta = delta_ref[0][:, 0]
    k_len = klen_ref[pl.program_id(0)]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision) * (scale * LOG2E)
    mask = _mask_block(iq, ik, block_q, block_k, k_len,
                       lk_total, lq_total, causal, window, q_off, k_off)
    p = jnp.where(mask, _exp(s - lse[:, None] * LOG2E), 0.0)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    ds = p * (dp - delta[:, None]) * scale
    dq_acc[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(ik == num_k_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd(res, g, scale, causal, window, block_q, block_k, interpret,
               precision, head_dim, offsets=None):
    q, k, v, k_lens, out, lse = res        # q [B, L, N*D]; lse [B, N, Lq]
    with_offsets = offsets is not None
    offs_args = [offsets.astype(jnp.int32)] if with_offsets else []
    b, lq, nd = q.shape
    lk = k.shape[1]
    d = head_dim
    n = nd // d
    # 1024x1024 fits scoped VMEM and runs 17% faster than the former
    # conservative 512 cap (161 -> 134 ms at 32k tokens on v5e)
    block_q, block_k = _block_sizes(lq, lk, min(block_q, 1024),
                                    min(block_k, 1024))

    # delta = rowsum(do * o) per head: [B, N, Lq]
    delta = jnp.sum(
        (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
            b, lq, n, d), axis=-1).transpose(0, 2, 1)

    qp = _pad_seq(q, block_q)
    dop = _pad_seq(g.astype(q.dtype), block_q)
    kp = _pad_seq(k, block_k)
    vp = _pad_seq(v, block_k)
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    nq, nk = lq_p // block_q, lk_p // block_k

    def pad_bn(x):  # [B, N, Lq] → [B*N, Lq_p, 128] lane-broadcast
        x = jnp.pad(x, ((0, 0), (0, 0), (0, lq_p - lq)))
        return jnp.broadcast_to(
            x.reshape(b * n, lq_p, 1), (b * n, lq_p, 128))

    lse_p = pad_bn(lse)
    delta_p = pad_bn(delta)

    klen_spec = pl.BlockSpec((b,), lambda b_, n_, i, j: (0,),
                             memory_space=pltpu.SMEM)
    offs_specs = ([pl.BlockSpec((2,), lambda b_, n_, i, j: (0,),
                                memory_space=pltpu.SMEM)]
                  if with_offsets else [])

    dkdv_kernel = functools.partial(
        _bwd_dkdv_kernel, scale=scale, causal=causal, window=window,
        lq_total=lq, lk_total=lk, block_q=block_q, block_k=block_k,
        num_q_blocks=nq, precision=precision, with_offsets=with_offsets)
    dk, dv = pl.pallas_call(
        dkdv_kernel,
        grid=(b, n, nk, nq),
        in_specs=[
            klen_spec,
        ] + offs_specs + [
            pl.BlockSpec((1, block_q, d),
                         lambda b_, n_, ik, iq: (b_, iq, n_)),
            pl.BlockSpec((1, block_k, d),
                         lambda b_, n_, ik, iq: (b_, ik, n_)),
            pl.BlockSpec((1, block_k, d),
                         lambda b_, n_, ik, iq: (b_, ik, n_)),
            pl.BlockSpec((1, block_q, d),
                         lambda b_, n_, ik, iq: (b_, iq, n_)),
            pl.BlockSpec((1, block_q, 128),
                         lambda b_, n_, ik, iq: (b_ * n + n_, iq, 0)),
            pl.BlockSpec((1, block_q, 128),
                         lambda b_, n_, ik, iq: (b_ * n + n_, iq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d),
                         lambda b_, n_, ik, iq: (b_, ik, n_)),
            pl.BlockSpec((1, block_k, d),
                         lambda b_, n_, ik, iq: (b_, ik, n_)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lk_p, nd), jnp.float32),
            jax.ShapeDtypeStruct((b, lk_p, nd), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(k_lens, *offs_args, qp, kp, vp, dop, lse_p, delta_p)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, scale=scale, causal=causal, window=window,
        lq_total=lq, lk_total=lk, block_q=block_q, block_k=block_k,
        num_k_blocks=nk, precision=precision, with_offsets=with_offsets)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, n, nq, nk),
        in_specs=[
            klen_spec,
        ] + offs_specs + [
            pl.BlockSpec((1, block_q, d),
                         lambda b_, n_, iq, ik: (b_, iq, n_)),
            pl.BlockSpec((1, block_k, d),
                         lambda b_, n_, iq, ik: (b_, ik, n_)),
            pl.BlockSpec((1, block_k, d),
                         lambda b_, n_, iq, ik: (b_, ik, n_)),
            pl.BlockSpec((1, block_q, d),
                         lambda b_, n_, iq, ik: (b_, iq, n_)),
            pl.BlockSpec((1, block_q, 128),
                         lambda b_, n_, iq, ik: (b_ * n + n_, iq, 0)),
            pl.BlockSpec((1, block_q, 128),
                         lambda b_, n_, iq, ik: (b_ * n + n_, iq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d),
                         lambda b_, n_, iq, ik: (b_, iq, n_)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, lq_p, nd), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(k_lens, *offs_args, qp, kp, vp, dop, lse_p, delta_p)[0]

    return (dq[:, :lq].astype(q.dtype),
            dk[:, :lk].astype(k.dtype),
            dv[:, :lk].astype(v.dtype))


# ---------------------------------------------------------------------------
# custom vjp over the [B, L, N*D] layout


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _flash(q, k, v, k_lens, offsets, scale, causal, window, block_q,
           block_k, interpret, precision, head_dim):
    out, _ = _flash_fwd_nd(q, k, v, k_lens, scale, causal, window,
                           block_q, block_k, interpret, precision,
                           with_lse=False, head_dim=head_dim,
                           offsets=offsets)
    return out


def _flash_fwd_rule(q, k, v, k_lens, offsets, scale, causal, window,
                    block_q, block_k, interpret, precision, head_dim):
    out, lse = _flash_fwd_nd(q, k, v, k_lens, scale, causal, window,
                             block_q, block_k, interpret, precision,
                             with_lse=True, head_dim=head_dim,
                             offsets=offsets)
    return out, (q, k, v, k_lens, offsets, out, lse)


def _flash_bwd_rule(scale, causal, window, block_q, block_k, interpret,
                    precision, head_dim, res, g):
    q, k, v, k_lens, offsets, out, lse = res
    dq, dk, dv = _flash_bwd((q, k, v, k_lens, out, lse), g, scale, causal,
                            window, block_q, block_k, interpret,
                            precision, head_dim, offsets=offsets)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# ---------------------------------------------------------------------------
# public entry (accepts the [B, L, N, D] layout of ops.attention)


def pallas_flash_attention(
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
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
    precision: jax.lax.Precision = jax.lax.Precision.DEFAULT,
    offsets: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flash attention on [B, L, N, D] inputs (reference layout).

    q_lens is accepted for parity; like the reference's varlen path, rows
    past q_lens[b] produce values the caller never reads, so no q-masking
    is required for correctness.

    offsets: optional [2] int32 (q_off, k_off) global index offsets for
    causal/window masks on sequence-parallel shards (_mask_block).
    """
    del q_lens
    b, lq, n, d = q.shape
    lk = k.shape[1]
    out_dtype = q.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if not interpret and d % 128 != 0:
        # compiled TPU path needs lane-aligned head_dim (every Wan model
        # has D=128); small test configs fall back to the dense path
        from omnihuman_tpu.ops.attention import attention_xla
        return attention_xla(
            q, k, v, k_lens=k_lens, softmax_scale=softmax_scale,
            q_scale=q_scale, causal=causal, window_size=window_size,
            compute_dtype=compute_dtype, offsets=offsets)

    scale = float(softmax_scale if softmax_scale is not None else d ** -0.5)
    qc = q.astype(compute_dtype)
    if q_scale is not None:
        qc = qc * jnp.asarray(q_scale, compute_dtype)

    # [B, L, N, D] → [B, L, N*D]: no data movement, undoes the caller's
    # head-split reshape
    qf = qc.reshape(b, lq, n * d)
    kf = k.astype(compute_dtype).reshape(b, lk, n * d)
    vf = v.astype(compute_dtype).reshape(b, lk, n * d)

    if k_lens is None:
        k_lens = jnp.full((b,), lk, dtype=jnp.int32)
    else:
        k_lens = jnp.minimum(k_lens.astype(jnp.int32), lk)

    if offsets is not None:
        offsets = offsets.astype(jnp.int32)
    out = _flash(qf, kf, vf, k_lens, offsets, scale, causal,
                 tuple(window_size), int(block_q), int(block_k),
                 bool(interpret), precision, d)
    return out.reshape(b, lq, n, d).astype(out_dtype)
