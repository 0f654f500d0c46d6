"""Fused RMSnorm → SiLU → causal 3x3x3 conv as a Pallas TPU kernel.

This is the VAE decoder's hot op (reference wan/modules/vae.py:186-221:
every residual block is norm → SiLU → CausalConv3d twice). The XLA
lowering pays, per conv, a full HBM round-trip for the norm, another for
the SiLU, a relayout copy of the streaming-cache concat, and a halo pad —
measured ~50% of streaming-decode wall time at 480x832 (REPORTS/perf_r3).

Kernel design (one pass over the tile, everything resident in VMEM):
  - grid over (batch, H tiles); W and T (≤4 frames/chunk) stay whole per
    block. The H tile is read with a +2 halo via all-`pl.Element`
    BlockSpecs (overlapping element-offset windows) from an input the
    caller zero-pads by 1 — the reference's SAME spatial padding
    (vae.py:17-35). H is a third-minor dimension, so the overlapping
    block needs no (8, 128) alignment; W and C stay whole-array.
  - channel RMS-norm (vae.py:39-54) and SiLU are computed in fp32 on the
    fly; the activated tile is concatenated with the 2-frame streaming
    cache (already activated, matching `_causal_conv_step` semantics).
  - the 27-tap conv becomes K-packed matmuls over W chunks:
    im2col into a [T·th·wc, 27·Cin] VMEM scratch, then
    Xc @ W2[27·Cin, Cout] with fp32 accumulation. K = 27·Cin ≥ 2592
    keeps the MXU K-dimension full where a per-tap [.,C]@[C,C] loop
    would run at C/128 lane fill.
  - the updated cache (last 2 activated frames) is a second output —
    the streaming scan carries it to the next chunk.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 11 * 1024 * 1024   # headroom under the 16 MB scoped limit:
# the fits() model undercounts Mosaic's stack (a 13M budget produced a
# 17.18M allocation at 480x840x96 t=1 — real-compiler AOT, 2026-08-18)


def _silu_rms(x_f32, gamma, c):
    """reference RMS_norm (vae.py:39-54): F.normalize * sqrt(C) * gamma,
    then SiLU — with the same rounding points as models/vae.py
    (_rms_norm_channel casts to bf16 BEFORE the SiLU)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x_f32), axis=-1, keepdims=True))
    y = x_f32 * (math.sqrt(c) / jnp.maximum(norm, 1e-12))
    y = (y * gamma).astype(jnp.bfloat16)
    # sigmoid in f32: Mosaic rejects the f32-scalar -> bf16-vector
    # broadcast inside sigmoid(bf16); the bf16 rounding point above is
    # what parity with models/vae.py cares about
    yf = y.astype(jnp.float32)
    return (yf * jax.nn.sigmoid(yf)).astype(jnp.bfloat16)


def _kernel(gamma_ref, w_ref, b_ref, x_ref, cache_ref, *refs,
            t, th, wc, cin, cout, out_dtype, add_residual):
    # x_ref: [1, T, th+2, wc+2, Cin] raw halo window;
    # cache_ref: [1, 2, th+2, wc+2, Cin] activated history window
    if add_residual:
        res_ref, y_ref, ctail_ref, xc_ref = refs
    else:
        y_ref, ctail_ref, xc_ref = refs
        res_ref = None
    x = x_ref[0].astype(jnp.float32)
    a = _silu_rms(x, gamma_ref[...].astype(jnp.float32), cin
                  ).astype(jnp.bfloat16)
    xin = jnp.concatenate([cache_ref[0].astype(jnp.bfloat16), a], axis=0)
    bias = b_ref[...].astype(jnp.float32)
    # im2col: column block (dt, dy, dx) = the tap's shifted window
    idx = 0
    for dt in range(3):
        for dy in range(3):
            for dx in range(3):
                tap = xin[dt:dt + t, dy:dy + th, dx:dx + wc, :]
                xc_ref[:, idx * cin:(idx + 1) * cin] = tap.reshape(
                    t * th * wc, cin)
                idx += 1
    acc = jax.lax.dot_general(
        xc_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    acc = (acc + bias).reshape(t, th, wc, cout)
    if add_residual:
        # fused resblock identity skip (vae.py:186-221): the caller
        # passes the BLOCK input (not this conv's input) as res_ref
        acc = acc + res_ref[0].astype(jnp.float32)
    y_ref[0] = acc.astype(out_dtype)
    # updated streaming cache: last 2 frames of the activated input
    # stream (works for t == 1, where one frame comes from the old cache)
    ctail_ref[0] = xin[t:t + 2, 1:1 + th, 1:1 + wc, :].astype(
        jnp.bfloat16)


def _pick_tiles(t: int, h: int, w: int, cin: int, cout: int
                ) -> Tuple[int, int]:
    """(th, wc): H tile height and inner im2col W-chunk width whose
    working set fits the VMEM budget.

    wc is constrained to multiples of 16: the kernel's im2col collapse
    `[t, th, wc, cin] -> [t*th*wc, cin]` is only a free tile-row
    concatenation for Mosaic when the second-minor dim is sublane-tile
    aligned (bf16 packs (16, 128)); unaligned wc is REJECTED by the
    Mosaic vector-layout pass ("unsupported shape cast", observed at
    wc=53). The caller pads W up to a wc multiple and the grid tiles W,
    so wc need not divide w.

    The budget model counts the per-grid-step streamed windows AND the
    im2col scratch TWICE (Mosaic double-buffers streamed blocks for
    pipelining and keeps a second copy of the scratch across the tap
    loop: a single-counted model produced a 16.76M > 16M scoped-vmem
    rejection at 240x424x192, and a scratch-counted-once model a
    19.08M > 16M rejection on the REAL compiler at t=1 240x416
    96->192 with (th=8, wc=128) — model said 10.4M, Mosaic used
    19.08M, i.e. ~2x the 5.3M scratch on top)."""
    w_bytes = 27 * cin * cout * 2
    chunks = [wc for wc in range(256, 0, -16)]

    def fits(th, wc):
        xc = t * th * wc * 27 * cin * 2
        xin = (t + 2) * (th + 2) * (wc + 2) * cin * 2      # raw + cache win
        act = t * (th + 2) * (wc + 2) * cin * 2 * 2        # a + concat copy
        acc = t * th * wc * cout * 4
        out = 2 * t * th * wc * cout * 2     # output + optional residual
        tail = 2 * th * wc * cin * 2
        return (w_bytes + 2 * xc + act
                + 2 * (xin + out + tail) + acc) <= VMEM_BUDGET

    for th in (8, 4, 2, 1):
        if th > h:
            continue
        for wc in chunks:
            if t * th * wc >= 128 and fits(th, wc):
                return th, wc
    # tiny fallback: smallest chunk that fits
    for th in (2, 1):
        for wc in chunks:
            if fits(th, wc):
                return th, wc
    raise ValueError(f"no tile fits VMEM for C={cin}->{cout} at W={w}")


def fused_viable(t: int, h: int, w: int, cin: int, cout: int) -> bool:
    """True when the fused kernel's tiling gives the MXU a healthy
    streaming dimension (M = t·th·wc ≥ 128). At Cin=384 the resident
    [27·Cin, Cout] weights squeeze the im2col scratch until M drops to
    ~52 — XLA's conv is the better choice there until the dt-split
    kernel variant lands."""
    try:
        th, wc = _pick_tiles(t, h, w, cin, cout)
    except ValueError:
        return False
    return t * th * wc >= 128


def pack_conv_weights(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, 3, Cin, Cout] → K-packed [27·Cin, Cout] bf16 (row order
    (dt, dy, dx, ci) matches the kernel's im2col column order). Do this
    OUTSIDE any lax.scan: XLA does not hoist loop-invariant transforms."""
    kt, kh, kw, cin, cout = w.shape
    return w.reshape(kt * kh * kw * cin, cout).astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("tile_h", "tile_w", "interpret", "out_dtype"))
def fused_act_causal_conv3d(
    x: jnp.ndarray,                 # [B, T, H, W, Cin] pre-activation
    cache: jnp.ndarray,             # [B, 2, H, W, Cin] activated history
    gamma: jnp.ndarray,             # [Cin]
    w2: jnp.ndarray,                # [27·Cin, Cout] (pack_conv_weights)
    b: jnp.ndarray,                 # [Cout]
    residual: Optional[jnp.ndarray] = None,   # [B, T, H, W, Cout]
    tile_h: Optional[int] = None,
    tile_w: Optional[int] = None,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (conv output [B, T, H, W, Cout],
    updated cache = activated last 2 frames [B, 2, H, W, Cin]).

    residual: fuses the resblock skip (+residual) into the epilogue."""
    add_residual = residual is not None
    bsz, t, h, wd, cin = x.shape
    cout = w2.shape[-1]
    if tile_h is None or tile_w is None:
        tile_h, tile_w = _pick_tiles(t, h, wd, cin, cout)
    th, wc = tile_h, tile_w
    nh = -(-h // th)
    nw = -(-wd // wc)
    wp = nw * wc                    # W padded to a wc multiple (Mosaic
                                    # sublane-aligned im2col collapse)

    # zero-pad: +1 spatial halo on each side; H up to a th multiple and
    # W up to a wc multiple
    # W halo windows are wc+8 wide (Mosaic requires the second-minor
    # block dim divisible by 8; the kernel reads only the first wc+2
    # columns), so the padded array needs wp+8 columns total.
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + nh * th - h),
                     (1, 7 + wp - wd), (0, 0)))
    cp = jnp.pad(cache, ((0, 0), (0, 0), (1, 1 + nh * th - h),
                         (1, 7 + wp - wd), (0, 0)))

    # overlapping H/W-halo reads: all-Element specs (element offsets);
    # W offsets land on wc (16-aligned) boundaries, C stays whole
    def halo_spec(nt):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(nt), pl.Element(th + 2),
             pl.Element(wc + 8), pl.Element(cin)),
            lambda bi, i, j: (bi, 0, i * th, j * wc, 0))

    in_specs = [
        pl.BlockSpec((cin,), lambda bi, i, j: (0,)),
        pl.BlockSpec((27 * cin, cout), lambda bi, i, j: (0, 0)),
        pl.BlockSpec((cout,), lambda bi, i, j: (0,)),
        halo_spec(t),
        halo_spec(2),
    ]
    inputs = [gamma, w2, b, xp, cp]
    if add_residual:
        rp = jnp.pad(residual, ((0, 0), (0, 0), (0, nh * th - h),
                                (0, wp - wd), (0, 0)))
        in_specs.append(pl.BlockSpec((1, t, th, wc, cout),
                                     lambda bi, i, j: (bi, 0, i, j, 0)))
        inputs.append(rp)

    y, ctail = pl.pallas_call(
        functools.partial(_kernel, t=t, th=th, wc=wc, cin=cin,
                          cout=cout, out_dtype=out_dtype,
                          add_residual=add_residual),
        grid=(bsz, nh, nw),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, t, th, wc, cout),
                         lambda bi, i, j: (bi, 0, i, j, 0)),
            pl.BlockSpec((1, 2, th, wc, cin),
                         lambda bi, i, j: (bi, 0, i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, t, nh * th, wp, cout), out_dtype),
            jax.ShapeDtypeStruct((bsz, 2, nh * th, wp, cin),
                                 jnp.bfloat16),
        ],
        scratch_shapes=[pltpu.VMEM((t * th * wc, 27 * cin), jnp.bfloat16)],
        interpret=interpret,
    )(*inputs)
    return y[:, :, :h, :wd], ctail[:, :, :h, :wd]


# ---------------------------------------------------------------------------
# fused nearest-2x upsample + 3x3 conv (decoder Resample, vae.py:66-140)


def pack_upsample_weights(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Cin, Cout] SAME conv kernel at 2x-nearest-upsampled
    resolution → 4 parity kernels [2, 2, 2, 2, Cin, Cout] ((a, b) output
    parity, (p, q) low-res tap): nearest upsampling means the 3x3
    high-res window holds only 2x2 DISTINCT low-res values, so
    upsample→conv collapses to four 2x2 convs on the LOW-res grid —
    4/9 the MACs and no high-res broadcast. Derivation: output row
    2i+a reads high-res rows 2i+a-1+u, u∈0..2, which floor-div to
    low-res rows {i-1+a+p}: a=0 → p0←u0, p1←u1+u2; a=1 → p0←u0+u1,
    p1←u2 (same for columns)."""
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 2, 2, cin, cout), w.dtype)
    rmap = {0: ((0, 0), (1, 1), (1, 2)),   # a=0: (p, u) pairs
            1: ((0, 0), (0, 1), (1, 2))}   # a=1
    for a in (0, 1):
        for b in (0, 1):
            for p, u in rmap[a]:
                for q, v in rmap[b]:
                    out = out.at[a, b, p, q].add(w[u, v])
    return out.reshape(2, 2, 4 * cin, cout).astype(jnp.bfloat16)


def _up_kernel(w_ref, b_ref, x_ref, y_ref, xc_ref, *, t, th, wc,
               cin, cout, out_dtype):
    # x_ref: [1, T, th+2, wc+2, Cin] low-res halo window
    x = x_ref[0].astype(jnp.bfloat16)
    bias = b_ref[...].astype(jnp.float32)
    quad = []
    for a in (0, 1):
        for b in (0, 1):
            idx = 0
            for p in (0, 1):
                for q in (0, 1):
                    tap = x[:, a + p:a + p + th, b + q:b + q + wc, :]
                    xc_ref[:, idx * cin:(idx + 1) * cin] = tap.reshape(
                        t * th * wc, cin)
                    idx += 1
            acc = jax.lax.dot_general(
                xc_ref[...], w_ref[a, b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            quad.append((acc + bias).reshape(t, th, wc, cout))
    # interleave parities in VMEM: [T, th, 2, wc, 2, Co] → hi-res tile
    row0 = jnp.stack([quad[0], quad[1]], axis=3)       # a=0: (b0, b1)
    row1 = jnp.stack([quad[2], quad[3]], axis=3)
    tile = jnp.stack([row0, row1], axis=2)             # [T,th,2,wc,2,Co]
    y_ref[0] = tile.reshape(t, 2 * th, 2 * wc, cout).astype(out_dtype)


def _pick_up_tiles(t: int, h: int, w: int, cin: int, cout: int
                   ) -> Tuple[int, int]:
    """wc multiples of 16 for the same Mosaic sublane-alignment reason
    as _pick_tiles; the caller pads w up to a wc multiple."""
    w_bytes = 4 * 4 * cin * cout * 2
    chunks = [wc for wc in range(256, 0, -16)]

    def fits(th, wc):
        # _up_kernel uses the same tap-loop im2col scratch pattern as
        # _kernel, which the REAL compiler was proven to double-buffer
        # (see _pick_tiles' 19.08M-vs-10.4M rejection) — count xc twice
        # here too.
        xc = 2 * (t * th * wc * 4 * cin * 2)
        xin = t * (th + 2) * (wc + 2) * cin * 2 * 2
        acc = 4 * t * th * wc * cout * 4 * 2   # quad + stacked copies
        out = t * 2 * th * 2 * wc * cout * 2
        return w_bytes + xc + 2 * (xin + out) + acc <= VMEM_BUDGET

    for th in (8, 4, 2, 1):
        if th > h:
            continue
        for wc in chunks:
            if t * th * wc >= 128 and fits(th, wc):
                return th, wc
    for th in (2, 1):
        for wc in chunks:
            if fits(th, wc):
                return th, wc
    raise ValueError(f"no upsample tile fits VMEM for C={cin}->{cout}")


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "interpret",
                              "out_dtype"))
def fused_upsample_conv2d(
    x: jnp.ndarray,                 # [B, T, h, w, Cin] low-res
    w4: jnp.ndarray,                # [2, 2, 4·Cin, Cout] (pack_upsample_weights)
    b: jnp.ndarray,                 # [Cout]
    tile_h: Optional[int] = None,
    tile_w: Optional[int] = None,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """nearest-2x upsample + SAME 3x3 conv in one pass:
    [B, T, h, w, Cin] → [B, T, 2h, 2w, Cout]."""
    bsz, t, h, wd, cin = x.shape
    cout = w4.shape[-1]
    if tile_h is None or tile_w is None:
        tile_h, tile_w = _pick_up_tiles(t, h, wd, cin, cout)
    th, wc = tile_h, tile_w
    nh = -(-h // th)
    nw = -(-wd // wc)
    wp = nw * wc

    # wc+8-wide windows for the same Mosaic divisibility rule as
    # fused_act_causal_conv3d (only the first wc+2 columns are read)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + nh * th - h),
                     (1, 7 + wp - wd), (0, 0)))

    halo = pl.BlockSpec(
        (pl.Element(1), pl.Element(t), pl.Element(th + 2),
         pl.Element(wc + 8), pl.Element(cin)),
        lambda bi, i, j: (bi, 0, i * th, j * wc, 0))

    y = pl.pallas_call(
        functools.partial(_up_kernel, t=t, th=th, wc=wc, cin=cin,
                          cout=cout, out_dtype=out_dtype),
        grid=(bsz, nh, nw),
        in_specs=[
            pl.BlockSpec((2, 2, 4 * cin, cout),
                         lambda bi, i, j: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda bi, i, j: (0,)),
            halo,
        ],
        out_specs=pl.BlockSpec((1, t, 2 * th, 2 * wc, cout),
                               lambda bi, i, j: (bi, 0, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t, 2 * nh * th, 2 * wp, cout),
                                       out_dtype),
        scratch_shapes=[pltpu.VMEM((t * th * wc, 4 * cin), jnp.bfloat16)],
        interpret=interpret,
    )(w4, b, xp)
    return y[:, :, :2 * h, :2 * wd]
