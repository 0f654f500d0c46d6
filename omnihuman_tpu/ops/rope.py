"""3D factorized rotary position embeddings (RoPE) for video tokens.

Capability parity with reference wan/modules/model.py:31-69
(`rope_params`/`rope_apply`): the head dimension d is split
(d - 4*(d//6), 2*(d//6), 2*(d//6)) across the (frame, height, width) axes
of the latent-token grid; a token at grid position (fi, hi, wi) is rotated
by the concatenated per-axis angles; rotation acts on ADJACENT value pairs
(x[2j], x[2j+1]).

TPU-first redesign (SURVEY §7.1):
  - The reference materialises a complex-float64 table and loops over the
    batch in Python (model.py:49-69) — slow and unjittable. Here angles are
    real fp32 sin/cos tables computed once per (F, H, W) grid, the rotation
    is a vectorised multiply-add fused by XLA into the surrounding matmuls.
  - Sequence-parallel shards index the table by GLOBAL token offset
    (`shard_offset`), replacing the reference's pad-and-slice hack
    (xdit_context_parallel.py:52-57).
  - Padded tokens (beyond F*H*W) get identity rotation (cos=1, sin=0),
    matching the reference's concat of un-rotated padding (model.py:64).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_dim_split(head_dim: int) -> Tuple[int, int, int]:
    """Per-axis pair counts (f_pairs, h_pairs, w_pairs); sums to head_dim//2."""
    c = head_dim // 2
    m = c // 3
    return c - 2 * m, m, m


@functools.lru_cache(maxsize=32)
def _axis_inv_freq(pairs: int, theta: float) -> np.ndarray:
    """inv_freq[j] = theta^(-2j / (2*pairs)) — per-axis frequency ladder."""
    dim = 2 * pairs
    return theta ** (-np.arange(0, dim, 2, dtype=np.float64) / dim)


def rope_angles_3d(
    grid: Tuple[int, int, int],
    head_dim: int,
    theta: float = 10000.0,
    seq_len: Optional[int] = None,
    shard_offset: int = 0,
    shard_len: Optional[int] = None,
    time_offset: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sin, cos) tables of shape [L, head_dim//2] for a token grid.

    Args:
      grid: (F, H, W) latent-token grid (post patch-embed).
      seq_len: padded sequence length; positions >= F*H*W get identity.
      shard_offset/shard_len: slice [offset, offset+len) of the GLOBAL
        table — how an `sp` shard obtains its RoPE without padding hacks.
      time_offset: added to the frame index — used for long-video extension
        and for OmniHuman reference-frame packing ("zero-t RoPE" places the
        reference image at a fixed frame index).
    """
    f, h, w = grid
    n_tokens = f * h * w
    total = seq_len if seq_len is not None else n_tokens

    fp, hp, wp = rope_dim_split(head_dim)
    # per-token angle = position * inv_freq, factorized per axis
    f_ang = np.arange(f, dtype=np.float64)[:, None] + float(time_offset)
    f_ang = f_ang * _axis_inv_freq(fp, theta)[None, :]          # [F, fp]
    h_ang = np.arange(h, dtype=np.float64)[:, None] * _axis_inv_freq(hp, theta)
    w_ang = np.arange(w, dtype=np.float64)[:, None] * _axis_inv_freq(wp, theta)

    ang = np.concatenate([
        np.broadcast_to(f_ang[:, None, None, :], (f, h, w, fp)),
        np.broadcast_to(h_ang[None, :, None, :], (f, h, w, hp)),
        np.broadcast_to(w_ang[None, None, :, :], (f, h, w, wp)),
    ], axis=-1).reshape(n_tokens, head_dim // 2)

    if total > n_tokens:  # identity rotation on padding
        ang = np.concatenate(
            [ang, np.zeros((total - n_tokens, head_dim // 2))], axis=0)

    if shard_len is not None:
        ang = ang[shard_offset:shard_offset + shard_len]

    return (jnp.asarray(np.sin(ang), dtype=jnp.float32),
            jnp.asarray(np.cos(ang), dtype=jnp.float32))


def apply_rope(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray,
               inverse: bool = False) -> jnp.ndarray:
    """Rotate adjacent pairs of x by the given tables.

    x: [..., L, N, D] (sequence, heads, head_dim); sin/cos: [L, D//2].
    Rotation in fp32, result cast back to x.dtype. inverse applies the
    transpose rotation (rotate by -angle).

    The pair swap is a matmul with a constant [D, D] permutation matrix
    rather than a reshape to [..., D//2, 2]: the trailing-2 view forces
    pathological T(2,128) tilings and ~250 ms/step of relayout copies in
    the 1.3B CFG step (profiled on v5e); the tiny MXU permutation
    (HIGHEST precision — exact, each output is one product by 1.0) keeps
    everything in the native lane layout and took the step from 4080 to
    3956 ms. Semantics are identical adjacent-pair (GPT-J / reference
    complex-mult, model.py:31-69) rotation.
    """
    dtype = x.dtype
    d = x.shape[-1]
    # full-width tables: c2 repeats each cos per pair, s2 = (-sin, +sin)
    sgn = -1.0 if inverse else 1.0
    c2 = jnp.repeat(cos, 2, axis=-1)                        # [L, D]
    s2 = jnp.stack([-sin * sgn, sin * sgn],
                   axis=-1).reshape(*sin.shape[:-1], d)     # [L, D]
    idx = np.arange(d)
    perm = np.zeros((d, d), np.float32)
    perm[idx, idx ^ 1] = 1.0                                # (2j <-> 2j+1)
    xs = jax.lax.dot_general(
        x, jnp.asarray(perm, x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    out = (x.astype(jnp.float32) * c2[..., :, None, :]
           + xs.astype(jnp.float32) * s2[..., :, None, :])
    return out.astype(dtype)


class Rope3D:
    """Cached sin/cos tables for one (grid, head_dim) configuration."""

    def __init__(self, grid: Tuple[int, int, int], head_dim: int,
                 seq_len: Optional[int] = None, theta: float = 10000.0,
                 shard_offset: int = 0, shard_len: Optional[int] = None,
                 time_offset: int = 0):
        self.grid = grid
        self.head_dim = head_dim
        self.sin, self.cos = rope_angles_3d(
            grid, head_dim, theta=theta, seq_len=seq_len,
            shard_offset=shard_offset, shard_len=shard_len,
            time_offset=time_offset)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return apply_rope(x, self.sin, self.cos)
