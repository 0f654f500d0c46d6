"""Normalisation + AdaLN modulation primitives.

Reference semantics:
  - WanRMSNorm (model.py:72-88): x * rsqrt(mean(x^2) + eps) * weight,
    statistics in fp32, output cast back to input dtype.
  - WanLayerNorm (model.py:91-104): fp32 LayerNorm, optionally affine.
  - T5LayerNorm (t5.py:53-66): RMS-style (no mean subtraction), fp32 stats.
  - AdaLN (model.py:288-296): per-block modulation table + time-projected
    e0, chunked into shift/scale/gate — all in fp32.

These are plain jnp functions: XLA fuses them into neighbouring matmuls,
which is exactly the HBM-bandwidth win the reference got from nothing.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None,
             eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm with fp32 statistics, result in x.dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(dtype)


def layer_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None, eps: float = 1e-6,
               out_dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """LayerNorm with fp32 statistics; output cast to `out_dtype`
    (default: x.dtype). Pass jnp.float32 to keep the AdaLN path in fp32
    until the next matmul."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype if out_dtype is not None else x.dtype)


def adaln_modulate(x: jnp.ndarray, shift: jnp.ndarray,
                   scale: jnp.ndarray) -> jnp.ndarray:
    """x * (1 + scale) + shift, computed in fp32 (model.py:291,327)."""
    xf = x.astype(jnp.float32)
    return xf * (1.0 + scale.astype(jnp.float32)) + shift.astype(jnp.float32)
