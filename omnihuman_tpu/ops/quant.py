"""int8 serving quantization for the DiT GEMMs (W8A8, dynamic per-token).

TPU-native perf feature with no reference counterpart: the v5e MXU runs
int8 dots at 2x the bf16 FLOP rate (394 TOPS vs 197 TFLOPS), and XLA:TPU
lowers `lax.dot_general(int8, int8, preferred_element_type=int32)`
straight onto it. Measured on chip at the Wan-1.3B fused-CFG serving
shapes ([65520, 1536] x [1536, 8960]): up to 293 TOP/s, 1.31-1.72x over
the 84%-efficient bf16 GEMMs; full CFG step 3632 ms vs 3854 fast /
3959 fp32, pixel gate PSNR 39.3 dB (REPORTS/perf_r4.md §7). int8
weights also halve the DiT's weight HBM traffic per step.

Scheme (standard W8A8 serving recipe):
  - weights: per-OUTPUT-channel symmetric int8, quantized ONCE at load
    (`quantize_wan_params`); the bf16/f32 `w` leaf is REPLACED by
    (`w_q` int8, `w_s` f32 scale) so HBM holds one copy.
  - activations: dynamic per-token symmetric int8 (amax over the feature
    axis), computed in fp32 inside the step; XLA fuses the quantize into
    the preceding elementwise op and the dequantize (row-scale x
    col-scale outer product) into the GEMM epilogue.
  - accumulation in int32, dequantized to fp32, bias added, cast back to
    the caller's activation dtype.

Only the transformer-block GEMMs are quantized (self/cross attention
projections + FFN) — embeddings, time/text MLPs, AdaLN modulation, norms,
the attention kernel itself, and the zero-init head stay in the
DTypePolicy dtypes. Training never uses this path (serving only).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# block sub-params that are GEMM weights (models/wan_dit.py:_block_init)
_ATTN_GEMMS = ("q", "k", "v", "o", "k_img", "v_img")


def quantize_weight(w: jnp.ndarray):
    """[..., d_in, d_out] float -> (int8 w_q, f32 per-out-channel scale).

    Symmetric: w ~= w_q * w_s[None, :]. Works on stacked-block leaves
    ([L, d_in, d_out]) because the reduction is over the d_in axis only.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)      # [..., 1, d_out]
    s = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return w_q, jnp.squeeze(s, axis=-2)                      # [..., d_out]


def int8_linear(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ w + b with int8 MXU GEMM; w given as (w_q, w_s).

    x: [..., d_in] any float dtype; returns x.dtype. Per-token dynamic
    activation quantization in fp32 (bf16 rounding would waste int8's
    resolution).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)      # [..., 1]
    sx = jnp.maximum(amax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, p["w_q"], (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * sx * p["w_s"].astype(jnp.float32)
    return (yf + p["b"].astype(jnp.float32)).astype(x.dtype)


def _quantize_linear(lin: Dict[str, Any]) -> Dict[str, Any]:
    w_q, w_s = quantize_weight(lin["w"])
    return {"w_q": w_q, "w_s": w_s, "b": lin["b"]}


def quantize_wan_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Replace the DiT block GEMM weights with int8 (w_q, w_s) leaves.

    Non-block params (patch/text/time embeds, head, img_emb) and non-GEMM
    block params (norms, modulation, audio adapters) pass through
    unchanged. The forward needs no flag: models/wan_dit.py `_linear`
    dispatches on the presence of `w_q`.

    Accepts both the wan layout ({"blocks": ...}) and the omni layout
    ({"base": {"blocks": ...}, "cond": ...} — omni/model.py:130) — only
    the embedded DiT blocks are quantized either way.
    """
    params = dict(params)
    if "blocks" not in params and "base" in params:
        params["base"] = quantize_wan_params(params["base"])
        return params
    blocks = dict(params["blocks"])
    for attn in ("self_attn", "cross_attn"):
        sub = dict(blocks[attn])
        for k in _ATTN_GEMMS:
            if k in sub:
                sub[k] = _quantize_linear(sub[k])
        blocks[attn] = sub
    for k in ("ffn_fc1", "ffn_fc2"):
        blocks[k] = _quantize_linear(blocks[k])
    params["blocks"] = blocks
    return params


quantize_wan_params_jit = jax.jit(quantize_wan_params)
