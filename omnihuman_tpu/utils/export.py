"""Serving-step export: serialize jitted steps as StableHLO artifacts.

Production deployment wants the denoise step as a versioned artifact —
loadable without the model-construction Python (and robust to model-code
refactors), traced/lowered once at export time. `jax.export` gives a
stable serialization; the target device compiles on first call (the
persistent compilation cache then makes that a one-time cost per fleet).

The torch reference has no equivalent (its deploy story is "ship the
repo"); this is TPU-first serving infrastructure on top of the same
pipelines (SURVEY §7.1).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax import export as jax_export

MAGIC = "omnihuman_tpu.export.v1"


def _resolve_policy(config, precision: str):
    """Map the serving precision name onto the config's dtype policy.

    'reference' = the registry policy (fp32 residual, exact torch
    parity); 'fast' = bf16 residual stream — the pixel-gated serving
    mode (PSNR 39.8 dB / SSIM 0.989 vs fp32 on the real chip,
    REPORTS/perf_r4.md §6).
    """
    import dataclasses

    import jax.numpy as jnp
    if precision == "reference":
        return config.policy
    if precision in ("fast", "int8"):
        # int8 runs the fast-mode bf16 residual; its weight quantization
        # lives in the params SIGNATURE (see _abstract_params), not here
        return dataclasses.replace(config.policy, residual=jnp.bfloat16)
    raise ValueError(f"unknown precision {precision!r}; "
                     "expected 'fast', 'reference' or 'int8'")


def _abstract_params(mcfg, pd, precision: str):
    """Abstract DiT params for the export signature. precision='int8'
    re-shapes the block GEMM leaves to the quantized (w_q int8, w_s f32)
    layout (ops/quant.py) — the artifact then expects pre-quantized
    weights and runs W8A8 MXU GEMMs."""
    from omnihuman_tpu.models.wan_dit import init_wan_model

    params = jax.eval_shape(lambda k: init_wan_model(k, mcfg),
                            jax.random.key(0))
    params = jax.tree.map(
        lambda t: jax.ShapeDtypeStruct(t.shape, pd), params)
    if precision == "int8":
        from omnihuman_tpu.ops.quant import quantize_wan_params
        params = jax.eval_shape(quantize_wan_params, params)
    return params


def export_jitted(fn: Callable, args_shapes: Sequence[Any], path: str,
                  platforms: Tuple[str, ...] = ("tpu",),
                  metadata: Optional[Dict[str, Any]] = None) -> str:
    """Trace + lower `fn` abstractly and write a serialized artifact.

    args_shapes: jax.ShapeDtypeStruct PyTrees (positional args).
    platforms: lowering targets; ("tpu",) artifacts serialize fine on a
    CPU-only host (cross-platform lowering), they just can't .call here.
    Returns the path written.
    """
    exp = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        *args_shapes)
    blob = exp.serialize()
    meta = {"magic": MAGIC, "platforms": list(exp.platforms),
            "in_avals": [str(a) for a in exp.in_avals],
            "out_avals": [str(a) for a in exp.out_avals]}
    meta.update(metadata or {})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_exported(path: str):
    """Deserialize an artifact; returns an object with `.call(*args)`."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def export_t2v_denoise_step(
    config, size: Tuple[int, int], frame_num: int, path: str,
    guide_scale: float = 5.0, platforms: Tuple[str, ...] = ("tpu",),
    cfg_mode: str = "fused", precision: str = "reference",
    param_dtype=None) -> str:
    """Export the t2v CFG denoise step for a registry config at a fixed
    size/frame_num (static shapes are the serving contract — one artifact
    per bucket, like any production TPU server).

    The artifact signature is (params, x, t, ctx2, rope_sin, rope_cos):
    pass converted checkpoint params at serve time.
    """
    import math

    import jax.numpy as jnp

    from omnihuman_tpu.pipelines.text2video import _cfg_model_step

    mcfg = config.model
    pd = param_dtype or jnp.bfloat16
    w, h = size
    lat = (mcfg.in_dim,
           (frame_num - 1) // config.vae_stride[0] + 1,
           h // config.vae_stride[1], w // config.vae_stride[2])
    grid = tuple(s // p for s, p in zip(lat[1:], mcfg.patch_size))
    n_tok = math.prod(grid)
    seq_len = -(-n_tok // 1024) * 1024

    params = _abstract_params(mcfg, pd, precision)
    sd = jax.ShapeDtypeStruct
    shapes = (
        params,
        sd((1, *lat), jnp.float32),                       # x
        sd((), jnp.float32),                              # t (scalar)
        sd((2, mcfg.text_len, mcfg.text_dim), pd),        # ctx2
        sd((seq_len, mcfg.head_dim // 2), jnp.float32),   # rope sin
        sd((seq_len, mcfg.head_dim // 2), jnp.float32),   # rope cos
    )

    policy = _resolve_policy(config, precision)

    def step(params, x, t, ctx2, rope_sin, rope_cos):
        return _cfg_model_step(
            params, x, t, ctx2, rope_sin, rope_cos,
            model_cfg=mcfg, policy=policy, seq_len=seq_len,
            guide_scale=float(guide_scale), cfg_mode=cfg_mode)

    return export_jitted(
        step, shapes, path, platforms=platforms,
        metadata={"config": getattr(config, "name", "?"),
                  "size": list(size), "frame_num": frame_num,
                  "seq_len": seq_len, "guide_scale": guide_scale,
                  "cfg_mode": cfg_mode, "precision": precision})


def export_i2v_denoise_step(
    config, size: Tuple[int, int], frame_num: int, path: str,
    guide_scale: float = 5.0, platforms: Tuple[str, ...] = ("tpu",),
    cfg_mode: str = "fused", precision: str = "reference",
    param_dtype=None) -> str:
    """i2v variant: signature (params, x, t, ctx2, y2, clip2, rope_sin,
    rope_cos) — y2 is the [mask ++ reference-latent] channel concat and
    clip2 the CLIP image tokens, both stacked cond/uncond like ctx2."""
    import math

    import jax.numpy as jnp

    from omnihuman_tpu.pipelines.image2video import _i2v_cfg_model_step

    mcfg = config.model
    pd = param_dtype or jnp.bfloat16
    w, h = size
    lat_f = (frame_num - 1) // config.vae_stride[0] + 1
    lat_h, lat_w = h // config.vae_stride[1], w // config.vae_stride[2]
    grid = tuple(s // p for s, p in zip((lat_f, lat_h, lat_w),
                                        mcfg.patch_size))
    seq_len = -(-math.prod(grid) // 1024) * 1024

    params = _abstract_params(mcfg, pd, precision)
    sd = jax.ShapeDtypeStruct
    shapes = (
        params,
        sd((1, 16, lat_f, lat_h, lat_w), jnp.float32),    # x (z channels)
        sd((), jnp.float32),
        sd((2, mcfg.text_len, mcfg.text_dim), pd),
        sd((2, mcfg.in_dim - 16, lat_f, lat_h, lat_w), jnp.float32),  # y2
        sd((2, mcfg.clip_tokens, mcfg.clip_embed_dim), pd),           # clip2
        sd((seq_len, mcfg.head_dim // 2), jnp.float32),
        sd((seq_len, mcfg.head_dim // 2), jnp.float32),
    )

    policy = _resolve_policy(config, precision)

    def step(params, x, t, ctx2, y2, clip2, rope_sin, rope_cos):
        return _i2v_cfg_model_step(
            params, x, t, ctx2, y2, clip2, rope_sin, rope_cos,
            model_cfg=mcfg, policy=policy, seq_len=seq_len,
            guide_scale=float(guide_scale), cfg_mode=cfg_mode)

    return export_jitted(
        step, shapes, path, platforms=platforms,
        metadata={"config": getattr(config, "name", "?"), "task": "i2v",
                  "size": list(size), "frame_num": frame_num,
                  "seq_len": seq_len, "guide_scale": guide_scale,
                  "cfg_mode": cfg_mode, "precision": precision})
