"""Serving-step export artifacts: roundtrip equivalence + TPU lowering."""

import numpy as np

import jax
import jax.numpy as jnp

from omnihuman_tpu.configs.wan import TINY_TEST
from omnihuman_tpu.models.wan_dit import init_wan_model
from omnihuman_tpu.ops.rope import rope_angles_3d
from omnihuman_tpu.pipelines.text2video import _cfg_model_step
from omnihuman_tpu.utils.export import (
    export_t2v_denoise_step, load_exported)


def _step_inputs(seed=0):
    import math
    cfg = TINY_TEST
    mcfg = cfg.model
    size, frames = (32, 32), 5
    lat = (mcfg.in_dim, (frames - 1) // cfg.vae_stride[0] + 1,
           size[1] // cfg.vae_stride[1], size[0] // cfg.vae_stride[2])
    grid = tuple(s // p for s, p in zip(lat[1:], mcfg.patch_size))
    seq_len = -(-math.prod(grid) // 1024) * 1024
    r = np.random.default_rng(seed)
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16),
        init_wan_model(jax.random.key(0), mcfg))
    # zero head → zero output; randomise like the pipeline tests
    params["head"]["w"] = jnp.asarray(
        r.normal(size=params["head"]["w"].shape) * 0.1, jnp.bfloat16)
    x = jnp.asarray(r.normal(size=(1, *lat)), jnp.float32)
    t = jnp.asarray(500.0, jnp.float32)
    ctx2 = jnp.asarray(r.normal(size=(2, mcfg.text_len, mcfg.text_dim)),
                       jnp.bfloat16)
    sin, cos = rope_angles_3d(grid, mcfg.head_dim, seq_len=seq_len)
    return cfg, seq_len, params, x, t, ctx2, sin, cos, size, frames


def test_export_roundtrip_matches_direct(tmp_path):
    (cfg, seq_len, params, x, t, ctx2, sin, cos,
     size, frames) = _step_inputs()
    path = str(tmp_path / "step.bin")
    export_t2v_denoise_step(cfg, size, frames, path, guide_scale=5.0,
                            platforms=("cpu",))
    art = load_exported(path)
    got = np.asarray(art.call(params, x, t, ctx2, sin, cos))
    want = np.asarray(_cfg_model_step(
        params, x, t, ctx2, sin, cos, model_cfg=cfg.model,
        policy=cfg.policy, seq_len=seq_len, guide_scale=5.0))
    assert got.shape == want.shape
    assert float(np.max(np.abs(got - want))) < 1e-5
    import json
    meta = json.load(open(path + ".json"))
    assert meta["magic"] == "omnihuman_tpu.export.v1"
    assert meta["seq_len"] == seq_len


def test_export_fast_precision(tmp_path):
    """precision='fast' exports the bf16-residual serving step: it must
    match the bf16-residual direct step exactly, be recorded in the
    sidecar, and genuinely differ from the fp32-residual artifact."""
    import dataclasses
    import json

    (cfg, seq_len, params, x, t, ctx2, sin, cos,
     size, frames) = _step_inputs(seed=3)
    path = str(tmp_path / "step_fast.bin")
    export_t2v_denoise_step(cfg, size, frames, path, guide_scale=5.0,
                            platforms=("cpu",), precision="fast")
    art = load_exported(path)
    got = np.asarray(art.call(params, x, t, ctx2, sin, cos))
    fast_policy = dataclasses.replace(cfg.policy, residual=jnp.bfloat16)
    want = np.asarray(_cfg_model_step(
        params, x, t, ctx2, sin, cos, model_cfg=cfg.model,
        policy=fast_policy, seq_len=seq_len, guide_scale=5.0))
    assert float(np.max(np.abs(got - want))) < 1e-5
    ref = np.asarray(_cfg_model_step(
        params, x, t, ctx2, sin, cos, model_cfg=cfg.model,
        policy=cfg.policy, seq_len=seq_len, guide_scale=5.0))
    assert float(np.max(np.abs(got - ref))) > 0.0   # bf16 stream differs
    meta = json.load(open(path + ".json"))
    assert meta["precision"] == "fast"


def test_export_tpu_platform_serializes(tmp_path):
    """TPU-platform artifacts lower + serialize on this CPU-only host
    (they run on a real chip; the lowering itself is the gate here)."""
    cfg, *_ , size, frames = _step_inputs()
    path = str(tmp_path / "step_tpu.bin")
    export_t2v_denoise_step(cfg, size, frames, path, platforms=("tpu",))
    art = load_exported(path)
    assert tuple(art.platforms) == ("tpu",)


def test_export_i2v_roundtrip(tmp_path):
    import dataclasses
    import math
    from omnihuman_tpu.utils.export import export_i2v_denoise_step

    base = TINY_TEST
    mcfg = dataclasses.replace(base.model, model_type="i2v", in_dim=36,
                               clip_tokens=4, clip_embed_dim=48)
    cfg = dataclasses.replace(base, model=mcfg)
    size, frames = (32, 32), 5
    path = str(tmp_path / "i2v_step.bin")
    export_i2v_denoise_step(cfg, size, frames, path, platforms=("cpu",))

    lat = (16, (frames - 1) // cfg.vae_stride[0] + 1,
           size[1] // cfg.vae_stride[1], size[0] // cfg.vae_stride[2])
    grid = tuple(s // p for s, p in zip(lat[1:], mcfg.patch_size))
    seq_len = -(-math.prod(grid) // 1024) * 1024
    r = np.random.default_rng(1)
    params = jax.tree.map(lambda t: t.astype(jnp.bfloat16),
                          init_wan_model(jax.random.key(0), mcfg))
    params["head"]["w"] = jnp.asarray(
        r.normal(size=params["head"]["w"].shape) * 0.1, jnp.bfloat16)
    x = jnp.asarray(r.normal(size=(1, *lat)), jnp.float32)
    t = jnp.asarray(500.0, jnp.float32)
    ctx2 = jnp.asarray(r.normal(size=(2, mcfg.text_len, mcfg.text_dim)),
                       jnp.bfloat16)
    y2 = jnp.asarray(r.normal(size=(2, 20, *lat[1:])), jnp.float32)
    clip2 = jnp.asarray(
        r.normal(size=(2, mcfg.clip_tokens, mcfg.clip_embed_dim)),
        jnp.bfloat16)
    sin, cos = rope_angles_3d(grid, mcfg.head_dim, seq_len=seq_len)

    from omnihuman_tpu.pipelines.image2video import _i2v_cfg_model_step
    art = load_exported(path)
    got = np.asarray(art.call(params, x, t, ctx2, y2, clip2, sin, cos))
    want = np.asarray(_i2v_cfg_model_step(
        params, x, t, ctx2, y2, clip2, sin, cos, model_cfg=mcfg,
        policy=cfg.policy, seq_len=seq_len, guide_scale=5.0))
    assert float(np.max(np.abs(got - want))) < 1e-5


def test_export_int8_precision(tmp_path):
    """precision='int8' exports a W8A8 artifact whose params signature is
    the QUANTIZED tree (ops/quant.py): calling it with quantized params
    matches the direct int8 forward, and the sidecar records the mode."""
    import dataclasses
    import json

    from omnihuman_tpu.ops.quant import quantize_wan_params

    (cfg, seq_len, params, x, t, ctx2, sin, cos,
     size, frames) = _step_inputs(seed=5)
    path = str(tmp_path / "step_int8.bin")
    export_t2v_denoise_step(cfg, size, frames, path, guide_scale=5.0,
                            platforms=("cpu",), precision="int8")
    art = load_exported(path)
    params_q = quantize_wan_params(params)
    got = np.asarray(art.call(params_q, x, t, ctx2, sin, cos))
    fast_policy = dataclasses.replace(cfg.policy, residual=jnp.bfloat16)
    want = np.asarray(_cfg_model_step(
        params_q, x, t, ctx2, sin, cos, model_cfg=cfg.model,
        policy=fast_policy, seq_len=seq_len, guide_scale=5.0))
    assert float(np.max(np.abs(got - want))) < 1e-5
    # tracks (but differs from) the unquantized fast step
    ref = np.asarray(_cfg_model_step(
        params, x, t, ctx2, sin, cos, model_cfg=cfg.model,
        policy=fast_policy, seq_len=seq_len, guide_scale=5.0))
    rel = float(np.sqrt(np.mean((got - ref) ** 2)
                        / np.maximum(np.mean(ref ** 2), 1e-12)))
    assert 0 < rel < 0.1, rel
    meta = json.load(open(path + ".json"))
    assert meta["precision"] == "int8"
