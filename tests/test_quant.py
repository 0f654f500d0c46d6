"""int8 W8A8 serving quantization (ops/quant.py).

TPU-native perf feature with no reference counterpart (the reference
serves fp16/bf16 only); quality/latency decision table in
REPORTS/perf_r4.md §7.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.configs.wan import TINY_TEST
from omnihuman_tpu.ops.quant import (
    int8_linear, quantize_wan_params, quantize_weight)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)
                         / np.maximum(np.mean(b ** 2), 1e-12)))


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.key(0), (96, 64), jnp.float32) * 0.05
    w_q, w_s = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and w_s.shape == (64,)
    deq = w_q.astype(jnp.float32) * w_s[None, :]
    # symmetric int8 quant noise on a gaussian: step = amax/127, RMS err
    # ~ step/sqrt(12) -> rel-RMS ~ (amax/sigma)/440 ~ 0.8% at n=96
    assert _rel(deq, w) < 1.5e-2
    # stacked-block leaves quantize along the right axis
    ws = jnp.stack([w, 2 * w])
    wq2, ws2 = quantize_weight(ws)
    assert wq2.shape == (2, 96, 64) and ws2.shape == (2, 64)
    np.testing.assert_allclose(np.asarray(ws2[1]), 2 * np.asarray(ws2[0]),
                               rtol=1e-6)


def test_int8_linear_matches_f32():
    key = jax.random.key(1)
    x = jax.random.normal(key, (4, 128, 96), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(2), (96, 64), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.key(3), (64,), jnp.float32) * 0.01
    want = x.astype(jnp.float32) @ w + b
    w_q, w_s = quantize_weight(w)
    got = int8_linear({"w_q": w_q, "w_s": w_s, "b": b}, x)
    assert got.dtype == x.dtype
    assert _rel(got, want) < 2e-2


def test_quantize_wan_params_structure():
    params = __import__(
        "omnihuman_tpu.models.wan_dit", fromlist=["init_wan_model"]
    ).init_wan_model(jax.random.key(0), TINY_TEST.model)
    q = quantize_wan_params(params)
    blocks = q["blocks"]
    for attn in ("self_attn", "cross_attn"):
        assert "w_q" in blocks[attn]["q"] and "w" not in blocks[attn]["q"]
        assert blocks[attn]["q"]["w_q"].dtype == jnp.int8
        # norms untouched
        assert "w" in blocks[attn]["norm_q"]
    assert blocks["ffn_fc1"]["w_q"].dtype == jnp.int8
    # head / embeds / modulation stay full precision
    assert q["head"]["w"].dtype != jnp.int8
    assert q["patch_embedding"]["w"].dtype != jnp.int8
    assert blocks["modulation"].dtype != jnp.int8
    # weight bytes roughly halve vs bf16 for the quantized leaves
    orig = params["blocks"]["ffn_fc1"]["w"]
    assert blocks["ffn_fc1"]["w_q"].nbytes == orig.size  # 1 byte/elem


def test_pipeline_precision_int8(tmp_path):
    """precision='int8' generates finite output close to the fp32
    reference at tiny dims (the real-chip pixel/latency gate lives in
    REPORTS/perf_r4.md §7)."""
    from omnihuman_tpu.pipelines.text2video import WanT2V

    rng = np.random.default_rng(7)
    ref_pipe = WanT2V(TINY_TEST, checkpoint_dir=None,
                      param_dtype=jnp.float32)
    ref_pipe.params["head"]["w"] = jnp.asarray(
        rng.normal(size=ref_pipe.params["head"]["w"].shape) * 0.1,
        jnp.float32)

    q_pipe = WanT2V(TINY_TEST, checkpoint_dir=None,
                    param_dtype=jnp.float32, precision="int8")
    q_pipe.params = quantize_wan_params(ref_pipe.params)
    assert q_pipe.policy.residual == jnp.bfloat16

    ctx = jnp.asarray(
        rng.normal(size=(1, TINY_TEST.text_len, TINY_TEST.t5.dim)) * 0.1,
        jnp.float32)
    ctx_null = jnp.asarray(
        rng.normal(size=(1, TINY_TEST.text_len, TINY_TEST.t5.dim)) * 0.1,
        jnp.float32)
    kw = dict(size=(32, 32), frame_num=1, sampling_steps=2, seed=3,
              context=ctx, context_null=ctx_null, return_latents=True)
    want = np.asarray(ref_pipe.generate("x", **kw))
    got = np.asarray(q_pipe.generate("x", **kw))
    assert np.isfinite(got).all()
    rel = _rel(got, want)
    assert 0 < rel < 0.25, rel    # quantized, but tracks the reference

    with pytest.raises(ValueError, match="unknown precision"):
        WanT2V(TINY_TEST, checkpoint_dir=None, precision="int4")


def test_int8_sharded_matches_unsharded():
    """int8 serving composes with the mesh plan (--fsdp_size/--sp_size +
    --precision int8): the ring/shard_map path over quantized params must
    match the single-device dense result. int8 GEMMs are exact integer
    math, so only the f32 attention reassociation contributes drift."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    import dataclasses

    from omnihuman_tpu.configs.wan import DTypePolicy
    from omnihuman_tpu.parallel import MeshConfig, create_mesh
    from omnihuman_tpu.pipelines.text2video import WanT2V

    cfg32 = dataclasses.replace(TINY_TEST,
                                policy=DTypePolicy(compute=jnp.float32))

    def mk(mesh):
        p = WanT2V(cfg32, checkpoint_dir=None, mesh=mesh,
                   param_dtype=jnp.float32, precision="int8")
        rng = np.random.default_rng(42)
        p.params["head"]["w"] = jnp.asarray(
            rng.normal(size=p.params["head"]["w"].shape) * 0.1,
            jnp.float32)
        return p

    plain = mk(None)
    shard = mk(create_mesh(MeshConfig(data=2, fsdp=2, sp=2)))
    assert "w_q" in shard.params["blocks"]["ffn_fc1"]

    rng = np.random.default_rng(5)
    mkctx = lambda: jnp.asarray(
        rng.normal(size=(1, TINY_TEST.text_len, TINY_TEST.t5.dim)) * 0.1,
        jnp.float32)
    kw = dict(size=(32, 32), frame_num=5, sampling_steps=2, seed=11,
              context=mkctx(), context_null=mkctx(), return_latents=True)
    a = plain.generate("x", **kw)
    b = shard.generate("x", **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-3, rtol=1e-3)
