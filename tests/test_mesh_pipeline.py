"""Mesh-sharded pipeline tests: WanT2V over (data, fsdp, sp) on the CPU
mesh, plus golden-value regression anchors for numeric drift."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.configs.wan import TINY_TEST
from omnihuman_tpu.parallel import MeshConfig, create_mesh
from omnihuman_tpu.pipelines.text2video import WanT2V

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "tiny_t2v_latents.npz")


def _ctx(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(size=(1, TINY_TEST.text_len, TINY_TEST.t5.dim)) * 0.1,
        jnp.float32)


import dataclasses

from omnihuman_tpu.configs.wan import DTypePolicy

# f32 compute for the sharded-vs-unsharded equivalence tests: the ring
# path reassociates the softmax accumulation, so in bf16 the two paths
# differ at bf16 epsilon (~5e-3) — f32 keeps the structural comparison
# tight. The golden test keeps the default (bf16-compute) policy.
TINY_F32 = dataclasses.replace(
    TINY_TEST, policy=DTypePolicy(compute=jnp.float32))


def _mk_pipe(cfg, mesh=None):
    p = WanT2V(cfg, checkpoint_dir=None, mesh=mesh,
               param_dtype=jnp.float32)
    rng = np.random.default_rng(42)
    p.params["head"]["w"] = jnp.asarray(
        rng.normal(size=p.params["head"]["w"].shape) * 0.1, jnp.float32)
    return p


@pytest.fixture(scope="module")
def sharded_pipe():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, sp=2))
    return _mk_pipe(TINY_F32, mesh=mesh)


@pytest.fixture(scope="module")
def plain_f32_pipe():
    return _mk_pipe(TINY_F32)


@pytest.fixture(scope="module")
def plain_pipe():
    return _mk_pipe(TINY_TEST)


def test_sharded_params_placement(sharded_pipe):
    from omnihuman_tpu.parallel import infer_param_specs
    # params live on the mesh; tiny leaves are (correctly) replicated —
    # below MIN_SHARD_SIZE nothing gains from sharding
    w = sharded_pipe.params["blocks"]["ffn_fc1"]["w"]
    assert set(w.sharding.mesh.axis_names) == {"data", "fsdp", "sp"}
    # the shape-driven rule shards the largest dim once leaves are big
    # enough (threshold lowered to observe it at tiny sizes)
    specs = infer_param_specs(sharded_pipe.params, min_size=1024)
    assert "fsdp" in str(specs["blocks"]["ffn_fc1"]["w"])


def test_infer_param_specs_respects_axis_divisibility():
    """jit argument shardings require the sharded dim to divide by the
    axis size — e.g. the omni pose guider's 308-keypoint conv dim over
    fsdp=16 (found by the omni-14B AOT memory run). The rule must fall
    back to the largest DIVISIBLE dim, or replicate."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from omnihuman_tpu.parallel import infer_param_specs

    leaf = jax.ShapeDtypeStruct((3, 3, 3, 308, 128), jnp.bfloat16)
    # 308 % 16 != 0 → dim 4 (128) is the largest divisible dim
    assert infer_param_specs(leaf, min_size=1, axis_size=16) == P(
        None, None, None, None, "fsdp")
    # 308 % 4 == 0 → the largest dim wins again
    assert infer_param_specs(leaf, min_size=1, axis_size=4) == P(
        None, None, None, "fsdp", None)
    # nothing divides → replicated instead of a compile error
    odd = jax.ShapeDtypeStruct((307, 127), jnp.bfloat16)
    assert infer_param_specs(odd, min_size=1, axis_size=16) == P()
    # no axis size (no mesh in scope) → legacy size-driven choice
    assert infer_param_specs(leaf, min_size=1) == P(
        None, None, None, "fsdp", None)


def test_mesh_pipeline_uses_ring_plan(sharded_pipe):
    """A mesh-built pipeline must route self-attention through the
    shard_map ring path — the ONLY path that compiles on real TPUs
    (bare Pallas under a mesh-jit cannot be GSPMD-partitioned,
    REPORTS/memory_14B.md) — and annotate the token axis on sp."""
    assert sharded_pipe.attn_impl == "ring"
    ts = sharded_pipe.token_sharding
    assert ts is not None and "sp" in str(ts.spec)


def test_sharded_generate_matches_unsharded(sharded_pipe, plain_f32_pipe):
    """Forces the ring/shard_map path (pipeline mesh plan) and matches
    the single-device dense-XLA result."""
    kw = dict(size=(32, 32), frame_num=5, sampling_steps=2, seed=11,
              context=_ctx(0), context_null=_ctx(1), return_latents=True)
    a = plain_f32_pipe.generate("x", **kw)
    b = sharded_pipe.generate("x", **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-4, rtol=2e-4)


def test_one_step_generator_sharded_matches_unsharded(sharded_pipe,
                                                      plain_f32_pipe):
    """The one-step (Seaweed-APT) generator inherits the pipe's mesh
    plan (ring attention + token sharding + whole-slice VAE W-sharding)
    — VERDICT r3 weak #6: one-step serving was single-chip only."""
    from omnihuman_tpu.pipelines.wan_inference import SeaweedWanAPTGenerator

    kw = dict(size=(32, 32), frame_num=5, seed=7, context=_ctx(2))
    want = SeaweedWanAPTGenerator(plain_f32_pipe).generate(
        "x", return_latents=True, **kw)
    gen = SeaweedWanAPTGenerator(sharded_pipe)
    got = gen.generate("x", return_latents=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    # full path incl. the spatially-sharded decode stays finite
    video = gen.generate("x", **kw)
    assert np.all(np.isfinite(np.asarray(video)))
    assert gen.timings["vae_decode_s"] > 0


def test_sequential_cfg_matches_fused(sharded_pipe, plain_f32_pipe):
    """cfg_mode='sequential' (the memory-validated 14B@720p mode) is
    numerically the fused computation run twice — outputs must agree on
    the mesh and against the unsharded fused result."""
    kw = dict(size=(32, 32), frame_num=5, sampling_steps=2, seed=11,
              context=_ctx(0), context_null=_ctx(1), return_latents=True)
    fused = plain_f32_pipe.generate("x", cfg_mode="fused", **kw)
    seq = sharded_pipe.generate("x", cfg_mode="sequential", **kw)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(seq),
                               atol=2e-4, rtol=2e-4)


def test_default_cfg_mode_decision_table(plain_pipe):
    """Defaults follow REPORTS/memory_14B.md: sequential for 14B-class
    dims at 720p token counts, fused otherwise."""
    import dataclasses
    from omnihuman_tpu.configs import WAN_CONFIGS
    big = WanT2V.__new__(WanT2V)
    big.config = WAN_CONFIGS["t2v-14B"]
    assert big.default_cfg_mode(75600) == "sequential"
    assert big.default_cfg_mode(32768) == "fused"       # 14B @ 480p
    assert plain_pipe.default_cfg_mode(75600) == "fused"  # 1.3B dims
    with pytest.raises(ValueError, match="cfg_mode"):
        plain_pipe.generate(
            "x", size=(32, 32), frame_num=5, sampling_steps=1,
            context=_ctx(0), context_null=_ctx(1), return_latents=True,
            cfg_mode="both")


def test_golden_latents_regression(plain_pipe):
    """Anchored output for a fixed seed/config — catches silent numeric
    drift across refactors. Regenerate deliberately with
    REGEN_GOLDENS=1 when semantics change on purpose."""
    lat = np.asarray(plain_pipe.generate(
        "golden", size=(32, 32), frame_num=5, sampling_steps=3, seed=123,
        guide_scale=4.0, context=_ctx(7), context_null=_ctx(8),
        return_latents=True))
    if os.environ.get("REGEN_GOLDENS") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, latents=lat)
        pytest.skip("golden (re)generated")
    want = np.load(GOLDEN)["latents"]
    np.testing.assert_allclose(lat, want, atol=1e-4, rtol=1e-4)
