"""Mesh-sharded OMNI inference: sharded-vs-unsharded equivalence for
`pipelines/omni.omni_generate` (VERDICT r3 item 4 — the flagship
omni-conditions config must be serveable over the mesh, same semantics
as tests/test_mesh_pipeline.py for the wan pipelines)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.configs.wan import DTypePolicy, WanModelConfig
from omnihuman_tpu.omni.model import OmniModelConfig, init_omni_model
from omnihuman_tpu.parallel import (MeshConfig, create_mesh,
                                    shard_params)
from omnihuman_tpu.pipelines.omni import omni_generate, omni_mesh_plan

BASE = WanModelConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                      freq_dim=16, text_dim=24, text_len=8)
OCFG = OmniModelConfig(base=BASE, audio_dim=20, num_keypoints=8,
                       num_frames=8)
# f32 compute: the ring path reassociates softmax accumulation; bf16
# would differ at bf16 epsilon (same rationale as test_mesh_pipeline)
FP32 = DTypePolicy(compute=jnp.float32)
B, C, F, H, W = 1, 16, 2, 8, 8


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    params = init_omni_model(jax.random.key(0), OCFG)
    params["base"]["head"]["w"] = jnp.asarray(
        rng.normal(size=params["base"]["head"]["w"].shape) * 0.05,
        jnp.float32)
    inputs = dict(
        noise=jnp.asarray(rng.normal(size=(B, C, F, H, W)), jnp.float32),
        context=jnp.asarray(rng.normal(size=(B, 8, 24)), jnp.float32),
        context_null=jnp.asarray(rng.normal(size=(B, 8, 24)),
                                 jnp.float32),
        audio=jnp.asarray(rng.normal(size=(B, 4, 20)), jnp.float32),
        pose=jnp.asarray(rng.normal(size=(B, 8, F, H * 2, W * 2)) * 0.1,
                         jnp.float32),
        ref_latent=jnp.asarray(rng.normal(size=(B, C, 1, H, W)),
                               jnp.float32),
        motion_latent=jnp.asarray(rng.normal(size=(B, C, 1, H, W)),
                                  jnp.float32),
    )
    return params, inputs


def _gen(params, inputs, mesh=None):
    return omni_generate(
        params, inputs["noise"], inputs["context"], inputs["context_null"],
        cfg=OCFG, policy=FP32, sampling_steps=2, cfg_scale=5.0, mesh=mesh,
        audio=inputs["audio"], pose=inputs["pose"],
        ref_latent=inputs["ref_latent"],
        motion_latent=inputs["motion_latent"])


def test_mesh_plan():
    assert omni_mesh_plan(None) == ("auto", None, 1)
    if jax.device_count() >= 8:
        mesh = create_mesh(MeshConfig(data=2, fsdp=2, sp=2))
        impl, ts, align = omni_mesh_plan(mesh)
        assert impl == "ring" and align == 2 and "sp" in str(ts.spec)


def test_sharded_omni_generate_matches_unsharded(setup):
    """Full conditions (audio+pose+ref+motion: the PACKED sequence is
    longer than plain i2v) through the ring/shard_map path must match
    the single-device dense result."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    params, inputs = setup
    want = _gen(params, inputs)

    mesh = create_mesh(MeshConfig(data=2, fsdp=2, sp=2))
    sharded = shard_params(params, mesh)
    got = _gen(sharded, inputs, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_omni_generate_finite_no_conditions(setup):
    """Text-only sampling (uncond-style) stays finite and respects the
    CFG annealing schedule end-to-end."""
    params, inputs = setup
    out = omni_generate(
        params, inputs["noise"], inputs["context"],
        inputs["context_null"], cfg=OCFG, policy=FP32, sampling_steps=2,
        cfg_scale=5.0)
    assert out.shape == inputs["noise"].shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_windowed_long_video_mesh(setup):
    """Windowed autoregressive long video over the sp mesh (VERDICT r4
    item 3; README.md:150-154 'motion frames for long video'): window 2
    is conditioned on window 1's tail latents — its output must differ
    from an unconditioned window 2 with the same noise — and the packed
    (video + ref + motion) lengths stay sp-aligned (the mesh run
    compiling at all pins that)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from omnihuman_tpu.pipelines.omni import omni_generate_windowed

    params, inputs = setup
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, sp=2))
    sharded = shard_params(params, mesh)
    key = jax.random.key(7)
    kw = dict(cfg=OCFG, policy=FP32, sampling_steps=1, cfg_scale=5.0)

    total = F + 1                       # 2 windows, trimmed from 2F
    long = omni_generate_windowed(
        sharded, key, latent_shape=(B, C, F, H, W),
        context=inputs["context"], context_null=inputs["context_null"],
        total_frames=total, motion_frames=1,
        ref_latent=inputs["ref_latent"], mesh=mesh, **kw)
    assert long.shape == (B, C, total, H, W)
    assert np.all(np.isfinite(np.asarray(long)))

    # same window-2 noise WITHOUT motion conditioning → different clip
    noise2 = jax.random.normal(jax.random.fold_in(key, 1), (B, C, F, H, W),
                               jnp.float32)
    uncond2 = omni_generate(
        sharded, noise2, inputs["context"], inputs["context_null"],
        ref_latent=inputs["ref_latent"], mesh=mesh, **kw)
    got2 = np.asarray(long[:, :, F:])
    assert not np.allclose(got2, np.asarray(uncond2)[:, :, :total - F],
                           atol=1e-6)

    # window 1 is by construction the plain (motion-free) clip
    want1 = omni_generate(
        sharded, jax.random.normal(jax.random.fold_in(key, 0),
                                   (B, C, F, H, W), jnp.float32),
        inputs["context"], inputs["context_null"],
        ref_latent=inputs["ref_latent"], mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(long[:, :, :F]),
                               np.asarray(want1), atol=1e-5, rtol=1e-5)
