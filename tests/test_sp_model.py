"""Sequence-parallel model forward: ring/ulysses inside the DiT on the
8-device mesh matches the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.configs.wan import DTypePolicy, WanModelConfig
from omnihuman_tpu.models.wan_dit import init_wan_model, wan_model_forward
from omnihuman_tpu.ops.ring_attention import ulysses_attention
from omnihuman_tpu.ops.attention import attention_xla
from omnihuman_tpu.ops.rope import rope_angles_3d
from omnihuman_tpu.parallel import MeshConfig, create_mesh
from omnihuman_tpu.parallel.mesh import use_mesh

CFG = WanModelConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                     freq_dim=16, text_dim=24, text_len=8)
FP32 = DTypePolicy(compute=jnp.float32)


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    return create_mesh(MeshConfig(data=jax.device_count() // 4, fsdp=1,
                                  sp=4))


def test_ulysses_matches_dense(mesh, rng):
    b, l, n, d = 2, 32, 4, 16
    q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    lens = jnp.asarray([32, 17], jnp.int32)
    got = ulysses_attention(q, k, v, mesh, seq_lens=lens,
                            compute_dtype=jnp.float32)
    want = attention_xla(q, k, v, k_lens=lens, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("impl", ["ring", "ulysses"])
def test_model_forward_sp_matches_single(mesh, impl, rng):
    """Full DiT forward with sp self-attention == plain forward."""
    params = init_wan_model(jax.random.key(0), CFG)
    params["head"]["w"] = jnp.asarray(
        rng.normal(size=params["head"]["w"].shape) * 0.05, jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 16, 4, 8, 8)), jnp.float32)
    t = jnp.asarray([500.0, 100.0])
    ctx = jnp.asarray(rng.normal(size=(2, 8, 24)), jnp.float32)
    sin, cos = rope_angles_3d((4, 4, 4), CFG.head_dim, seq_len=64)
    kw = dict(cfg=CFG, seq_len=64, rope_sin=sin, rope_cos=cos, policy=FP32,
              remat=False)

    v_ref = wan_model_forward(params, x, t, ctx, attn_impl="xla", **kw)
    with use_mesh(mesh):
        v_sp = wan_model_forward(params, x, t, ctx, attn_impl=impl, **kw)
    np.testing.assert_allclose(np.asarray(v_sp), np.asarray(v_ref),
                               atol=5e-4, rtol=5e-4)


def test_sp_impl_falls_back_without_mesh(rng):
    """attn_impl='ring' outside a mesh context degrades to dense."""
    params = init_wan_model(jax.random.key(0), CFG)
    x = jnp.asarray(rng.normal(size=(1, 16, 4, 8, 8)), jnp.float32)
    ctx = jnp.zeros((1, 8, 24), jnp.float32)
    sin, cos = rope_angles_3d((4, 4, 4), CFG.head_dim, seq_len=64)
    v = wan_model_forward(params, x, jnp.asarray([1.0]), ctx,
                          cfg=CFG, seq_len=64, rope_sin=sin, rope_cos=cos,
                          policy=FP32, remat=False, attn_impl="ring")
    assert np.isfinite(np.asarray(v)).all()
