"""Spatially-sharded VAE streaming decode/encode: W-axis GSPMD
partitioning (halo-exchanged convs over the mesh) must match the
single-device result — the v5e-8 serving plan for the decode stage
(REPORTS/perf_r4.md; the single-chip decode floor is ~4.9 s/81f)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from omnihuman_tpu.configs.wan import VAEConfig
from omnihuman_tpu.models.vae import init_vae, vae_decode, vae_encode
from omnihuman_tpu.parallel import MeshConfig, create_mesh

CFG = VAEConfig(base_dim=8, z_dim=16, dim_mult=(1, 1, 1, 1),
                num_res_blocks=1, temporal_downsample=(False, True, True))


@pytest.fixture(scope="module")
def setup():
    params = init_vae(jax.random.key(0), CFG)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(1, 16, 3, 8, 16)), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(1, 3, 9, 64, 128)) * 0.3,
                      jnp.float32)
    return params, z, vid


def _mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    return create_mesh(MeshConfig(data=2, fsdp=2, sp=2))


def test_sharded_decode_matches_unsharded(setup):
    params, z, _ = setup
    want = vae_decode(params, z, CFG, streaming=True)

    mesh = _mesh()
    # W sharded over ALL mesh axes (8-way): decode serves on the whole
    # slice, not just the sp axis
    sh = NamedSharding(mesh, P(None, None, None, ("data", "fsdp", "sp"),
                               None))
    got = jax.jit(lambda p, z: vae_decode(
        p, z, CFG, streaming=True, conv_impl="xla",
        spatial_sharding=sh))(params, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_sharded_encode_matches_unsharded(setup):
    params, _, vid = setup
    want = vae_encode(params, vid, CFG, streaming=True)

    mesh = _mesh()
    sh = NamedSharding(mesh, P(None, None, None, ("data", "fsdp", "sp"),
                               None))
    got = jax.jit(lambda p, v: vae_encode(
        p, v, CFG, streaming=True, conv_impl="xla",
        spatial_sharding=sh))(params, vid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_spatial_sharding_rejects_pallas(setup):
    params, z, _ = setup
    mesh = _mesh()
    sh = NamedSharding(mesh, P(None, None, None, "sp", None))
    with pytest.raises(ValueError, match="spatial_sharding requires"):
        vae_decode(params, z, CFG, streaming=True, conv_impl="pallas",
                   spatial_sharding=sh)
