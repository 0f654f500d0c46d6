"""Ring attention parity tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.ops.attention import attention_xla
from omnihuman_tpu.ops.ring_attention import ring_attention
from omnihuman_tpu.parallel import MeshConfig, create_mesh


@pytest.fixture(scope="module")
def sp_mesh():
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    return create_mesh(MeshConfig(data=jax.device_count() // 4, fsdp=1,
                                  sp=4))


def test_ring_matches_dense(sp_mesh, rng):
    b, l, n, d = 2, 32, 2, 16
    q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)

    got = ring_attention(q, k, v, sp_mesh, compute_dtype=jnp.float32)
    want = attention_xla(q, k, v, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_ring_varlen_global_mask(sp_mesh, rng):
    """seq_lens cross shard boundaries: 20 valid of 32 over 4 shards of 8
    — shard 2 half-valid, shard 3 fully masked."""
    b, l, n, d = 2, 32, 2, 16
    q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    lens = jnp.asarray([20, 9], jnp.int32)

    got = ring_attention(q, k, v, sp_mesh, seq_lens=lens,
                         compute_dtype=jnp.float32)
    want = attention_xla(q, k, v, k_lens=lens, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_ring_grad_matches_dense(sp_mesh, rng):
    b, l, n, d = 1, 16, 2, 8
    q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)

    def loss_ring(q, k, v):
        o = ring_attention(q, k, v, sp_mesh, compute_dtype=jnp.float32)
        return jnp.sum(jnp.square(o))

    def loss_dense(q, k, v):
        o = attention_xla(q, k, v, compute_dtype=jnp.float32)
        return jnp.sum(jnp.square(o))

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


def test_ring_flash_vs_dense_impl_varlen_grad(sp_mesh, rng):
    """The Pallas-composed ring (impl='flash', VERDICT missing #2) matches
    the dense-chunk ring AND the global dense golden, values + grads, with
    a seq_lens that fully masks the last shard."""
    b, l, n, d = 2, 32, 2, 16
    q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    lens = jnp.asarray([24, 13], jnp.int32)

    def loss(impl):
        def f(q, k, v):
            o = ring_attention(q, k, v, sp_mesh, seq_lens=lens,
                               compute_dtype=jnp.float32, impl=impl)
            # rows past seq_lens are garbage by contract — mask them
            valid = jnp.arange(l)[None, :, None, None] < lens[:, None,
                                                               None, None]
            return jnp.sum(jnp.square(jnp.where(valid, o, 0.0)))
        return f

    o_flash = ring_attention(q, k, v, sp_mesh, seq_lens=lens,
                             compute_dtype=jnp.float32, impl="flash")
    o_dense = attention_xla(q, k, v, k_lens=lens, compute_dtype=jnp.float32)
    valid = np.arange(l)[None, :, None, None] < np.asarray(lens)[:, None,
                                                                 None, None]
    np.testing.assert_allclose(np.asarray(o_flash) * valid,
                               np.asarray(o_dense) * valid,
                               atol=2e-4, rtol=2e-4)

    gf = jax.grad(loss("flash"), argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss("dense"), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


def test_ulysses_flash_matches_dense(sp_mesh, rng):
    b, l, n, d = 1, 32, 4, 16
    q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    lens = jnp.asarray([27], jnp.int32)

    from omnihuman_tpu.ops.ring_attention import ulysses_attention
    got = ulysses_attention(q, k, v, sp_mesh, seq_lens=lens,
                            compute_dtype=jnp.float32, impl="flash")
    want = attention_xla(q, k, v, k_lens=lens, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_ring_inside_jit_with_sharded_inputs(sp_mesh, rng):
    from jax.sharding import NamedSharding, PartitionSpec as P
    b, l, n, d = 1, 32, 2, 8
    q = jax.device_put(
        jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32),
        NamedSharding(sp_mesh, P(None, "sp")))

    @jax.jit
    def f(q):
        return ring_attention(q, q, q, sp_mesh, compute_dtype=jnp.float32)

    got = f(q)
    want = attention_xla(q, q, q, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_sp_cross_attention_matches_dense(sp_mesh, rng):
    """sp_cross: q tokens sharded, short replicated K/V — forward and
    grads match dense; this is the DiT cross-attention path under sp."""
    from omnihuman_tpu.ops.ring_attention import sp_cross_attention
    b, lq, lk, n, d = 2, 32, 12, 2, 16
    q = jnp.asarray(rng.normal(size=(b, lq, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, lk, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lk, n, d)), jnp.float32)
    lens = jnp.asarray([12, 7], jnp.int32)

    got = sp_cross_attention(q, k, v, sp_mesh, k_lens=lens,
                             compute_dtype=jnp.float32)
    want = attention_xla(q, k, v, k_lens=lens, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)

    w = jnp.asarray(rng.normal(size=(b, lq, n, d)), jnp.float32)

    def loss(fn):
        f = lambda q, k, v: jnp.sum(fn(q, k, v) * w)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    gd = loss(lambda q, k, v: attention_xla(
        q, k, v, k_lens=lens, compute_dtype=jnp.float32))
    gs = loss(lambda q, k, v: sp_cross_attention(
        q, k, v, sp_mesh, k_lens=lens, compute_dtype=jnp.float32))
    for a, g, nm in zip(gd, gs, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   atol=5e-4, rtol=5e-4, err_msg=f"d{nm}")


MASKS = [dict(causal=True), dict(window_size=(5, 3)),
         dict(causal=True, window_size=(7, -1))]


@pytest.mark.parametrize("impl", ["flash", "dense"])
@pytest.mark.parametrize("mask", MASKS)
def test_ring_causal_window_global_offsets(sp_mesh, rng, impl, mask):
    """Causal/window masks under the ring (VERDICT r4 item 7): every
    chunk's mask is offset to GLOBAL coordinates, so the sharded result
    matches unsharded dense attention — including with a varlen
    seq_lens that crosses shard boundaries."""
    b, l, n, d = 2, 32, 2, 16
    q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    lens = jnp.asarray([26, 11], jnp.int32)

    got = ring_attention(q, k, v, sp_mesh, seq_lens=lens, impl=impl,
                         compute_dtype=jnp.float32, **mask)
    want = attention_xla(q, k, v, k_lens=lens,
                         compute_dtype=jnp.float32, **mask)
    # q rows past seq_lens[b] are don't-care (contract: the caller never
    # reads them; dense gives a uniform average, flash gives 0) — compare
    # the VALID rows, where the window always contains the diagonal
    for bi, ln in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(np.asarray(got)[bi, :ln],
                                   np.asarray(want)[bi, :ln],
                                   atol=2e-4, rtol=2e-4)


def test_ring_causal_grads_match_dense(sp_mesh, rng):
    b, l, n, d = 1, 32, 2, 16
    q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)

    def grads(fn):
        return jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v) * w),
                        argnums=(0, 1, 2))(q, k, v)

    gr = grads(lambda q, k, v: ring_attention(
        q, k, v, sp_mesh, impl="flash", causal=True, window_size=(9, -1),
        compute_dtype=jnp.float32))
    gd = grads(lambda q, k, v: attention_xla(
        q, k, v, causal=True, window_size=(9, -1),
        compute_dtype=jnp.float32))
    for a, b_, nm in zip(gr, gd, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4, err_msg=f"d{nm}")


@pytest.mark.parametrize("mask", MASKS)
def test_ulysses_causal_window(sp_mesh, rng, mask):
    from omnihuman_tpu.ops.ring_attention import ulysses_attention
    b, l, n, d = 1, 32, 4, 16
    q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    got = ulysses_attention(q, k, v, sp_mesh,
                            compute_dtype=jnp.float32, **mask)
    want = attention_xla(q, k, v, compute_dtype=jnp.float32, **mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("mask", MASKS)
def test_sp_cross_causal_window(sp_mesh, rng, mask):
    """sp-sharded queries vs replicated K/V with causal/window masks:
    the per-shard q offset must reproduce dense end-aligned semantics
    (lq != lk exercises the diagonal alignment)."""
    from omnihuman_tpu.ops.ring_attention import sp_cross_attention
    b, lq, lk, n, d = 2, 32, 12, 2, 16
    q = jnp.asarray(rng.normal(size=(b, lq, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, lk, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lk, n, d)), jnp.float32)
    lens = jnp.asarray([12, 7], jnp.int32)
    got = sp_cross_attention(q, k, v, sp_mesh, k_lens=lens,
                             compute_dtype=jnp.float32, **mask)
    want = attention_xla(q, k, v, k_lens=lens,
                         compute_dtype=jnp.float32, **mask)
    # rows whose end-aligned causal/window strip contains NO valid key
    # are don't-care (dense: uniform average; flash: 0) — compare rows
    # with at least one valid key
    qi = np.arange(lq)[:, None] + (lk - lq)
    ki = np.arange(lk)[None, :]
    valid = ki < np.asarray(lens)[:, None, None]
    if mask.get("causal"):
        valid = valid & (ki <= qi)
    left, right = mask.get("window_size", (-1, -1))
    if left >= 0:
        valid = valid & (qi - ki <= left)
    if right >= 0:
        valid = valid & (ki - qi <= right)
    rows = valid.any(-1)                             # [B, Lq]
    np.testing.assert_allclose(np.asarray(got)[rows],
                               np.asarray(want)[rows],
                               atol=2e-4, rtol=2e-4)
    assert rows.sum() >= 8                           # test isn't vacuous


def test_mesh_dispatch_carries_masks(sp_mesh, rng):
    """flash_attention(implementation='ring'/'ulysses') under a mesh now
    honors causal/window (formerly NotImplementedError)."""
    from omnihuman_tpu.ops.attention import flash_attention
    from omnihuman_tpu.parallel.mesh import use_mesh
    b, l, n, d = 1, 32, 4, 16
    q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    want = attention_xla(q, k, v, causal=True, compute_dtype=jnp.float32)
    with use_mesh(sp_mesh):
        for impl in ("ring", "ulysses"):
            got = flash_attention(q, k, v, causal=True, dtype=jnp.float32,
                                  implementation=impl)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4, rtol=2e-4,
                                       err_msg=impl)
