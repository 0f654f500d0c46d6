"""Unit tests for core ops: norms, RoPE, attention (XLA + Pallas parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.ops.attention import attention_xla, flash_attention
from omnihuman_tpu.ops.flash_pallas import pallas_flash_attention
from omnihuman_tpu.ops.norms import adaln_modulate, layer_norm, rms_norm
from omnihuman_tpu.ops.rope import apply_rope, rope_angles_3d, rope_dim_split


# ---------------------------------------------------------------------------
# norms


def test_rms_norm_matches_manual(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    got = rms_norm(x, w, eps=1e-5)
    want = x / np.sqrt(np.mean(np.square(np.asarray(x)), -1, keepdims=True)
                       + 1e-5) * np.asarray(w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_rms_norm_bf16_keeps_dtype(rng):
    x = jnp.asarray(rng.normal(size=(2, 8)), jnp.bfloat16)
    assert rms_norm(x).dtype == jnp.bfloat16


def test_layer_norm_zero_mean_unit_var(rng):
    x = jnp.asarray(rng.normal(loc=3.0, scale=2.0, size=(4, 32)), jnp.float32)
    y = np.asarray(layer_norm(x))
    np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.var(-1), 1.0, atol=1e-3)


def test_adaln_modulate_fp32(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 8)), jnp.bfloat16)
    shift = jnp.zeros((2, 1, 8), jnp.float32)
    scale = jnp.zeros((2, 1, 8), jnp.float32)
    y = adaln_modulate(x, shift, scale)
    assert y.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(x, np.float32), atol=1e-6)


# ---------------------------------------------------------------------------
# rope


def test_rope_dim_split_wan_head_dim():
    # d=128 → (22, 21, 21) pairs, matching the reference split
    # (model.py:485-492: d-4(d//6), 2(d//6), 2(d//6) dims)
    assert rope_dim_split(128) == (22, 21, 21)
    assert sum(rope_dim_split(128)) == 64


def test_rope_identity_on_padding():
    sin, cos = rope_angles_3d((2, 2, 2), 8, seq_len=12)
    assert sin.shape == (12, 4)
    np.testing.assert_allclose(np.asarray(sin[8:]), 0.0)
    np.testing.assert_allclose(np.asarray(cos[8:]), 1.0)


def test_rope_preserves_norm(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 3, 8)), jnp.float32)
    sin, cos = rope_angles_3d((2, 2, 2), 8)
    y = apply_rope(x, sin, cos)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)


def test_rope_matches_reference_complex_semantics(rng):
    """Adjacent-pair rotation == complex multiply (model.py:53-63)."""
    d = 12
    f, h, w = 2, 2, 2
    x = rng.normal(size=(1, f * h * w, 1, d)).astype(np.float32)
    sin, cos = rope_angles_3d((f, h, w), d)
    got = np.asarray(apply_rope(jnp.asarray(x), sin, cos))

    # reference semantics via numpy complex math
    fp, hp, wp = rope_dim_split(d)
    theta = 10000.0
    def inv(pairs):
        dd = 2 * pairs
        return theta ** (-np.arange(0, dd, 2) / dd)
    ang = np.concatenate([
        np.broadcast_to((np.arange(f)[:, None] * inv(fp))[:, None, None, :],
                        (f, h, w, fp)),
        np.broadcast_to((np.arange(h)[:, None] * inv(hp))[None, :, None, :],
                        (f, h, w, hp)),
        np.broadcast_to((np.arange(w)[:, None] * inv(wp))[None, None, :, :],
                        (f, h, w, wp)),
    ], -1).reshape(f * h * w, d // 2)
    xc = x.reshape(1, -1, 1, d // 2, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    rot = xc * np.exp(1j * ang)[None, :, None, :]
    want = np.stack([rot.real, rot.imag], -1).reshape(x.shape)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)


def test_rope_shard_offset_slices_global_table():
    sin_full, cos_full = rope_angles_3d((2, 4, 4), 8)
    sin_s, cos_s = rope_angles_3d((2, 4, 4), 8, shard_offset=8, shard_len=8)
    np.testing.assert_allclose(np.asarray(sin_s), np.asarray(sin_full[8:16]))
    np.testing.assert_allclose(np.asarray(cos_s), np.asarray(cos_full[8:16]))


# ---------------------------------------------------------------------------
# attention


def _naive_attention(q, k, v, k_lens=None, causal=False, window=(-1, -1)):
    b, lq, n, d = q.shape
    lk = k.shape[1]
    out = np.zeros_like(q)
    for bi in range(b):
        kl = lk if k_lens is None else int(k_lens[bi])
        for ni in range(n):
            s = q[bi, :, ni] @ k[bi, :, ni].T / np.sqrt(d)
            mask = np.zeros((lq, lk), bool)
            mask[:, kl:] = True
            qi = np.arange(lq)[:, None] + (lk - lq)
            ki = np.arange(lk)[None, :]
            if causal:
                mask |= ki > qi
            if window[0] >= 0:
                mask |= (qi - ki) > window[0]
            if window[1] >= 0:
                mask |= (ki - qi) > window[1]
            s = np.where(mask, -1e30, s)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[bi, :, ni] = p @ v[bi, :, ni]
    return out


@pytest.mark.parametrize("causal", [False, True])
def test_attention_xla_matches_naive(rng, causal):
    q = rng.normal(size=(2, 16, 2, 8)).astype(np.float32)
    k = rng.normal(size=(2, 24, 2, 8)).astype(np.float32)
    v = rng.normal(size=(2, 24, 2, 8)).astype(np.float32)
    k_lens = np.array([24, 13], np.int32)
    got = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        k_lens=jnp.asarray(k_lens), causal=causal,
                        compute_dtype=jnp.float32)
    want = _naive_attention(q, k, v, k_lens, causal=causal)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_attention_xla_window(rng):
    q = rng.normal(size=(1, 16, 1, 8)).astype(np.float32)
    k = rng.normal(size=(1, 16, 1, 8)).astype(np.float32)
    v = rng.normal(size=(1, 16, 1, 8)).astype(np.float32)
    got = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        window_size=(4, 4), compute_dtype=jnp.float32)
    want = _naive_attention(q, k, v, window=(4, 4))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("lq,lk,klens,causal,window,cq,ck", [
    (64, 64, None, False, (-1, -1), 16, 16),
    (64, 96, (96, 40), False, (-1, -1), 16, 32),
    (100, 100, (100, 7), False, (-1, -1), 32, 32),  # padding path
    (48, 48, None, True, (-1, -1), 16, 16),
    (40, 56, (56, 48), False, (16, 16), 16, 16),
])
def test_attention_xla_chunked_matches_dense(rng, lq, lk, klens, causal,
                                             window, cq, ck):
    """Two-level scan flash (plain XLA) == dense attention_xla."""
    from omnihuman_tpu.ops.attention import attention_xla_chunked
    b, n, d = 2, 2, 16
    q = rng.normal(size=(b, lq, n, d)).astype(np.float32)
    k = rng.normal(size=(b, lk, n, d)).astype(np.float32)
    v = rng.normal(size=(b, lk, n, d)).astype(np.float32)
    kl = jnp.asarray(klens, jnp.int32) if klens else None
    kw = dict(k_lens=kl, causal=causal, window_size=window,
              compute_dtype=jnp.float32)
    want = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         **kw)
    got = attention_xla_chunked(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), chunk_q=cq, chunk_k=ck,
                                **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_attention_xla_chunked_grad_matches_dense(rng):
    """The flash custom VJP == autodiff of the dense path."""
    from omnihuman_tpu.ops.attention import attention_xla_chunked
    b, n, d, lq, lk = 2, 2, 16, 48, 80
    q = rng.normal(size=(b, lq, n, d)).astype(np.float32)
    k = rng.normal(size=(b, lk, n, d)).astype(np.float32)
    v = rng.normal(size=(b, lk, n, d)).astype(np.float32)
    kl = jnp.asarray((80, 50), jnp.int32)
    w = rng.normal(size=(b, lq, n, d)).astype(np.float32)

    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v)
            return jnp.sum(o * jnp.asarray(w))
        return jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    dense = loss(lambda q, k, v: attention_xla(
        q, k, v, k_lens=kl, compute_dtype=jnp.float32))
    chunk = loss(lambda q, k, v: attention_xla_chunked(
        q, k, v, k_lens=kl, compute_dtype=jnp.float32,
        chunk_q=16, chunk_k=32))
    for g_d, g_c, name in zip(dense, chunk, "qkv"):
        np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_d),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name}")


@pytest.mark.parametrize("lq,lk,klens", [
    (64, 64, None),
    (64, 96, (96, 40)),
    (100, 100, (100, 7)),   # non-multiple of block → padding path
])
def test_pallas_flash_matches_xla(rng, lq, lk, klens):
    b, n, d = 2, 2, 32
    q = rng.normal(size=(b, lq, n, d)).astype(np.float32)
    k = rng.normal(size=(b, lk, n, d)).astype(np.float32)
    v = rng.normal(size=(b, lk, n, d)).astype(np.float32)
    kl = None if klens is None else jnp.asarray(np.array(klens, np.int32))
    got = pallas_flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), k_lens=kl,
        compute_dtype=jnp.float32, block_q=32, block_k=32, interpret=True,
        precision=jax.lax.Precision.HIGHEST)
    want = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         k_lens=kl, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_pallas_flash_causal(rng):
    b, n, d, l = 1, 2, 32, 64
    q = rng.normal(size=(b, l, n, d)).astype(np.float32)
    k = rng.normal(size=(b, l, n, d)).astype(np.float32)
    v = rng.normal(size=(b, l, n, d)).astype(np.float32)
    got = pallas_flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True,
        compute_dtype=jnp.float32, block_q=32, block_k=32, interpret=True,
        precision=jax.lax.Precision.HIGHEST)
    want = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         causal=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_pallas_flash_grad_matches_xla(rng):
    b, n, d, lq, lk = 1, 2, 32, 64, 64
    q = jnp.asarray(rng.normal(size=(b, lq, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, lk, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lk, n, d)), jnp.float32)
    kl = jnp.asarray(np.array([40], np.int32))

    def loss_pallas(q, k, v):
        o = pallas_flash_attention(q, k, v, k_lens=kl,
                                   compute_dtype=jnp.float32,
                                   block_q=32, block_k=32, interpret=True,
                                   precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(jnp.square(o))

    def loss_xla(q, k, v):
        o = attention_xla(q, k, v, k_lens=kl, compute_dtype=jnp.float32)
        return jnp.sum(jnp.square(o))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-3, rtol=5e-3)


def test_apply_rope_inverse_roundtrip(rng):
    from omnihuman_tpu.ops.rope import apply_rope, rope_angles_3d
    x = jnp.asarray(rng.normal(size=(2, 48, 3, 8)), jnp.float32)
    sin, cos = rope_angles_3d((3, 4, 4), 8, seq_len=48)
    back = apply_rope(apply_rope(x, sin, cos), sin, cos, inverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_flash_attention_dispatcher_cpu(rng):
    q = jnp.asarray(rng.normal(size=(1, 8, 1, 8)), jnp.float32)
    out = flash_attention(q, q, q)
    assert out.shape == q.shape


def test_pallas_flash_zero_klen_row(rng):
    """k_len=0 sample: output must be exactly zero (all-masked first tile
    regression for the full-tile fast path)."""
    q = jnp.asarray(rng.normal(size=(2, 64, 2, 32)), jnp.float32)
    kl = jnp.asarray(np.array([64, 0], np.int32))
    out = pallas_flash_attention(q, q, q, k_lens=kl,
                                 compute_dtype=jnp.float32,
                                 block_q=32, block_k=32, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)
    want = attention_xla(q[:1], q[:1], q[:1], compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want[0]),
                               atol=2e-3)
