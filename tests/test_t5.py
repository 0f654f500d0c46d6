"""umT5 encoder tests."""

import jax
import jax.numpy as jnp
import numpy as np

from omnihuman_tpu.configs.wan import T5Config
from omnihuman_tpu.models.t5 import (
    count_t5_params, init_t5_encoder, relative_position_buckets, t5_encode)

TINY = T5Config(vocab_size=100, dim=32, dim_attn=32, dim_ffn=64,
                num_heads=4, num_layers=2)


def test_bucket_matrix_matches_reference_semantics():
    """torch reference _relative_position_bucket (t5.py:256-275)."""
    import torch

    def torch_buckets(lq, lk, num_buckets=32, max_dist=128):
        rel_pos = torch.arange(lk)[None, :] - torch.arange(lq)[:, None]
        nb = num_buckets // 2
        rel_buckets = (rel_pos > 0).long() * nb
        rel_pos = torch.abs(rel_pos)
        max_exact = nb // 2
        rel_large = max_exact + (
            torch.log(rel_pos.float() / max_exact)
            / np.log(max_dist / max_exact) * (nb - max_exact)).long()
        rel_large = torch.min(rel_large,
                              torch.full_like(rel_large, nb - 1))
        rel_buckets += torch.where(rel_pos < max_exact, rel_pos, rel_large)
        return rel_buckets.numpy()

    got = relative_position_buckets(64, 64, 32, 128)
    want = torch_buckets(64, 64)
    np.testing.assert_array_equal(got, want)


def test_encode_shape_and_mask():
    params = init_t5_encoder(jax.random.key(0), TINY)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 16)),
                      jnp.int32)
    mask = jnp.asarray([[1] * 16, [1] * 5 + [0] * 11], jnp.int32)
    out = t5_encode(params, ids, mask, TINY, compute_dtype=jnp.float32)
    assert out.shape == (2, 16, 32)
    # padded positions zeroed (reference trims per-sample, t5.py:529)
    np.testing.assert_allclose(np.asarray(out[1, 5:]), 0.0)
    assert np.isfinite(np.asarray(out)).all()


def test_padding_does_not_affect_valid_tokens():
    params = init_t5_encoder(jax.random.key(1), TINY)
    rng = np.random.default_rng(1)
    ids_short = jnp.asarray(rng.integers(1, 100, (1, 8)), jnp.int32)
    mask5 = jnp.asarray([[1] * 5 + [0] * 3], jnp.int32)
    out1 = t5_encode(params, ids_short, mask5, TINY,
                     compute_dtype=jnp.float32)
    # change the padded ids — valid outputs must not move
    ids2 = np.asarray(ids_short).copy()
    ids2[:, 5:] = 7
    out2 = t5_encode(params, jnp.asarray(ids2), mask5, TINY,
                     compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out1[:, :5]),
                               np.asarray(out2[:, :5]), atol=1e-5)


def test_umt5_xxl_param_count():
    """umt5-xxl encoder ≈ 5.3B params (sanity against the real config)."""
    cfg = T5Config()
    # count analytically instead of materialising 5B params
    per_block = (cfg.dim * cfg.dim_attn * 3 + cfg.dim_attn * cfg.dim
                 + cfg.num_buckets * cfg.num_heads
                 + cfg.dim * 2 + cfg.dim * cfg.dim_ffn * 2
                 + cfg.dim_ffn * cfg.dim)
    total = cfg.vocab_size * cfg.dim + cfg.num_layers * per_block + cfg.dim
    assert 5.0e9 < total < 6.5e9


def test_jit_encode():
    params = init_t5_encoder(jax.random.key(2), TINY)
    ids = jnp.zeros((1, 16), jnp.int32)
    mask = jnp.ones((1, 16), jnp.int32)
    f = jax.jit(lambda p, i, m: t5_encode(p, i, m, TINY))
    out = f(params, ids, mask)
    assert out.shape == (1, 16, 32)


def test_text_encoder_cache_eviction_keeps_current_batch():
    """Cache eviction must never drop prompts referenced by the current
    batch (a wholesale clear() used to KeyError at the final stack)."""
    from omnihuman_tpu.models.t5 import T5TextEncoder

    class _Tok:
        def __call__(self, prompts, return_mask=True):
            import numpy as _np
            ids = _np.ones((len(prompts), 4), _np.int32)
            return ids, _np.ones_like(ids)

    enc = T5TextEncoder.__new__(T5TextEncoder)
    enc.tokenizer = _Tok()
    enc.params = None
    enc._encode = lambda p, ids, mask: np.zeros(
        (ids.shape[0], 4, 8), np.float32)
    enc._cache, enc._cache_size = {}, 3
    enc(["a", "b", "c"])                     # fill to capacity
    out = enc(["a", "d", "e"])               # a cached, d/e new → evict b/c
    assert out.shape == (3, 4, 8)
    assert "a" in enc._cache and "d" in enc._cache and "e" in enc._cache
    assert len(enc._cache) <= 3 + 1
