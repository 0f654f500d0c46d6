"""Wan DiT tests: shapes, jit, scan-vs-loop parity, i2v branch, grads."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from omnihuman_tpu.configs.wan import DTypePolicy, WanModelConfig
from omnihuman_tpu.models.wan_dit import (
    count_params, init_wan_model, sinusoidal_embedding_1d, wan_model_forward)
from omnihuman_tpu.ops.rope import rope_angles_3d

TINY = WanModelConfig(
    model_type="t2v", dim=64, ffn_dim=128, num_heads=4, num_layers=2,
    freq_dim=32, text_dim=48, text_len=16, in_dim=16, out_dim=16)
TINY_I2V = dataclasses.replace(
    TINY, model_type="i2v", in_dim=36, clip_embed_dim=40, clip_tokens=5)
FP32 = DTypePolicy(compute=jnp.float32)

B, F, H, W = 2, 4, 8, 8  # latents; patch (1,2,2) → grid (4,4,4) → 64 tokens
GRID = (4, 4, 4)
SEQ = 64


def _inputs(cfg, key=0):
    rng = np.random.default_rng(key)
    x = jnp.asarray(rng.normal(size=(B, cfg.in_dim if cfg.model_type == "t2v"
                                     else 16, F, H, W)), jnp.float32)
    t = jnp.asarray([999.0, 500.0])
    ctx = jnp.asarray(rng.normal(size=(B, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    sin, cos = rope_angles_3d(GRID, cfg.head_dim, seq_len=SEQ)
    return x, t, ctx, sin, cos


def test_forward_shape_and_dtype():
    params = init_wan_model(jax.random.key(0), TINY)
    x, t, ctx, sin, cos = _inputs(TINY)
    v = wan_model_forward(params, x, t, ctx, cfg=TINY, seq_len=SEQ,
                          rope_sin=sin, rope_cos=cos, policy=FP32)
    assert v.shape == (B, 16, F, H, W)
    assert v.dtype == jnp.float32
    assert np.isfinite(np.asarray(v)).all()


def test_zero_head_init_gives_zero_velocity():
    # head weight is zero-initialised (reference model.py:612) but head bias
    # + zero weights → output == 0 exactly at init
    params = init_wan_model(jax.random.key(0), TINY)
    x, t, ctx, sin, cos = _inputs(TINY)
    v = wan_model_forward(params, x, t, ctx, cfg=TINY, seq_len=SEQ,
                          rope_sin=sin, rope_cos=cos, policy=FP32)
    np.testing.assert_allclose(np.asarray(v), 0.0)


def test_scan_tap_path_matches_plain_scan():
    """collect_layers runs a tap-scattering scan — the velocity output must
    equal the plain scan path, and the tap values must equal a manual
    unrolled per-layer recomputation."""
    params = init_wan_model(jax.random.key(1), TINY)
    x, t, ctx, sin, cos = _inputs(TINY)
    kw = dict(cfg=TINY, seq_len=SEQ, rope_sin=sin, rope_cos=cos, policy=FP32)
    v_scan = wan_model_forward(params, x, t, ctx, remat=False, **kw)
    v_tap, taps = wan_model_forward(params, x, t, ctx,
                                    collect_layers=(0, 1), **kw)
    np.testing.assert_allclose(np.asarray(v_scan), np.asarray(v_tap),
                               atol=1e-5, rtol=1e-5)
    assert set(taps) == {0, 1}
    assert taps[0].shape == (B, SEQ, TINY.dim)

    # tap values: manual unrolled loop over single-layer slices
    from omnihuman_tpu.models import wan_dit as wd
    import functools as ft
    b = x.shape[0]
    tokens = wd._patchify(params, x, TINY, FP32)
    e = wd.sinusoidal_embedding_1d(TINY.freq_dim, t)
    e = wd._linear(params["time_fc1"], e, jnp.float32)
    e = wd._linear(params["time_fc2"], jax.nn.silu(e))
    e0 = wd._linear(params["time_proj"], jax.nn.silu(e)).reshape(
        b, 6, TINY.dim)
    c = wd._linear(params["text_fc1"], ctx, jnp.float32)
    c = wd._linear(params["text_fc2"], jax.nn.gelu(c, approximate=True))
    seq_lens = jnp.full((b,), SEQ, jnp.int32)
    h = tokens
    for i in range(TINY.num_layers):
        bp = jax.tree.map(lambda l: l[i], params["blocks"])
        h = wd._block_forward(bp, h, e0, c, None, sin, cos, seq_lens,
                              TINY, FP32, "auto")
        np.testing.assert_allclose(np.asarray(taps[i]), np.asarray(h),
                                   atol=1e-5, rtol=1e-5)


def test_tap_scan_remat_and_subset():
    """Tap scan composes with remat and non-contiguous subsets."""
    params = init_wan_model(jax.random.key(3), dataclasses.replace(
        TINY, num_layers=4))
    cfg4 = dataclasses.replace(TINY, num_layers=4)
    x, t, ctx, sin, cos = _inputs(cfg4)
    kw = dict(cfg=cfg4, seq_len=SEQ, rope_sin=sin, rope_cos=cos, policy=FP32)
    v_all, taps_all = wan_model_forward(params, x, t, ctx, remat=False,
                                        collect_layers=(0, 1, 2, 3), **kw)
    v_sub, taps_sub = wan_model_forward(params, x, t, ctx, remat=True,
                                        collect_layers=(1, 3), **kw)
    np.testing.assert_allclose(np.asarray(v_all), np.asarray(v_sub),
                               atol=1e-5, rtol=1e-5)
    for i in (1, 3):
        np.testing.assert_allclose(np.asarray(taps_all[i]),
                                   np.asarray(taps_sub[i]),
                                   atol=1e-5, rtol=1e-5)


def test_grouped_remat_matches_flat_scan():
    """remat=<int g> (two-level sqrt-L checkpointing, the 14B training
    policy) must be numerically identical to the flat per-block scan,
    in both the forward and the gradient."""
    cfg4 = dataclasses.replace(TINY, num_layers=4)
    params = init_wan_model(jax.random.key(5), cfg4)
    params["head"]["w"] = jax.random.normal(
        jax.random.key(6), params["head"]["w"].shape) * 0.02
    x, t, ctx, sin, cos = _inputs(cfg4)
    kw = dict(cfg=cfg4, seq_len=SEQ, rope_sin=sin, rope_cos=cos, policy=FP32)

    def loss(params, remat):
        v = wan_model_forward(params, x, t, ctx, remat=remat, **kw)
        return jnp.sum(v * v)

    for g in (2, 4):
        v_flat = wan_model_forward(params, x, t, ctx, remat=True, **kw)
        v_grp = wan_model_forward(params, x, t, ctx, remat=g, **kw)
        np.testing.assert_allclose(np.asarray(v_grp), np.asarray(v_flat),
                                   atol=1e-5, rtol=1e-5)
        g_flat = jax.grad(loss)(params, True)
        g_grp = jax.grad(loss)(params, g)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4),
            g_flat, g_grp)


def test_jit_and_remat():
    params = init_wan_model(jax.random.key(2), TINY)
    x, t, ctx, sin, cos = _inputs(TINY)

    @jax.jit
    def f(params, x, t, ctx):
        return wan_model_forward(params, x, t, ctx, cfg=TINY, seq_len=SEQ,
                                 rope_sin=sin, rope_cos=cos, policy=FP32,
                                 remat=True)
    v = f(params, x, t, ctx)
    assert v.shape == (B, 16, F, H, W)


def test_grad_flows_to_all_params():
    params = init_wan_model(jax.random.key(3), TINY)
    # the head is zero-initialised (reference model.py:612) which blocks
    # upstream gradients at init — randomise it to test gradient plumbing
    params["head"]["w"] = jax.random.normal(
        jax.random.key(7), params["head"]["w"].shape) * 0.02
    x, t, ctx, sin, cos = _inputs(TINY)

    def loss(params):
        v = wan_model_forward(params, x, t, ctx, cfg=TINY, seq_len=SEQ,
                              rope_sin=sin, rope_cos=cos, policy=FP32)
        return jnp.mean(jnp.square(v - 1.0))

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves_with_path(g)
    nonzero = sum(bool(np.any(np.asarray(v) != 0)) for _, v in flat)
    # every leaf except a handful (e.g. padding-only paths) must get grad
    assert nonzero / len(flat) > 0.9, f"only {nonzero}/{len(flat)} leaves"


def test_i2v_branch():
    params = init_wan_model(jax.random.key(4), TINY_I2V)
    x, t, ctx, sin, cos = _inputs(TINY_I2V)
    rng = np.random.default_rng(9)
    y = jnp.asarray(rng.normal(size=(B, 20, F, H, W)), jnp.float32)
    clip_fea = jnp.asarray(
        rng.normal(size=(B, TINY_I2V.clip_tokens, TINY_I2V.clip_embed_dim)),
        jnp.float32)
    v = wan_model_forward(params, x, t, ctx, cfg=TINY_I2V, seq_len=SEQ,
                          rope_sin=sin, rope_cos=cos, policy=FP32,
                          clip_fea=clip_fea, y=y)
    assert v.shape == (B, 16, F, H, W)
    assert np.isfinite(np.asarray(v)).all()


def test_seq_padding_does_not_change_valid_tokens():
    """Extra padded sequence positions must not alter the result
    (k_lens masking in self-attention)."""
    params = init_wan_model(jax.random.key(5), TINY)
    x, t, ctx, sin, cos = _inputs(TINY)
    kw = dict(cfg=TINY, policy=FP32)
    v1 = wan_model_forward(params, x, t, ctx, seq_len=SEQ,
                           rope_sin=sin, rope_cos=cos, **kw)
    sin2, cos2 = rope_angles_3d(GRID, TINY.head_dim, seq_len=SEQ + 16)
    v2 = wan_model_forward(params, x, t, ctx, seq_len=SEQ + 16,
                           rope_sin=sin2, rope_cos=cos2, **kw)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               atol=1e-5, rtol=1e-5)


def test_sinusoidal_embedding_matches_reference_ordering():
    """cat(cos, sin) like model.py:17-27."""
    e = np.asarray(sinusoidal_embedding_1d(8, jnp.asarray([0.0])))
    np.testing.assert_allclose(e[0, :4], 1.0)   # cos(0)
    np.testing.assert_allclose(e[0, 4:], 0.0)   # sin(0)


def test_param_count_tiny():
    params = init_wan_model(jax.random.key(0), TINY)
    n = count_params(params)
    assert 50_000 < n < 500_000
