"""Fused AdaLN-FFN kernels: interpret-mode parity vs the XLA block math.

Bars follow the VAE-kernel convention: the kernel must be at least as
close to an fp32 golden as the bf16 XLA path it replaces."""

import numpy as np

import jax
import jax.numpy as jnp

from omnihuman_tpu.ops.ffn_pallas import (
    fused_adaln_ffn, gelu_gemm_gate_add, ln_mod_gemm)
from omnihuman_tpu.ops.norms import layer_norm

B, S, D, F = 2, 128, 256, 512
EPS = 1e-6


def _data(seed=0, dtype=jnp.bfloat16):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=(B, S, D)), jnp.float32)
    scale = jnp.asarray(r.normal(size=(B, 1, D)) * 0.1, jnp.float32)
    shift = jnp.asarray(r.normal(size=(B, 1, D)) * 0.1, jnp.float32)
    gate = jnp.asarray(r.normal(size=(B, 1, D)) * 0.1, jnp.float32)
    fc1 = {"w": jnp.asarray(r.normal(size=(D, F)) * 0.05, dtype),
           "b": jnp.asarray(r.normal(size=(F,)) * 0.02, dtype)}
    fc2 = {"w": jnp.asarray(r.normal(size=(F, D)) * 0.05, dtype),
           "b": jnp.asarray(r.normal(size=(D,)) * 0.02, dtype)}
    return x, scale, shift, gate, fc1, fc2


def _xla_ffn(x, scale, shift, gate, fc1, fc2, compute=jnp.bfloat16):
    """The exact block math (models/wan_dit.py:291-297)."""
    h = layer_norm(x, eps=EPS, out_dtype=jnp.float32)
    h = h * (1.0 + scale) + shift
    h = h.astype(compute) @ fc1["w"].astype(compute) + fc1["b"].astype(
        compute)
    h = jax.nn.gelu(h, approximate=True)
    h = h @ fc2["w"].astype(compute) + fc2["b"].astype(compute)
    return x + h.astype(jnp.float32) * gate


def test_ln_mod_gemm_parity():
    x, scale, shift, _, fc1, _ = _data()
    got = ln_mod_gemm(x, scale[:, 0], shift[:, 0], fc1["w"], fc1["b"],
                      eps=EPS, interpret=True)
    h = layer_norm(x, eps=EPS, out_dtype=jnp.float32)
    h = h * (1.0 + scale) + shift
    want_bf16 = (h.astype(jnp.bfloat16) @ fc1["w"] + fc1["b"])
    golden = h @ fc1["w"].astype(jnp.float32) + fc1["b"].astype(jnp.float32)

    err_kernel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - golden)))
    err_xla = float(jnp.max(jnp.abs(
        want_bf16.astype(jnp.float32) - golden)))
    assert got.shape == (B, S, F) and got.dtype == jnp.bfloat16
    assert err_kernel <= err_xla * 1.5 + 1e-5, (err_kernel, err_xla)


def test_gelu_gemm_gate_add_parity():
    x, _, _, gate, fc1, fc2 = _data(1)
    r = np.random.default_rng(2)
    mid = jnp.asarray(r.normal(size=(B, S, F)), jnp.bfloat16)
    got = gelu_gemm_gate_add(mid, fc2["w"], fc2["b"], gate[:, 0], x,
                             block_k=128, interpret=True)

    gm = jax.nn.gelu(mid, approximate=True)
    want_bf16 = x + (gm @ fc2["w"] + fc2["b"]).astype(jnp.float32) * gate
    gm32 = jax.nn.gelu(mid.astype(jnp.float32), approximate=True)
    golden = x + (gm32 @ fc2["w"].astype(jnp.float32)
                  + fc2["b"].astype(jnp.float32)) * gate

    err_kernel = float(jnp.max(jnp.abs(got - golden)))
    err_xla = float(jnp.max(jnp.abs(want_bf16 - golden)))
    assert got.shape == (B, S, D) and got.dtype == jnp.float32
    assert err_kernel <= err_xla * 1.5 + 1e-5, (err_kernel, err_xla)


def test_fused_adaln_ffn_matches_block_math():
    x, scale, shift, gate, fc1, fc2 = _data(3)
    got = fused_adaln_ffn(x, scale, shift, gate, fc1, fc2, eps=EPS,
                          interpret=True)
    want = _xla_ffn(x, scale, shift, gate, fc1, fc2)
    golden = _xla_ffn(x, scale, shift, gate,
                      jax.tree.map(lambda t: t.astype(jnp.float32), fc1),
                      jax.tree.map(lambda t: t.astype(jnp.float32), fc2),
                      compute=jnp.float32)
    err_kernel = float(jnp.max(jnp.abs(got - golden)))
    err_xla = float(jnp.max(jnp.abs(want - golden)))
    assert err_kernel <= err_xla * 1.5 + 1e-5, (err_kernel, err_xla)


def test_odd_dims_single_block_fallback():
    """Tiny/odd dims (not 128-multiples) take the whole-array block path."""
    r = np.random.default_rng(4)
    x = jnp.asarray(r.normal(size=(1, 24, 40)), jnp.float32)
    sc = jnp.zeros((1, 1, 40)); sh = jnp.zeros((1, 1, 40))
    g = jnp.ones((1, 1, 40))
    fc1 = {"w": jnp.asarray(r.normal(size=(40, 72)) * 0.1, jnp.bfloat16),
           "b": jnp.zeros((72,), jnp.bfloat16)}
    fc2 = {"w": jnp.asarray(r.normal(size=(72, 40)) * 0.1, jnp.bfloat16),
           "b": jnp.zeros((40,), jnp.bfloat16)}
    got = fused_adaln_ffn(x, sc, sh, g, fc1, fc2, interpret=True)
    want = _xla_ffn(x, sc, sh, g, fc1, fc2)
    assert float(jnp.max(jnp.abs(got - want))) < 5e-2


def test_wan_forward_ffn_impl_parity():
    """wan_model_forward(ffn_impl='interpret') == the XLA path at the
    tiny model config."""
    import math
    from omnihuman_tpu.configs.wan import TINY_TEST
    from omnihuman_tpu.models.wan_dit import (init_wan_model,
                                              wan_model_forward)
    from omnihuman_tpu.ops.rope import rope_angles_3d

    cfg = TINY_TEST.model
    r = np.random.default_rng(0)
    params = init_wan_model(jax.random.key(0), cfg)
    params["head"]["w"] = jnp.asarray(
        r.normal(size=params["head"]["w"].shape) * 0.1, jnp.float32)
    Fr, H, W = 3, 8, 8
    grid = (Fr // cfg.patch_size[0], H // cfg.patch_size[1],
            W // cfg.patch_size[2])
    n_tok = math.prod(grid)
    sin, cos = rope_angles_3d(grid, cfg.head_dim, seq_len=n_tok)
    x = jnp.asarray(r.normal(size=(2, cfg.in_dim, Fr, H, W)), jnp.float32)
    t = jnp.asarray([500.0, 250.0], jnp.float32)
    ctx = jnp.asarray(r.normal(size=(2, 16, cfg.text_dim)), jnp.float32)

    kw = dict(cfg=cfg, seq_len=n_tok, rope_sin=sin, rope_cos=cos,
              remat=False)
    v_xla = wan_model_forward(params, x, t, ctx, **kw)
    v_fused = wan_model_forward(params, x, t, ctx, ffn_impl="interpret",
                                **kw)
    err = float(jnp.max(jnp.abs(v_fused - v_xla)))
    scale = float(jnp.max(jnp.abs(v_xla))) + 1e-6
    assert err / scale < 2e-2, (err, scale)


def test_wan_forward_ffn_impl_parity_i2v():
    """i2v variant: the fused cross-attention path includes the CLIP
    image-token branch (separate K/V projections)."""
    import dataclasses
    import math
    from omnihuman_tpu.configs.wan import TINY_TEST
    from omnihuman_tpu.models.wan_dit import (init_wan_model,
                                              wan_model_forward)
    from omnihuman_tpu.ops.rope import rope_angles_3d

    cfg = dataclasses.replace(TINY_TEST.model, model_type="i2v",
                              in_dim=36, clip_tokens=4,
                              clip_embed_dim=48)
    r = np.random.default_rng(5)
    params = init_wan_model(jax.random.key(1), cfg)
    params["head"]["w"] = jnp.asarray(
        r.normal(size=params["head"]["w"].shape) * 0.1, jnp.float32)
    Fr, H, W = 3, 8, 8
    grid = (Fr // cfg.patch_size[0], H // cfg.patch_size[1],
            W // cfg.patch_size[2])
    n_tok = math.prod(grid)
    sin, cos = rope_angles_3d(grid, cfg.head_dim, seq_len=n_tok)
    x = jnp.asarray(r.normal(size=(1, 16, Fr, H, W)), jnp.float32)
    y = jnp.asarray(r.normal(size=(1, 20, Fr, H, W)), jnp.float32)
    clip = jnp.asarray(r.normal(size=(1, cfg.clip_tokens,
                                      cfg.clip_embed_dim)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(r.normal(size=(1, 16, cfg.text_dim)), jnp.float32)

    kw = dict(cfg=cfg, seq_len=n_tok, rope_sin=sin, rope_cos=cos,
              remat=False, y=y, clip_fea=clip)
    v_xla = wan_model_forward(params, x, t, ctx, **kw)
    v_fused = wan_model_forward(params, x, t, ctx, ffn_impl="interpret",
                                **kw)
    err = float(jnp.max(jnp.abs(v_fused - v_xla)))
    scale = float(jnp.max(jnp.abs(v_xla))) + 1e-6
    assert err / scale < 2e-2, (err, scale)
