"""Weight-converter tests with REAL torch parity on the conv/linear ops.

torch (CPU) is available in this environment, so the layout conversions are
verified against actual torch ops — the same ops the reference checkpoints
were trained with.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from omnihuman_tpu.configs.wan import T5Config, VAEConfig, WanModelConfig
from omnihuman_tpu.models.vae import _conv3d, vae_decode, vae_encode
from omnihuman_tpu.models.wan_dit import _patchify, wan_model_forward
from omnihuman_tpu.utils.convert import (
    convert_t5, convert_vae, convert_wan_dit)


def test_patch_embedding_matches_torch_conv3d(rng):
    """stride==kernel Conv3d == reshape+GEMM with converted weights."""
    cin, dim = 16, 24
    patch = (1, 2, 2)
    conv = torch.nn.Conv3d(cin, dim, kernel_size=patch, stride=patch)
    x = torch.randn(2, cin, 4, 8, 8)
    with torch.no_grad():
        want = conv(x).flatten(2).transpose(1, 2).numpy()  # [B, L, dim]

    cfg = WanModelConfig(in_dim=cin, dim=dim, patch_size=patch, num_heads=4)
    pe = conv.weight.detach().numpy()
    params = {"patch_embedding": {
        "w": jnp.asarray(pe.reshape(dim, -1).T),
        "b": jnp.asarray(conv.bias.detach().numpy())}}
    from omnihuman_tpu.configs.wan import DTypePolicy
    got = _patchify(params, jnp.asarray(x.numpy()), cfg,
                    DTypePolicy(compute=jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_causal_conv3d_matches_torch(rng):
    """Our causal _conv3d == torch Conv3d with the reference's padding
    (vae.py:17-35: 2 frames front, SAME h/w)."""
    cin, cout = 4, 6
    conv = torch.nn.Conv3d(cin, cout, 3, padding=(0, 1, 1))
    x = torch.randn(1, cin, 5, 8, 8)
    with torch.no_grad():
        want = conv(F.pad(x, (0, 0, 0, 0, 2, 0))).numpy()

    w = conv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    # vae._conv3d is channels-last internally
    x_cl = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    got = _conv3d(x_cl, jnp.asarray(w),
                  jnp.asarray(conv.bias.detach().numpy()), padding="causal")
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def _torch_linear_sd(prefix, lin):
    return {f"{prefix}.weight": lin.weight.detach().numpy(),
            f"{prefix}.bias": lin.bias.detach().numpy()}


def _rand_sd(shapes):
    rng = np.random.default_rng(0)
    return {k: rng.normal(size=v).astype(np.float32) * 0.05
            for k, v in shapes.items()}


def _dit_state_dict(cfg: WanModelConfig):
    d, f = cfg.dim, cfg.ffn_dim
    shapes = {
        "patch_embedding.weight": (d, cfg.in_dim, *cfg.patch_size),
        "patch_embedding.bias": (d,),
        "text_embedding.0.weight": (d, cfg.text_dim),
        "text_embedding.0.bias": (d,),
        "text_embedding.2.weight": (d, d), "text_embedding.2.bias": (d,),
        "time_embedding.0.weight": (d, cfg.freq_dim),
        "time_embedding.0.bias": (d,),
        "time_embedding.2.weight": (d, d), "time_embedding.2.bias": (d,),
        "time_projection.1.weight": (d * 6, d),
        "time_projection.1.bias": (d * 6,),
        "head.head.weight": (int(np.prod(cfg.patch_size)) * cfg.out_dim, d),
        "head.head.bias": (int(np.prod(cfg.patch_size)) * cfg.out_dim,),
        "head.modulation": (1, 2, d),
    }
    for i in range(cfg.num_layers):
        for a in ("self_attn", "cross_attn"):
            for lin in ("q", "k", "v", "o"):
                shapes[f"blocks.{i}.{a}.{lin}.weight"] = (d, d)
                shapes[f"blocks.{i}.{a}.{lin}.bias"] = (d,)
            shapes[f"blocks.{i}.{a}.norm_q.weight"] = (d,)
            shapes[f"blocks.{i}.{a}.norm_k.weight"] = (d,)
        shapes[f"blocks.{i}.ffn.0.weight"] = (f, d)
        shapes[f"blocks.{i}.ffn.0.bias"] = (f,)
        shapes[f"blocks.{i}.ffn.2.weight"] = (d, f)
        shapes[f"blocks.{i}.ffn.2.bias"] = (d,)
        shapes[f"blocks.{i}.modulation"] = (1, 6, d)
        shapes[f"blocks.{i}.norm3.weight"] = (d,)
        shapes[f"blocks.{i}.norm3.bias"] = (d,)
    return _rand_sd(shapes)


def test_convert_dit_and_forward():
    cfg = WanModelConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                         freq_dim=16, text_dim=24, text_len=8)
    sd = _dit_state_dict(cfg)
    params = convert_wan_dit(sd, cfg)
    assert params["blocks"]["modulation"].shape == (2, 6, 32)

    from omnihuman_tpu.configs.wan import DTypePolicy
    from omnihuman_tpu.ops.rope import rope_angles_3d
    x = jnp.ones((1, 16, 2, 4, 4), jnp.float32)
    sin, cos = rope_angles_3d((2, 2, 2), 8, seq_len=8)
    v = wan_model_forward(params, x, jnp.asarray([500.0]),
                          jnp.zeros((1, 8, 24)), cfg=cfg, seq_len=8,
                          rope_sin=sin, rope_cos=cos,
                          policy=DTypePolicy(compute=jnp.float32))
    assert v.shape == (1, 16, 2, 4, 4)
    assert np.isfinite(np.asarray(v)).all()


def _vae_state_dict(cfg: VAEConfig):
    """Build a synthetic torch-named VAE state dict via the spec walker."""
    from omnihuman_tpu.models.vae import decoder_spec, encoder_spec
    shapes = {}

    def add_conv3(name, cin, cout, k=(3, 3, 3)):
        shapes[f"{name}.weight"] = (cout, cin, *k)
        shapes[f"{name}.bias"] = (cout,)

    def add_conv2(name, cin, cout, k=(3, 3)):
        shapes[f"{name}.weight"] = (cout, cin, *k)
        shapes[f"{name}.bias"] = (cout,)

    def add_res(base, cin, cout):
        shapes[f"{base}.residual.0.gamma"] = (cin, 1, 1, 1)
        add_conv3(f"{base}.residual.2", cin, cout)
        shapes[f"{base}.residual.3.gamma"] = (cout, 1, 1, 1)
        add_conv3(f"{base}.residual.6", cout, cout)
        if cin != cout:
            add_conv3(f"{base}.shortcut", cin, cout, k=(1, 1, 1))

    def add_attn(base, dim):
        shapes[f"{base}.norm.gamma"] = (dim, 1, 1)
        add_conv2(f"{base}.to_qkv", dim, dim * 3, k=(1, 1))
        add_conv2(f"{base}.proj", dim, dim, k=(1, 1))

    for prefix, spec in (("encoder", encoder_spec(cfg)),
                         ("decoder", decoder_spec(cfg))):
        enc = prefix == "encoder"
        mid = (len(spec) - 4) if enc else 1
        seq = 0
        for si, item in enumerate(spec):
            kind = item[0]
            if kind == "conv_in":
                add_conv3(f"{prefix}.conv1", item[1], item[2])
            elif kind == "head":
                shapes[f"{prefix}.head.0.gamma"] = (item[1], 1, 1, 1)
                add_conv3(f"{prefix}.head.2", item[1], item[2])
            elif (enc and si >= mid) or (not enc and si in (1, 2, 3)):
                mi = (si - mid) if enc else (si - 1)
                base = f"{prefix}.middle.{mi}"
                if kind == "res":
                    add_res(base, item[1], item[2])
                else:
                    add_attn(base, item[1])
            else:
                nm = "downsamples" if enc else "upsamples"
                idx = seq if enc else si - 4
                base = f"{prefix}.{nm}.{idx}"
                if kind == "res":
                    add_res(base, item[1], item[2])
                elif kind == "attn":
                    add_attn(base, item[1])
                else:
                    mode = item[2]
                    dim = item[1]
                    if mode.startswith("up"):
                        add_conv2(f"{base}.resample.1", dim, dim // 2)
                    else:
                        add_conv2(f"{base}.resample.1", dim, dim)
                    if mode == "upsample3d":
                        add_conv3(f"{base}.time_conv", dim, dim * 2,
                                  k=(3, 1, 1))
                    if mode == "downsample3d":
                        add_conv3(f"{base}.time_conv", dim, dim, k=(3, 1, 1))
                seq += 1
    add_conv3("conv1", cfg.z_dim * 2, cfg.z_dim * 2, k=(1, 1, 1))
    add_conv3("conv2", cfg.z_dim, cfg.z_dim, k=(1, 1, 1))
    return _rand_sd(shapes)


def test_convert_vae_roundtrip():
    cfg = VAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                    temporal_downsample=(True,),
                    latent_mean=tuple([0.0] * 4),
                    latent_std=tuple([1.0] * 4))
    sd = _vae_state_dict(cfg)
    params = convert_vae(sd, cfg)
    x = jnp.ones((1, 3, 5, 16, 16), jnp.float32) * 0.3
    z = vae_encode(params, x, cfg, streaming=False)
    assert z.shape[1] == 4
    y = vae_decode(params, z, cfg, streaming=False)
    assert y.shape == x.shape


def test_convert_t5():
    cfg = T5Config(vocab_size=50, dim=16, dim_attn=16, dim_ffn=32,
                   num_heads=4, num_layers=2)
    shapes = {"token_embedding.weight": (50, 16), "norm.weight": (16,)}
    for i in range(2):
        for lin in ("q", "k", "v", "o"):
            shapes[f"blocks.{i}.attn.{lin}.weight"] = (16, 16)
        shapes[f"blocks.{i}.norm1.weight"] = (16,)
        shapes[f"blocks.{i}.norm2.weight"] = (16,)
        shapes[f"blocks.{i}.pos_embedding.embedding.weight"] = (32, 4)
        shapes[f"blocks.{i}.ffn.gate.0.weight"] = (32, 16)
        shapes[f"blocks.{i}.ffn.fc1.weight"] = (32, 16)
        shapes[f"blocks.{i}.ffn.fc2.weight"] = (16, 32)
    sd = _rand_sd(shapes)
    params = convert_t5(sd, cfg)

    from omnihuman_tpu.models.t5 import t5_encode
    out = t5_encode(params, jnp.zeros((1, 8), jnp.int32),
                    jnp.ones((1, 8), jnp.int32), cfg,
                    compute_dtype=jnp.float32)
    assert out.shape == (1, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_linear_transpose_convention():
    """torch Linear == x @ w with converted weight."""
    lin = torch.nn.Linear(6, 4)
    x = torch.randn(3, 6)
    with torch.no_grad():
        want = lin(x).numpy()
    got = np.asarray(x.numpy() @ lin.weight.detach().numpy().T
                     + lin.bias.detach().numpy())
    np.testing.assert_allclose(got, want, atol=1e-5)
