"""int8 W8A8 serving mode: on-chip step-latency A/B + pixel-level gate.

Measures at the flagship geometry (Wan-1.3B, 480x832x81f, 32 760 tokens,
fused-CFG batch-2):
  1. p50 CFG denoise-step latency: fast mode (bf16 residual) vs int8
     (bf16 residual + W8A8 block GEMMs, ops/quant.py) — same-session
     numbers for an honest pair.
  2. pixel gate: 4-step UniPC latents fp32-residual vs int8, decoded by
     the SAME streaming VAE -> PSNR/SSIM (methodology of
     _bf16_pixel_gate.py, incl. the randomized velocity head).

Caveat as in REPORTS/perf_r4.md §6: random-init weights — this gates the
numerical divergence of the quantized program, not perceptual quality.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
print("backend:", jax.default_backend(), flush=True)

import dataclasses
from omnihuman_tpu.configs import WAN_CONFIGS
from omnihuman_tpu.configs.wan import DTypePolicy
from omnihuman_tpu.models.wan_dit import init_wan_model, wan_model_forward
from omnihuman_tpu.models.vae import init_vae, vae_decode
from omnihuman_tpu.ops.quant import quantize_wan_params
from omnihuman_tpu.ops.rope import rope_angles_3d
from omnihuman_tpu.samplers.fm_solvers import get_solver

cfg = WAN_CONFIGS["t2v-1.3B"]
frames, h, w = 21, 60, 104
grid = (frames, 30, 52)
seq_len = 32768
STEPS = 4


def _init(k):
    p = init_wan_model(k, cfg.model)
    p["head"]["w"] = (
        jax.random.normal(jax.random.key(99), p["head"]["w"].shape) * 0.02)
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)


params = jax.jit(_init)(jax.random.key(0))
jax.block_until_ready(params)
params_q = jax.jit(quantize_wan_params)(params)
jax.block_until_ready(params_q)
sin, cos = rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len)

rng = np.random.default_rng(0)
noise = jnp.asarray(rng.normal(size=(1, 16, frames, h, w)), jnp.float32)
ctx = jnp.asarray(rng.normal(size=(1, 512, 4096)) * 0.1, jnp.bfloat16)
ctx_null = jnp.asarray(rng.normal(size=(1, 512, 4096)) * 0.1, jnp.bfloat16)
x2 = jnp.concatenate([noise, noise], axis=0)
cc = jnp.concatenate([ctx, ctx_null], axis=0)
tb = jnp.full((2,), 999.0, jnp.float32)

fast_policy = dataclasses.replace(DTypePolicy(), residual=jnp.bfloat16)


# ---- 1. step latency A/B ---------------------------------------------------
def make_step(policy):
    @jax.jit
    def step(p, x, t, c, s, co):
        v = wan_model_forward(p, x, t, c, cfg=cfg.model, seq_len=seq_len,
                              rope_sin=s, rope_cos=co, policy=policy,
                              remat=False)
        vc, vu = jnp.split(v, 2, axis=0)
        return vu + 5.0 * (vc - vu)
    return step


def p50(step, p, iters=5):
    float(jnp.sum(step(p, x2, tb, cc, sin, cos)[:, 0, 0, 0, 0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(step(p, x2, tb, cc, sin, cos)[:, 0, 0, 0, 0]))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(ts, 50))


t_fast = p50(make_step(fast_policy), params)
print(f"p50 CFG step fast (bf16 residual):       {t_fast:.1f} ms", flush=True)
t_int8 = p50(make_step(fast_policy), params_q)
print(f"p50 CFG step int8 (W8A8 + bf16 residual): {t_int8:.1f} ms "
      f"({(t_fast - t_int8) / t_fast * 100:.1f}% faster)", flush=True)


# ---- 2. pixel gate ----------------------------------------------------------
sol = get_solver("unipc", STEPS, 5.0)
LENS = 100


def sample(p, policy):
    def run(p, z, c, cn, s, co, lens):
        def model_fn(x, t, i):
            xx = jnp.concatenate([x, x], axis=0)
            t2 = jnp.full((2,), t, jnp.float32)
            c2 = jnp.concatenate([c, cn], axis=0)
            v = wan_model_forward(p, xx, t2, c2, cfg=cfg.model,
                                  seq_len=seq_len, rope_sin=s, rope_cos=co,
                                  remat=False, policy=policy,
                                  context_lens=lens)
            vc, vu = jnp.split(v, 2, axis=0)
            return vu + 5.0 * (vc - vu)

        return sol.sample_loop(model_fn, z)

    lens = jnp.full((2,), LENS, jnp.int32)
    return jax.jit(run)(p, noise, ctx, ctx_null, sin, cos, lens)


lat = {}
for name, (p, pol) in {
        "fp32_residual": (params, DTypePolicy()),
        "int8": (params_q, fast_policy)}.items():
    t0 = time.perf_counter()
    out = sample(p, pol)
    jax.block_until_ready(out)
    lat[name] = np.asarray(out, np.float32)
    rms = float(np.sqrt(np.mean((lat[name] - lat["fp32_residual"]) ** 2))
                / np.sqrt(np.mean(lat["fp32_residual"] ** 2)))
    print(f"sampled {name}: {time.perf_counter()-t0:.0f}s; "
          f"latent rel-RMS vs fp32 {rms:.4f}", flush=True)

vae_params = jax.jit(lambda k: jax.tree.map(
    lambda v: v.astype(jnp.bfloat16), init_vae(k, cfg.vae)))(
        jax.random.key(1))
jax.block_until_ready(vae_params)
dec = jax.jit(lambda p, z: vae_decode(p, z, cfg.vae, streaming=True))

vids = {}
for name in lat:
    v = np.asarray(dec(vae_params, jnp.asarray(lat[name], jnp.bfloat16)),
                   np.float32)
    vids[name] = np.clip(v, -1, 1)
    print(f"decoded {name}", flush=True)

ref = vids["fp32_residual"]


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(4.0 / max(mse, 1e-12))


def ssim(a, b):
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    c1, c2 = (0.01 * 2) ** 2, (0.03 * 2) ** 2
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
            / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))


q = vids["int8"]
print(f"int8 vs fp32: PSNR {psnr(q, ref):.2f} dB  "
      f"SSIM {ssim(q, ref):.4f}", flush=True)
