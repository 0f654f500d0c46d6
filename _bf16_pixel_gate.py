"""Pixel-level quality gate for the bf16-residual serving fast mode
(VERDICT r3 item 6: the 3813.8 ms mode was gated on a 1.5%
velocity-RMS proxy; serving needs a decode-level number).

Runs a 4-step CFG sampling loop at the flagship geometry twice —
fp32 residual (reference parity) vs bf16 residual (+ the ctx-trim the
fast mode also enables) — VAE-decodes both latents with the SAME
decoder, and reports PSNR/SSIM between the two clips.

Caveat (recorded in REPORTS/perf_r4.md): weights are random-init
(no released checkpoints in this environment), so this measures the
NUMERICAL divergence of the two precision modes through the full
sampler+decoder chain, not perceptual quality of a trained model. With
trained weights the same script is the real gate.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp

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
from omnihuman_tpu.ops.rope import rope_angles_3d
from omnihuman_tpu.samplers.fm_solvers import get_solver

cfg = WAN_CONFIGS["t2v-1.3B"]
frames, h, w = 21, 60, 104
grid = (frames, 30, 52)
seq_len = 32768
STEPS = 4

def _init(k):
    p = init_wan_model(k, cfg.model)
    # the velocity head is zero-init (reference model.py:610-612) — with
    # it, random-init output is exactly 0 and every precision mode
    # produces IDENTICAL latents (the r4 first gate run measured
    # nothing). Randomize it so the sampler actually integrates a
    # non-trivial velocity field.
    p["head"]["w"] = (
        jax.random.normal(jax.random.key(99), p["head"]["w"].shape) * 0.02)
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)


init = jax.jit(_init)
params = init(jax.random.key(0))
jax.block_until_ready(params)
assert float(jnp.abs(params["head"]["w"]).max()) > 0
sin, cos = rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len)

rng = np.random.default_rng(0)
noise = jnp.asarray(rng.normal(size=(1, 16, frames, h, w)), jnp.float32)
ctx = jnp.asarray(rng.normal(size=(1, 512, 4096)) * 0.1, jnp.bfloat16)
ctx_null = jnp.asarray(rng.normal(size=(1, 512, 4096)) * 0.1, jnp.bfloat16)

sol = get_solver("unipc", STEPS, 5.0)


# The prompt occupies LENS tokens; the rest of the 512-token context is
# masked padding. The serving ctx-trim drops masked rows, which is
# EXACT (tests/test_pipeline.py::test_context_lens_trim_is_exact), so
# the reference mode keeps the full 512 rows and the fast mode trims to
# a 128 bucket — any pixel difference between them is the bf16
# residual, measured through the REAL fast-mode program shape.
LENS = 100


def sample(policy, ctx_len):
    # params/ctx/rope enter as jit ARGUMENTS — closing over them bakes
    # 2.86 GB of weights into the HLO as constants, which the axon
    # remote-compile tunnel cannot ship (broken pipe; see CLAUDE.md).
    def run(p, z, c, cn, s, co, lens):
        def model_fn(x, t, i):
            x2 = jnp.concatenate([x, x], axis=0)
            tb = jnp.full((2,), t, jnp.float32)
            cc = jnp.concatenate([c, cn], axis=0)
            v = wan_model_forward(p, x2, tb, cc, cfg=cfg.model,
                                  seq_len=seq_len, rope_sin=s, rope_cos=co,
                                  remat=False, policy=policy,
                                  context_lens=lens)
            vc, vu = jnp.split(v, 2, axis=0)
            return vu + 5.0 * (vc - vu)

        return sol.sample_loop(model_fn, z)

    lens = jnp.full((2,), LENS, jnp.int32)
    return jax.jit(run)(params, noise, ctx[:, :ctx_len],
                        ctx_null[:, :ctx_len], sin, cos, lens)


modes = {
    "fp32_residual": (DTypePolicy(), 512),
    "bf16_residual": (dataclasses.replace(
        DTypePolicy(), residual=jnp.bfloat16), 512),
    "bf16_res_ctxtrim": (dataclasses.replace(
        DTypePolicy(), residual=jnp.bfloat16), 128),
}
lat = {}
for name, (pol, cl) in modes.items():
    t0 = time.perf_counter()
    out = sample(pol, cl)
    jax.block_until_ready(out)
    lat[name] = np.asarray(out, np.float32)
    print(f"sampled {name}: {time.perf_counter()-t0:.0f}s "
          f"(incl compile)", flush=True)
    rms = float(np.sqrt(np.mean((lat[name] - lat['fp32_residual'])**2))
                / np.sqrt(np.mean(lat['fp32_residual']**2)))
    print(f"{name}: latent rel-RMS vs fp32 {rms:.4f}", flush=True)

vae_params = jax.jit(lambda k: jax.tree.map(
    lambda v: v.astype(jnp.bfloat16), init_vae(k, cfg.vae)))(
        jax.random.key(1))
jax.block_until_ready(vae_params)
dec = jax.jit(lambda p, z: vae_decode(p, z, cfg.vae, streaming=True))

vids = {}
for name in modes:
    v = np.asarray(dec(vae_params, jnp.asarray(lat[name], jnp.bfloat16)),
                   np.float32)
    vids[name] = np.clip(v, -1, 1)
    print(f"decoded {name}", flush=True)

ref = vids["fp32_residual"]


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(4.0 / max(mse, 1e-12))    # range [-1,1] → peak 2


def ssim(a, b):
    # global SSIM over 8x8 blocks, luma only (quality-gate grade)
    ya = a.mean(1)[0]       # [T, H, W]
    yb = b.mean(1)[0]
    c1, c2 = (0.01 * 2) ** 2, (0.03 * 2) ** 2
    t, hh, ww = ya.shape
    ba = ya[:, :hh//8*8, :ww//8*8].reshape(t, hh//8, 8, ww//8, 8)
    bb = yb[:, :hh//8*8, :ww//8*8].reshape(t, hh//8, 8, ww//8, 8)
    mu_a, mu_b = ba.mean((2, 4)), bb.mean((2, 4))
    va = ba.var((2, 4))
    vb = bb.var((2, 4))
    cov = (ba * bb).mean((2, 4)) - mu_a * mu_b
    s = ((2*mu_a*mu_b + c1) * (2*cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    return float(s.mean())


for name in ("bf16_residual", "bf16_res_ctxtrim"):
    print(f"{name}: PSNR {psnr(ref, vids[name]):.2f} dB  "
          f"SSIM {ssim(ref, vids[name]):.4f}", flush=True)
print("DONE", flush=True)
