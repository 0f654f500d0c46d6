"""EMA evaluation — the integration test for the distilled one-step model.

Capability parity with reference seaweed_apt/eval_ema.py:39-247: load an
EMA checkpoint, regenerate samples ONE-STEP from the cached teacher noise
and contexts (dummy_data_*.npz), VAE-decode, save image grids; the
reference's commented-out metrics (PSNR/SSIM, ":164-247") are implemented
for real here (numpy; FVD/CLIP-score hooks pluggable via
omni.evaluate).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from omnihuman_tpu.apt.generate import load_teacher_data
from omnihuman_tpu.models import vae as vae_mod
from omnihuman_tpu.models import wan_dit
from omnihuman_tpu.ops.rope import rope_angles_3d
from omnihuman_tpu.utils.logging import logger
from omnihuman_tpu.utils.media import cache_image


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    mse = float(np.mean(np.square(a.astype(np.float64) - b)))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    """Global SSIM (single window) — the reference's per-image scalar."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                 / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))


def evaluate_ema(
    pipe,                              # WanT2V with EMA params loaded
    data_path: str,
    num_samples: int = 10,
    out_dir: str = "eval_images",
    t_final: Optional[float] = None,
) -> Dict[str, float]:
    """Regenerate one-step samples from cached noise/contexts and decode
    (eval_ema.py:109-161). Returns aggregate metrics."""
    cfg = pipe.config
    data = load_teacher_data(data_path)
    os.makedirs(out_dir, exist_ok=True)
    t_final = float(t_final if t_final is not None
                    else cfg.num_train_timesteps)

    noise = jnp.asarray(data["noise"][:num_samples], jnp.float32)
    ctx = jnp.asarray(data["positive_contexts"][:num_samples], jnp.float32)
    n, c, f, h, w = noise.shape
    grid = (f // cfg.model.patch_size[0], h // cfg.model.patch_size[1],
            w // cfg.model.patch_size[2])
    seq_len = grid[0] * grid[1] * grid[2]
    sin, cos = rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len)


    @jax.jit
    def one_step(params, z, ctx):
        t = jnp.full((z.shape[0],), t_final, jnp.float32)
        v = wan_dit.wan_model_forward(
            params, z, t, ctx, cfg=cfg.model, seq_len=seq_len,
            rope_sin=sin, rope_cos=cos, policy=cfg.policy, remat=False)
        return z - v

    latents = one_step(pipe.params, noise, ctx)
    videos = vae_mod.vae_decode_jit(pipe.vae_params, latents, cfg=cfg.vae,
                                    streaming=True)

    # teacher's x0 = noise - v_teacher for PSNR/SSIM comparison
    x0_teacher = (np.asarray(noise)
                  - data["v_teacher"][:num_samples])
    teacher_videos = vae_mod.vae_decode_jit(
        pipe.vae_params, jnp.asarray(x0_teacher), cfg=cfg.vae,
        streaming=True)

    psnrs, ssims = [], []
    for i in range(n):
        img = np.asarray(videos[i, :, 0])        # first frame [3, H, W]
        tgt = np.asarray(teacher_videos[i, :, 0])
        cache_image(img, os.path.join(out_dir, f"eval_image_{i}.png"))
        psnrs.append(psnr(img, tgt))
        ssims.append(ssim(img, tgt))

    metrics = {
        "psnr_vs_teacher": float(np.mean(psnrs)),
        "ssim_vs_teacher": float(np.mean(ssims)),
        "latent_mse_vs_teacher_x0": float(np.mean(np.square(
            np.asarray(latents) - x0_teacher))),
        "num_samples": n,
    }
    logger.info(f"EMA eval: {metrics}")
    return metrics
