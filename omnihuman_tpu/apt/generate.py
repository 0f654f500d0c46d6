"""Teacher-data generation for consistency distillation.

Capability parity with reference seaweed_apt/generate.py:143-300
(`generate_batch` / `create_dataloader` / `test_dataset`): encode N
prompts with umT5 (padded [512, 4096]), draw per-sample seeded noise
[16, 1, 60, 104] (480x832 single latent frame, seq_len 1560), run the
teacher ONCE at t = T-1 = 999 with CFG 7.5:
    v_teacher = v_uncond + cfg * (v_cond - v_uncond)
and persist {dummy_data, noise, dummy_prompts, positive_contexts,
negative_context, v_teacher} — identical keys/shapes, stored as .npz
instead of torch .pt.

TPU-first: all samples are generated in ONE batched jitted CFG forward
(batch-stacked cond/uncond) instead of a Python loop of 2N sequential
forwards with empty_cache calls (generate.py:210-232).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omnihuman_tpu.configs.wan import WanConfig
from omnihuman_tpu.models import wan_dit
from omnihuman_tpu.ops.rope import rope_angles_3d

# the reference ships 100 fixed prompts (generate.py:40-141); we generate
# the same count procedurally — subjects x actions — so no text is copied
_SUBJECTS = [
    "a red fox", "an astronaut", "a street dancer", "a golden retriever",
    "a violinist", "a chef", "a surfer", "a calico cat", "a cyclist",
    "a painter",
]
_ACTIONS = [
    "running through a snowy forest", "walking on the moon",
    "performing under neon lights", "catching a frisbee mid-air",
    "playing in a rainy courtyard", "flipping a pancake in a busy kitchen",
    "riding a towering wave at sunset", "chasing a butterfly in a garden",
    "speeding down a mountain road", "sketching a city skyline at dawn",
]
RANDOM_PROMPTS: List[str] = [
    f"{s} {a}" for s in _SUBJECTS for a in _ACTIONS
]


def generate_batch(
    pipe,                       # pipelines.text2video.WanT2V
    num_samples: int = 100,
    size=(480, 832),
    base_seed: int = 0,
    cfg_scale: float = 7.5,
    batch: int = 8,
    prompts: Optional[Sequence[str]] = None,
    out_dir: str = ".",
    save: bool = True,
) -> Dict[str, np.ndarray]:
    """Build the teacher dataset (same artifact as generate.py:248-259)."""
    cfg: WanConfig = pipe.config
    prompts = list(prompts if prompts is not None
                   else RANDOM_PROMPTS)[:num_samples]

    h, w = size
    target_shape = (cfg.vae.z_dim, 1, h // cfg.vae_stride[1],
                    w // cfg.vae_stride[2])
    grid = (1, target_shape[2] // cfg.model.patch_size[1],
            target_shape[3] // cfg.model.patch_size[2])
    seq_len = grid[0] * grid[1] * grid[2]
    sin, cos = rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len)

    # text contexts [N, 512, 4096] (+1 negative). Deliberately NO
    # context_lens masking here: the reference teacher passes the full
    # padded [512, 4096] tensor (generate.py:223-228 wraps it in a list,
    # so model.forward sees len==512) and the distill student consumes
    # the same padded artifacts — masking only the teacher would skew
    # the distillation targets.
    pos_ctx, _ = pipe.encode_text(prompts)
    neg_ctx, _ = pipe.encode_text([cfg.sample_neg_prompt])
    pos_ctx = np.asarray(pos_ctx, np.float32)
    neg_ctx0 = np.asarray(neg_ctx[0], np.float32)

    # per-sample seeded noise (generate.py:210-221): seed = base_seed + i
    noise = np.stack([
        np.asarray(jax.random.normal(jax.random.key(base_seed + i),
                                     target_shape, jnp.float32))
        for i in range(num_samples)])

    t_val = float(cfg.num_train_timesteps - 1)

    @jax.jit
    def teacher_cfg(params, x, ctx, ctx_null):
        b = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        c2 = jnp.concatenate([ctx, ctx_null], axis=0)
        t2 = jnp.full((2 * b,), t_val, jnp.float32)
        v = wan_dit.wan_model_forward(
            params, x2, t2, c2, cfg=cfg.model, seq_len=seq_len,
            rope_sin=sin, rope_cos=cos, policy=cfg.policy, remat=False)
        v_cond, v_uncond = jnp.split(v, 2, axis=0)
        return v_uncond + cfg_scale * (v_cond - v_uncond)

    v_teacher = np.empty_like(noise)
    neg_tile = jnp.asarray(np.broadcast_to(
        neg_ctx0[None], (batch,) + neg_ctx0.shape))
    for i in range(0, num_samples, batch):
        nb = min(batch, num_samples - i)
        v = teacher_cfg(pipe.params, jnp.asarray(noise[i:i + nb]),
                        jnp.asarray(pos_ctx[i:i + nb]), neg_tile[:nb])
        v_teacher[i:i + nb] = np.asarray(v, np.float32)

    assert v_teacher.shape == (num_samples,) + target_shape
    assert pos_ctx.shape == (num_samples, cfg.text_len, cfg.t5.dim)

    data = {
        "dummy_data": noise,              # generate.py stores noise twice
        "noise": noise,
        "dummy_prompts": np.asarray(prompts),
        "positive_contexts": pos_ctx,
        "negative_context": neg_ctx0,
        "v_teacher": v_teacher,
    }
    if save:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"dummy_data_{h}x{w}.npz")
        np.savez(path, **data)
    return data


def create_dataloader(data: Dict[str, np.ndarray], batch_size: int = 1,
                      shuffle: bool = True, seed: int = 0,
                      skip_epochs: int = 0):
    """Minimal host-side batch iterator over the teacher dataset
    (replaces generate.py:270-277's torch DataLoader).

    skip_epochs: burn that many permutations so a resumed run's first
    epoch replays the SAME shuffle the interrupted epoch used — required
    for mid-epoch resume to skip exactly the already-trained samples.
    """
    n = data["noise"].shape[0]
    rng = np.random.default_rng(seed)
    for _ in range(skip_epochs):
        rng.permutation(n)

    def epoch():
        idx = rng.permutation(n) if shuffle else np.arange(n)
        for i in range(0, n - batch_size + 1, batch_size):
            sel = idx[i:i + batch_size]
            yield {
                "noise": jnp.asarray(data["noise"][sel]),
                "context": jnp.asarray(data["positive_contexts"][sel]),
                "v_teacher": jnp.asarray(data["v_teacher"][sel]),
            }

    return epoch


def load_teacher_data(path: str) -> Dict[str, np.ndarray]:
    return dict(np.load(path, allow_pickle=True))


def visualize_and_save_batch_with_vae(data, pipe, out_path: str =
                                      "teacher_data_viz.png",
                                      num_samples: int = 4):
    """Decode and panel noise / v_teacher / x0 = noise - v for visual
    inspection (reference generate.py:304-362)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from omnihuman_tpu.models.vae import vae_decode_jit

    n = min(num_samples, data["noise"].shape[0])
    noise = jnp.asarray(data["noise"][:n])
    v = jnp.asarray(data["v_teacher"][:n])
    x0 = noise - v
    cfg = pipe.config

    panels = []
    for name, lat in (("noise", noise), ("v_teacher", v), ("x0", x0)):
        imgs = vae_decode_jit(pipe.vae_params, lat, cfg=cfg.vae,
                              streaming=True)
        panels.append((name, np.asarray(imgs[:, :, 0])))  # first frames

    fig, axes = plt.subplots(3, n, figsize=(3 * n, 9), squeeze=False)
    for r, (name, imgs) in enumerate(panels):
        for c in range(n):
            img = np.clip(imgs[c].transpose(1, 2, 0) * 0.5 + 0.5, 0, 1)
            axes[r][c].imshow(img)
            axes[r][c].set_axis_off()
            if c == 0:
                axes[r][c].set_title(name, loc="left")
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
