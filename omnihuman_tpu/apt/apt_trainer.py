"""Stage-2 Seaweed-APT adversarial post-training — jitted G/D steps.

Capability parity with reference seaweed_apt/apt_trainer.py:18-342
(`train_seaweed_apt`) + ":346-375" (`SeaweedAPTConfig`):
  - generator = one-step distilled model (x = z - v at t=T);
    discriminator = frozen Wan backbone + 3 cross-attn probes.
  - non-saturating GAN: d_loss = -log sigmoid(real) - log(1-sigmoid(fake)),
    g_loss = -log sigmoid(fake) (":124-147").
  - approximated R1 on real samples, lambda 100, sigma 0.01 image /
    0.1 video (":132-137", seaweed paper §3.4).
  - RMSprop(alpha=0.9), lr 5e-6 image phase / 3e-6 video phase.
  - timestep shift s=1 image / s=12 video on the discriminator timestep
    (":109-111,246-247").
  - two phases: image (350 updates) then video (300 updates, fresh D,
    generator re-initialised from image-phase EMA, ":202-220").
  - EMA decay 0.995.

TPU-first: d_step/g_step are single pjit-able functions with donated
optimizer state; phase-2's G←EMA handoff is a PyTree copy instead of the
reference's temp-file round-trip (":206-220"); gradient sync over the
`data` mesh axis is GSPMD's job.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from omnihuman_tpu.apt.model import (
    apt_discriminator_forward, apt_generator_forward, ema_update,
    timestep_shift)
from omnihuman_tpu.configs.wan import DTypePolicy, WanModelConfig


@dataclasses.dataclass(frozen=True)
class SeaweedAPTConfig:
    """Paper hyperparameters (reference apt_trainer.py:346-375)."""

    num_train_timesteps: int = 1000
    text_len: int = 512
    seq_len: int = 1024
    image_batch_size: int = 9062
    video_batch_size: int = 2048
    g_lr_image: float = 5e-6
    d_lr_image: float = 5e-6
    g_lr_video: float = 3e-6
    d_lr_video: float = 3e-6
    image_updates: int = 350
    video_updates: int = 300
    ema_decay: float = 0.995
    lambda_r1: float = 100.0
    r1_sigma_image: float = 0.01
    r1_sigma_video: float = 0.1
    shift_image: float = 1.0
    shift_video: float = 12.0
    image_resolution: int = 1024
    video_width: int = 1280
    video_height: int = 720
    video_fps: int = 24
    video_frames: int = 48


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class APTState:
    g_params: Any
    d_params: Any          # trainables only (probes + head)
    g_opt: Any
    d_opt: Any
    ema_params: Any
    step: jnp.ndarray


def make_rmsprop(lr: float, accumulation_steps: int = 1
                 ) -> optax.GradientTransformation:
    """RMSprop(alpha=0.9) like torch (apt_trainer.py:74-79).

    accumulation_steps > 1 wraps in optax.MultiSteps so the EFFECTIVE
    batch can approach the paper's 9062-image / 2048-video recipe
    (SeaweedAPTConfig.image_batch_size, seaweed paper §4.1) on a mesh —
    k micro-batches accumulate before one RMSprop update."""
    opt = optax.rmsprop(lr, decay=0.9, eps=1e-8)
    if accumulation_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulation_steps)
    return opt


def d_trainable_mask(d_params) -> Any:
    """True for the discriminator's trainables (probes + head), False
    for the frozen Wan backbone — the optimizer must not allocate
    moments for 14B frozen params (the reference pays that cost:
    apt_trainer.py:77-79 optimizes discriminator.parameters() wholesale
    while the backbone runs under no_grad)."""
    return {k: jax.tree.map(lambda _: k != "backbone", v)
            for k, v in d_params.items()}


def make_d_optimizer(lr: float, d_params, accumulation_steps: int = 1
                     ) -> optax.GradientTransformation:
    """RMSprop masked to the trainable subtree (masked OUTSIDE MultiSteps
    so the gradient accumulator is only allocated for the probes + head,
    never the frozen 14B backbone)."""
    return optax.masked(make_rmsprop(lr, accumulation_steps),
                        d_trainable_mask(d_params))


def init_apt_state(g_params, d_params, g_lr: float, d_lr: float,
                   accumulation_steps: int = 1) -> APTState:
    return APTState(
        g_params=g_params, d_params=d_params,
        g_opt=make_rmsprop(g_lr, accumulation_steps).init(g_params),
        d_opt=make_d_optimizer(d_lr, d_params,
                               accumulation_steps).init(d_params),
        ema_params=jax.tree.map(jnp.copy, g_params),
        step=jnp.asarray(0, jnp.int32))


def _softplus_gan_losses(real_logits, fake_logits):
    """Numerically-stable non-saturating losses.

    -log(sigmoid(x)) = softplus(-x); -log(1 - sigmoid(x)) = softplus(x)
    (the reference adds 1e-8 inside the log instead, apt_trainer.py:126).
    """
    d_loss = (jnp.mean(jax.nn.softplus(-real_logits))
              + jnp.mean(jax.nn.softplus(fake_logits)))
    return d_loss


def apt_d_step(state: APTState, batch: Dict[str, jnp.ndarray], key,
               *, cfg: WanModelConfig, apt_cfg: SeaweedAPTConfig,
               video: bool, seq_len: int, rope_sin, rope_cos,
               d_optimizer: optax.GradientTransformation,
               policy: DTypePolicy = DTypePolicy(),
               attn_impl: str = "auto",
               token_sharding=None
               ) -> Tuple[APTState, Dict]:
    """Discriminator update (apt_trainer.py:113-137,256-280).

    batch: {"real": [B,C,F,H,W] latents, "context": [B,L,text_dim],
            "noise": [B,C,F,H,W]}
    """
    s = apt_cfg.shift_video if video else apt_cfg.shift_image
    sigma = apt_cfg.r1_sigma_video if video else apt_cfg.r1_sigma_image
    b = batch["real"].shape[0]
    k_t, k_r1 = jax.random.split(key)
    t_norm = jax.random.uniform(k_t, (b,))
    t_shifted = timestep_shift(t_norm, s) * apt_cfg.num_train_timesteps

    fake = jax.lax.stop_gradient(apt_generator_forward(
        state.g_params, batch["noise"], batch["context"], cfg=cfg,
        seq_len=seq_len, rope_sin=rope_sin, rope_cos=rope_cos,
        final_timestep=apt_cfg.num_train_timesteps, policy=policy,
        attn_impl=attn_impl, token_sharding=token_sharding))

    def loss_fn(d_params):
        disc = lambda x: apt_discriminator_forward(
            d_params, x, t_shifted, batch["context"], cfg=cfg,
            seq_len=seq_len, rope_sin=rope_sin, rope_cos=rope_cos,
            policy=policy, attn_impl=attn_impl,
            token_sharding=token_sharding)
        real_logits = disc(batch["real"])
        fake_logits = disc(fake)
        d_loss = _softplus_gan_losses(real_logits, fake_logits)
        # approximated R1 (model.py:224-251)
        noise = jax.random.normal(k_r1, batch["real"].shape)
        r1 = jnp.mean(jnp.square(
            real_logits - disc(batch["real"] + sigma * noise)))
        return d_loss + apt_cfg.lambda_r1 * r1, (d_loss, r1)

    (total, (d_loss, r1)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.d_params)
    updates, d_opt = d_optimizer.update(grads, state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, updates)
    new_state = dataclasses.replace(state, d_params=d_params, d_opt=d_opt)
    return new_state, {"d_loss": d_loss, "r1_loss": r1, "d_total": total}


def apt_g_step(state: APTState, batch: Dict[str, jnp.ndarray], key,
               *, cfg: WanModelConfig, apt_cfg: SeaweedAPTConfig,
               video: bool, seq_len: int, rope_sin, rope_cos,
               g_optimizer: optax.GradientTransformation,
               policy: DTypePolicy = DTypePolicy(),
               attn_impl: str = "auto",
               remat=True,
               token_sharding=None
               ) -> Tuple[APTState, Dict]:
    """Generator update (apt_trainer.py:139-157,282-294).

    remat: True = per-block; int g = two-level grouped remat (stores
    num_layers/g carries — see models/wan_dit.py), the 14B setting."""
    s = apt_cfg.shift_video if video else apt_cfg.shift_image
    b = batch["noise"].shape[0]
    t_norm = jax.random.uniform(key, (b,))
    t_shifted = timestep_shift(t_norm, s) * apt_cfg.num_train_timesteps

    def loss_fn(g_params):
        fake = apt_generator_forward(
            g_params, batch["noise"], batch["context"], cfg=cfg,
            seq_len=seq_len, rope_sin=rope_sin, rope_cos=rope_cos,
            final_timestep=apt_cfg.num_train_timesteps, policy=policy,
            remat=remat, attn_impl=attn_impl,
            token_sharding=token_sharding)
        # stop_features=False: the generator's adversarial gradient flows
        # through the (frozen-weight) D backbone — the reference's no_grad
        # here (model.py:162-163) zeroes it, so its G never trains.
        fake_logits = apt_discriminator_forward(
            state.d_params, fake, t_shifted, batch["context"], cfg=cfg,
            seq_len=seq_len, rope_sin=rope_sin, rope_cos=rope_cos,
            policy=policy, stop_features=False, remat=remat,
            attn_impl=attn_impl, token_sharding=token_sharding)
        return jnp.mean(jax.nn.softplus(-fake_logits))

    g_loss, grads = jax.value_and_grad(loss_fn)(state.g_params)
    updates, g_opt = g_optimizer.update(grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, updates)
    ema = ema_update(state.ema_params, g_params, apt_cfg.ema_decay)
    new_state = dataclasses.replace(
        state, g_params=g_params, g_opt=g_opt, ema_params=ema,
        step=state.step + 1)
    return new_state, {"g_loss": g_loss}


def start_video_phase(state: APTState, fresh_d_params,
                      apt_cfg: SeaweedAPTConfig,
                      accumulation_steps: int = 1) -> APTState:
    """Phase 2 boot: G <- image-phase EMA, fresh D, fresh optimizers at the
    video learning rates (apt_trainer.py:202-232) — a PyTree copy instead
    of the reference's temp-file handshake."""
    g_params = jax.tree.map(jnp.copy, state.ema_params)
    return init_apt_state(g_params, fresh_d_params,
                          apt_cfg.g_lr_video, apt_cfg.d_lr_video,
                          accumulation_steps)
