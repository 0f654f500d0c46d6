"""Stage-1 consistency distillation (Seaweed-APT) — jitted train step.

Capability parity with reference seaweed_apt/distilled_trainer.py:26-334
(`train_consistency_distillation` / `training_step` / `update_ema_model`):
one-step student regression v_student = model(noise, t=T_max, ctx) against
the cached teacher CFG velocity, AdamW(5e-6), EMA decay 0.995.

TPU-first redesign (SURVEY §7.1 'trainers as jitted step'):
  - loss + grads + optimizer + EMA are ONE pjit-able function with donated
    state; gradient sync comes from GSPMD (batch sharded on `data`),
    replacing Accelerate DDP + GradScaler + CUDA_LAUNCH_BLOCKING
    (distilled_trainer.py:23,79-81,301).
  - EMA lives on-device inside the train state (bf16/fp32 PyTree),
    replacing the per-parameter CPU round-trip EMA
    (distilled_trainer.py:86-91,319-334).
  - Gradient accumulation, when needed, is a lax.scan over microbatches
    rather than a Python-side loss division (":289").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from omnihuman_tpu.configs.wan import DTypePolicy, WanModelConfig
from omnihuman_tpu.models import wan_dit


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DistillState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 5e-6, weight_decay: float = 0.01,
                   grad_clip: Optional[float] = 1.0,
                   accumulation_steps: int = 1
                   ) -> optax.GradientTransformation:
    """AdamW like the reference (distilled_trainer.py:74-77).

    accumulation_steps > 1 wraps in optax.MultiSteps — the TPU-native
    equivalent of the reference's manual loss/accum division +
    sync-step gating (distilled_trainer.py:289,301-316).
    """
    txs = []
    if grad_clip is not None:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay))
    opt = optax.chain(*txs)
    if accumulation_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulation_steps)
    return opt


def init_distill_state(params: Any,
                       optimizer: optax.GradientTransformation) -> DistillState:
    return DistillState(
        params=params,
        opt_state=optimizer.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
        step=jnp.asarray(0, jnp.int32),
    )


def distill_loss(params, batch, *, cfg: WanModelConfig, seq_len: int,
                 rope_sin, rope_cos, policy: DTypePolicy,
                 t_max: float = 1000.0, remat: bool = True,
                 attn_impl: str = "auto", token_sharding=None):
    """MSE(v_student(noise, t=T), v_teacher) (distilled_trainer.py:241-316).

    batch: {"noise": [B,C,F,H,W], "context": [B,text_len,text_dim],
            "v_teacher": [B,C,F,H,W]}
    """
    b = batch["noise"].shape[0]
    t = jnp.full((b,), t_max, jnp.float32)
    v = wan_dit.wan_model_forward(
        params, batch["noise"], t, batch["context"], cfg=cfg,
        seq_len=seq_len, rope_sin=rope_sin, rope_cos=rope_cos,
        policy=policy, remat=remat, attn_impl=attn_impl,
        token_sharding=token_sharding)
    return jnp.mean(jnp.square(v - batch["v_teacher"].astype(jnp.float32)))


def distill_train_step(state: DistillState, batch: Dict[str, jnp.ndarray],
                       *, optimizer: optax.GradientTransformation,
                       cfg: WanModelConfig, seq_len: int, rope_sin, rope_cos,
                       policy: DTypePolicy = DTypePolicy(),
                       ema_decay: float = 0.995,
                       t_max: float = 1000.0,
                       remat: bool = True,
                       attn_impl: str = "auto",
                       token_sharding=None) -> Tuple[DistillState, Dict]:
    """One optimization step; jit with donate_argnums=(0,).

    attn_impl/token_sharding: pass "ring" + an sp NamedSharding when
    running over a mesh — a bare Pallas call cannot be partitioned by
    GSPMD (multi-chip distillation fails to compile without it)."""
    loss, grads = jax.value_and_grad(distill_loss)(
        state.params, batch, cfg=cfg, seq_len=seq_len, rope_sin=rope_sin,
        rope_cos=rope_cos, policy=policy, t_max=t_max, remat=remat,
        attn_impl=attn_impl, token_sharding=token_sharding)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    ema = jax.tree.map(
        lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
        state.ema_params, params)
    new_state = DistillState(params=params, opt_state=opt_state,
                             ema_params=ema, step=state.step + 1)
    metrics = {"loss": loss,
               "grad_norm": optax.global_norm(grads)}
    return new_state, metrics
