"""Seaweed-APT model wrappers: one-step generator, discriminator, R1.

Capability parity with reference seaweed_apt/model.py:
  - WanAPTGenerator (":189-221"): x = z - model(z, t=T_final, ctx).
  - WanAPTDiscriminator (":86-186"): frozen Wan backbone + learnable-query
    cross-attention probes on intermediate blocks + LayerNorm+Linear to a
    scalar logit; timestep shift s=1 (images) / s=12 (videos) applied to
    the backbone timestep (":158-160"; paper §3.3).
  - approximated_r1_loss (":224-251"): E[(D(x) - D(x+sigma*eps))^2].

TPU-first: the reference harvests block outputs with forward hooks under
torch.no_grad (":150-163"); here the backbone exposes `collect_layers`
(models/wan_dit.py) and the taps are wrapped in stop_gradient — explicit
dataflow, jit/grad-safe, no module mutation.

Tap layers: the reference hardcodes blocks 15/25/35 — valid only for the
40-layer 14B model. We default to the same depth fractions (~40/65/90%)
scaled to the actual depth, which reproduces (15, 25, 35) at 40 layers.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from omnihuman_tpu.configs.wan import DTypePolicy, WanModelConfig
from omnihuman_tpu.models import wan_dit
from omnihuman_tpu.ops.norms import layer_norm


def default_tap_layers(num_layers: int) -> Tuple[int, int, int]:
    """(15, 25, 35) at 40 layers; proportional otherwise."""
    if num_layers >= 36:
        return (15, 25, 35)
    fr = (15 / 40, 25 / 40, 35 / 40)
    return tuple(min(num_layers - 1, int(round(f * num_layers))) for f in fr)


def timestep_shift(t: jnp.ndarray, s: float) -> jnp.ndarray:
    """s*t/(1+(s-1)*t) on normalized t in [0,1] (model.py:159-160 operates
    on raw t/1000 semantics; apt_trainer.py:109-111 uses normalized t)."""
    return s * t / (1.0 + (s - 1.0) * t)


# ---------------------------------------------------------------------------
# generator


def apt_generator_forward(params, z, context, *, cfg: WanModelConfig,
                          seq_len: int, rope_sin, rope_cos,
                          final_timestep: float = 1000.0,
                          policy: DTypePolicy = DTypePolicy(),
                          remat: bool = False,
                          context_lens=None,
                          attn_impl: str = "auto",
                          token_sharding=None) -> jnp.ndarray:
    """One-step generation: x = z - v(z, T_final) (model.py:199-221)."""
    b = z.shape[0]
    t = jnp.full((b,), final_timestep, jnp.float32)
    v = wan_dit.wan_model_forward(
        params, z, t, context, cfg=cfg, seq_len=seq_len, rope_sin=rope_sin,
        rope_cos=rope_cos, policy=policy, remat=remat,
        context_lens=context_lens, attn_impl=attn_impl,
        token_sharding=token_sharding)
    return z - v


# ---------------------------------------------------------------------------
# discriminator


def init_probe(key, dim: int) -> Dict[str, Any]:
    ks = jax.random.split(key, 5)
    lin = lambda k: {"w": jax.random.normal(k, (dim, dim)) * dim ** -0.5,
                     "b": jnp.zeros((dim,))}
    return {
        "query_token": jax.random.normal(ks[0], (1, 1, dim)) / math.sqrt(dim),
        "norm": {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))},
        "q": lin(ks[1]), "k": lin(ks[2]), "v": lin(ks[3]), "o": lin(ks[4]),
        "q_norm": {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))},
        "k_norm": {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))},
    }


def init_apt_discriminator(key, backbone_params, cfg: WanModelConfig,
                           tap_layers: Optional[Sequence[int]] = None
                           ) -> Dict[str, Any]:
    """Discriminator params. The backbone is referenced (frozen), probes +
    head are fresh trainables (model.py:86-121)."""
    taps = tuple(sorted(set(tap_layers if tap_layers is not None
                            else default_tap_layers(cfg.num_layers))))
    ks = jax.random.split(key, len(taps) + 1)
    dim = cfg.dim
    return {
        "backbone": backbone_params,
        "probes": {str(t): init_probe(k, dim) for t, k in zip(taps, ks)},
        "final_norm": {"w": jnp.ones((dim * len(taps),)),
                       "b": jnp.zeros((dim * len(taps),))},
        "final_proj": {
            "w": jax.random.normal(ks[-1], (dim * len(taps), 1))
            * (dim * len(taps)) ** -0.5,
            "b": jnp.zeros((1,))},
    }


def _probe_forward(p, x, num_heads: int) -> jnp.ndarray:
    """Learnable-query cross-attention probe → [B, dim]
    (WanCrossAttentionDiscriminatorBlock, model.py:19-83)."""
    b, l, dim = x.shape
    hd = dim // num_heads
    xn = layer_norm(x, p["norm"]["w"], p["norm"]["b"])
    query = jnp.broadcast_to(p["query_token"], (b, 1, dim))

    q = query @ p["q"]["w"] + p["q"]["b"]
    k = xn @ p["k"]["w"] + p["k"]["b"]
    v = xn @ p["v"]["w"] + p["v"]["b"]
    q = layer_norm(q, p["q_norm"]["w"], p["q_norm"]["b"])
    k = layer_norm(k, p["k_norm"]["w"], p["k_norm"]["b"])

    q = q.reshape(b, 1, num_heads, hd)
    k = k.reshape(b, l, num_heads, hd)
    v = v.reshape(b, l, num_heads, hd)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k) / math.sqrt(hd)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", attn, v).reshape(b, 1, dim)
    out = out @ p["o"]["w"] + p["o"]["b"]
    return out[:, 0]


def apt_discriminator_forward(params, x, t, context, *,
                              cfg: WanModelConfig, seq_len: int,
                              rope_sin, rope_cos,
                              policy: DTypePolicy = DTypePolicy(),
                              context_lens=None,
                              return_features: bool = False,
                              stop_features: bool = True,
                              remat: bool = False,
                              attn_impl: str = "auto",
                              token_sharding=None):
    """Scalar real/fake logit [B, 1] (model.py:123-186).

    The timestep shift (s=1 image / s=12 video) is applied by the caller
    on normalized t (apt_trainer.py:109-111) — this function takes the
    already-shifted raw timestep like the reference backbone call.

    stop_features: cut gradients at the tap activations. True matches the
    reference's torch.no_grad backbone (model.py:162-163) and is correct
    for the D update (only probes/head train). The G update MUST pass
    False: the reference's no_grad there is a bug — it zeroes the
    generator's adversarial gradient entirely, so its GAN can never train
    G. With False, pass remat=True so the differentiable backbone forward
    rematerialises instead of storing 30-40 layers of activations.
    """
    taps = sorted(int(k) for k in params["probes"])
    _, feats = wan_dit.wan_model_forward(
        params["backbone"], x, t, context, cfg=cfg, seq_len=seq_len,
        rope_sin=rope_sin, rope_cos=rope_cos, policy=policy, remat=remat,
        context_lens=context_lens, collect_layers=taps,
        attn_impl=attn_impl, token_sharding=token_sharding)
    if stop_features:
        feats = {k: jax.lax.stop_gradient(v) for k, v in feats.items()}

    probe_outs = [
        _probe_forward(params["probes"][str(tl)], feats[tl], cfg.num_heads)
        for tl in taps]
    concat = jnp.concatenate(probe_outs, axis=-1)            # [B, 3*dim]
    h = layer_norm(concat, params["final_norm"]["w"],
                   params["final_norm"]["b"])
    logit = h @ params["final_proj"]["w"] + params["final_proj"]["b"]
    if return_features:
        return logit, probe_outs
    return logit


def approximated_r1_loss(disc_fn, real_samples, key, sigma: float = 0.01
                         ) -> jnp.ndarray:
    """E[(D(x) - D(x + sigma*eps))^2] (model.py:224-251)."""
    real_pred = disc_fn(real_samples)
    noise = jax.random.normal(key, real_samples.shape, real_samples.dtype)
    perturbed_pred = disc_fn(real_samples + sigma * noise)
    return jnp.mean(jnp.square(real_pred - perturbed_pred))


def ema_update(ema_params, params, decay: float = 0.995):
    """On-device EMA (replaces model.py:254-263's deepcopy-based EMA)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)
