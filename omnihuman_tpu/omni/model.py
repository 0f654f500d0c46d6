"""OmniHuman conditioned DiT — multi-modal condition injection, FINISHED.

Capability parity with reference Omnihuman/omnihuman_wan_t2v.py:13-508
(`OmniConditionsModule` / `OmniHumanWanT2V`), which builds condition tokens
but never wires them into the DiT (its `extra_conditions=` kwarg is not
accepted by WanModel.forward — SURVEY §2.6 caveat). Here the injection is
implemented per the spec (reference README.md:117-154):

  - AUDIO (README.md:121-129): wav2vec features → MLP (Linear→SiLU→Linear,
    omnihuman_wan_t2v.py:140-145) → adjacent-frame concat + merge →
    per-block zero-init-gated CROSS-ATTENTION into the DiT
    (models/wan_dit.py audio_ctx path).
  - POSE (README.md:131-137): heatmap sequence → pose-guider Conv3d stack
    (K→128→256→dim/4 with (1,2,2) strides, omnihuman_wan_t2v.py:147-156)
    → projected to patch-token space and ADDED to the patch embedding —
    mathematically identical to stacking along the channel axis with
    zero-init extra input channels, but leaves base weights untouched.
  - REFERENCE (README.md:146-154): VAE latent of the reference image →
    SAME patch embedding → tokens PACKED after the video tokens in
    self-attention, distinguished by RoPE temporal component: reference
    tokens at frame index 0, video tokens shifted by +1.
  - TEXT: the unchanged Wan cross-attention branch (README.md:139-143).
  - temporal embedding [1, T, dim] added per latent frame
    (omnihuman_wan_t2v.py:159-161).

Condition dropout (the per-condition activation ratios of the 3-stage
strategy, omni_config.yaml:72-102) is realised as multiplicative [B]
masks so one compiled graph serves every drop pattern.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from omnihuman_tpu.configs.wan import DTypePolicy, WanModelConfig
from omnihuman_tpu.models import wan_dit
from omnihuman_tpu.models.wan_dit import _linear, _linear_init
from omnihuman_tpu.ops.rope import rope_angles_3d

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class OmniModelConfig:
    """Omni-conditions dimensions (omni_config.yaml + omnihuman_wan_t2v.py)."""

    base: WanModelConfig = WanModelConfig()
    audio_dim: int = 1024          # wav2vec feature width (yaml audio_dim)
    num_keypoints: int = 308       # Sapiens-308 (omni_config.yaml:33)
    num_frames: int = 49           # latent frames for temporal embed
    pose_hidden: Tuple[int, int] = (128, 256)

    @property
    def dim(self) -> int:
        return self.base.dim


# ---------------------------------------------------------------------------
# init


def init_omni_conditions(key: jax.Array, cfg: OmniModelConfig) -> Params:
    ks = jax.random.split(key, 12)
    dim = cfg.dim
    h1, h2 = cfg.pose_hidden
    c4 = dim // 4

    def conv3(k, cin, cout):
        fan = cin * 27
        a = 1.0 / math.sqrt(fan)
        kw, kb = jax.random.split(k)
        return {"w": jax.random.uniform(kw, (3, 3, 3, cin, cout),
                                        jnp.float32, -a, a),
                "b": jax.random.uniform(kb, (cout,), jnp.float32, -a, a)}

    return {
        # audio MLP (omnihuman_wan_t2v.py:140-145) + adjacent-frame merge
        "audio_fc1": _linear_init(ks[0], cfg.audio_dim, dim),
        "audio_fc2": _linear_init(ks[1], dim, dim),
        "audio_merge": _linear_init(ks[2], 2 * dim, dim),
        # pose guider (omnihuman_wan_t2v.py:147-156)
        "pose_conv1": conv3(ks[3], cfg.num_keypoints, h1),
        "pose_conv2": conv3(ks[4], h1, h2),
        "pose_conv3": conv3(ks[5], h2, c4),
        # projects guider features of one patch to a token delta; zero-init
        # so the pretrained backbone is untouched at step 0
        "pose_proj": {
            "w": jnp.zeros((c4 * cfg.base.patch_size[1]
                            * cfg.base.patch_size[2], dim)),
            "b": jnp.zeros((dim,))},
        # temporal embedding (omnihuman_wan_t2v.py:159-161)
        "temporal_embed": jax.random.normal(
            ks[6], (1, cfg.num_frames, dim)) / dim ** 0.5,
    }


def _audio_adapter_init(key, dim):
    ks = jax.random.split(key, 5)
    lin = lambda k: _linear_init(k, dim, dim)
    return {
        "norm": {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))},
        "q": lin(ks[0]), "k": lin(ks[1]), "v": lin(ks[2]),
        # zero-init output proj + learnable scalar gate: injection is a
        # no-op at initialisation (adapter-style, preserves pretrained Wan)
        "o": {"w": jnp.zeros((dim, dim)), "b": jnp.zeros((dim,))},
        "norm_q": {"w": jnp.ones((dim,))},
        "norm_k": {"w": jnp.ones((dim,))},
        "gate": jnp.ones(()),
    }


def init_omni_model(key: jax.Array, cfg: OmniModelConfig,
                    base_params: Optional[Params] = None) -> Params:
    """Full omni model: base Wan DiT (+audio adapters in every block) +
    condition encoders."""
    k1, k2, k3 = jax.random.split(key, 3)
    base = (base_params if base_params is not None
            else wan_dit.init_wan_model(k1, cfg.base))
    adapter_keys = jax.random.split(k2, cfg.base.num_layers)
    adapters = [_audio_adapter_init(k, cfg.dim) for k in adapter_keys]
    base = dict(base)
    base["blocks"] = dict(base["blocks"])
    base["blocks"]["audio_attn"] = jax.tree.map(
        lambda *xs: jnp.stack(xs), *adapters)
    return {"base": base, "cond": init_omni_conditions(k3, cfg)}


# ---------------------------------------------------------------------------
# condition encoders


def process_audio(cond: Params, audio: jnp.ndarray,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """[B, T, audio_dim] → [B, T, dim] tokens: MLP then adjacent-frame
    concat (omnihuman_wan_t2v.py:180-200; README.md:127) merged back to
    dim (the reference leaves the 2*dim concat dangling)."""
    x = _linear(cond["audio_fc1"], audio, compute_dtype)
    x = jax.nn.silu(x)
    x = _linear(cond["audio_fc2"], x)
    if x.shape[1] > 1:
        pairs = jnp.concatenate([x, jnp.roll(x, -1, axis=1)], axis=-1)
        x = _linear(cond["audio_merge"], pairs)
    return x


def process_pose(cond: Params, pose: jnp.ndarray,
                 patch_size: Tuple[int, int, int],
                 compute_dtype=jnp.float32) -> jnp.ndarray:
    """[B, K, F, H*8?, W*8?] heatmaps → per-patch token deltas [B, L, dim].

    Guider strides (1,2,2)x2 reduce spatial 4x; the final projection folds
    the remaining patch_size into tokens. Input heatmaps are expected at
    (latent_H*2, latent_W*2) resolution so that after the two stride-2
    convs the map aligns with the latent grid (H/2, W/2 per patch cell of
    (1,2,2)) — i.e. one guider cell per DiT patch.
    """
    from omnihuman_tpu.models.vae import _conv3d
    # vae._conv3d is channels-last: [B, K, F, H, W] → [B, F, H, W, K]
    x = pose.astype(compute_dtype).transpose(0, 2, 3, 4, 1)
    x = jax.nn.relu(_conv3d(x, cond["pose_conv1"]["w"].astype(compute_dtype),
                            cond["pose_conv1"]["b"].astype(compute_dtype),
                            padding="causal"))
    x = jax.nn.relu(_conv3d(x, cond["pose_conv2"]["w"].astype(compute_dtype),
                            cond["pose_conv2"]["b"].astype(compute_dtype),
                            stride=(1, 2, 2), padding="causal"))
    x = jax.nn.relu(_conv3d(x, cond["pose_conv3"]["w"].astype(compute_dtype),
                            cond["pose_conv3"]["b"].astype(compute_dtype),
                            stride=(1, 2, 2), padding="causal"))
    # x: [B, F, h', w', dim/4] with (h', w') == latent grid/patch
    b, f, h, w, c = x.shape
    pt, ph, pw = patch_size
    # one token per (f, h, w) guider cell == one DiT patch
    x = x.reshape(b, f * h * w, c)
    # fold in patch spatial extent via the projection (c*ph*pw → dim);
    # guider cell already covers the patch, so tile features
    x = jnp.tile(x, (1, 1, ph * pw))
    return _linear(cond["pose_proj"], x)


# ---------------------------------------------------------------------------
# forward


def omni_model_forward(
    params: Params,
    x: jnp.ndarray,                  # [B, C, F, H, W] noisy latents
    t: jnp.ndarray,                  # [B]
    context: jnp.ndarray,            # [B, text_len, text_dim]
    *,
    cfg: OmniModelConfig,
    audio: Optional[jnp.ndarray] = None,        # [B, Ta, audio_dim]
    pose: Optional[jnp.ndarray] = None,         # [B, K, F, 4h', 4w']
    ref_latent: Optional[jnp.ndarray] = None,   # [B, C, 1, H, W]
    motion_latent: Optional[jnp.ndarray] = None,  # [B, C, M, H, W] prev clip
    cond_mask: Optional[Dict[str, jnp.ndarray]] = None,  # [B] per modality
    context_lens: Optional[jnp.ndarray] = None,
    policy: DTypePolicy = DTypePolicy(),
    remat=True,
    attn_impl: str = "auto",
    token_sharding=None,
    seq_align: int = 1,
) -> jnp.ndarray:
    """Velocity prediction with omni-conditions injected.

    cond_mask: {"audio"/"pose"/"reference": [B] in {0,1}} — the training
    strategy's per-condition activation (omnihuman_trainer.py:330-335)
    as multiplicative masks (single compiled graph for all patterns).

    motion_latent: latent frames of the PREVIOUS clip, packed as extra
    self-attention tokens at their true (past) temporal RoPE indices —
    the spec's 'motion frames for long video generation'
    (README.md:154). Temporal layout when present:
        reference @ t=0, motion @ t=1..M, video @ t=M+1..

    remat: True = per-block checkpointing, int g = grouped two-level
    remat (the 14B setting) — same semantics as wan_model_forward.
    seq_align: sp mesh degree; the packed video+ref+motion length is
    padded (masked, identity-RoPE) to an sp-divisible and — at flagship
    lengths — 1024-flash-block-aligned total, the same rule as
    WanT2V.seq_len_for. Without this, ring attention rejects packed
    lengths that don't shard evenly.
    """
    base_cfg = cfg.base
    bp = params["base"]
    cond = params["cond"]
    b, _, f, h, w = x.shape
    pt, ph, pw = base_cfg.patch_size
    grid = (f // pt, h // ph, w // pw)
    n_video = grid[0] * grid[1] * grid[2]

    def mask_of(name):
        if cond_mask is None or name not in cond_mask:
            return None
        return cond_mask[name].reshape(b, 1, 1).astype(jnp.float32)

    # ---- video tokens (+ pose delta + temporal embed)
    tokens = wan_dit._patchify(bp, x, base_cfg, policy)       # [B, Lv, dim]
    if pose is not None:
        pd = process_pose(cond, pose, base_cfg.patch_size)
        m = mask_of("pose")
        if m is not None:
            pd = pd * m
        tokens = tokens + pd.astype(tokens.dtype)
    # temporal embedding per latent frame, broadcast over spatial cells
    te = cond["temporal_embed"][:, :grid[0]].astype(jnp.float32)  # [1,F,dim]
    te = jnp.repeat(te, grid[1] * grid[2], axis=1)                # [1,Lv,dim]
    tokens = tokens + te

    # ---- reference / motion tokens packed after video tokens
    # (RoPE temporal layout: ref @ 0, motion @ 1..M, video @ M+1..)
    extra_tokens = []
    extra_tables = []
    m_frames = 0
    if motion_latent is not None:
        m_frames = motion_latent.shape[2] // pt
        mot_tokens = wan_dit._patchify(bp, motion_latent, base_cfg, policy)
        mg = (m_frames, grid[1], grid[2])
        sin_m, cos_m = rope_angles_3d(mg, base_cfg.head_dim, time_offset=1)
        extra_tokens.append(mot_tokens)
        extra_tables.append((sin_m, cos_m))
    if ref_latent is not None:
        ref_tokens = wan_dit._patchify(bp, ref_latent, base_cfg, policy)
        m = mask_of("reference")
        if m is not None:
            ref_tokens = ref_tokens * m
        rg = (ref_latent.shape[2] // pt, grid[1], grid[2])
        sin_r, cos_r = rope_angles_3d(rg, base_cfg.head_dim, time_offset=0)
        extra_tokens.append(ref_tokens)
        extra_tables.append((sin_r, cos_r))

    if extra_tokens:
        video_offset = 1 + m_frames
        sin_v, cos_v = rope_angles_3d(grid, base_cfg.head_dim,
                                      time_offset=video_offset)
        tokens = jnp.concatenate([tokens] + extra_tokens, axis=1)
        rope_sin = jnp.concatenate([sin_v] + [t[0] for t in extra_tables],
                                   axis=0)
        rope_cos = jnp.concatenate([cos_v] + [t[1] for t in extra_tables],
                                   axis=0)
    else:
        rope_sin, rope_cos = rope_angles_3d(grid, base_cfg.head_dim)

    n_packed = tokens.shape[1]
    # seq_len_for rule on the PACKED length: sp-divisible, and
    # 1024-flash-block aligned at flagship lengths (pad is masked via
    # seq_lens + identity RoPE inside dit_body)
    import numpy as np
    align = (int(np.lcm(max(seq_align, 1), 1024)) if n_packed >= 4096
             else max(seq_align, 1))
    seq_len = int(math.ceil(n_packed / align) * align)

    # ---- audio tokens
    audio_ctx = None
    if audio is not None:
        audio_ctx = process_audio(cond, audio)
        m = mask_of("audio")
        if m is not None:
            audio_ctx = audio_ctx * m

    # ---- run the shared DiT trunk on the packed sequence (ONE body with
    # wan_model_forward: grouped remat, taps, padding, sp sharding —
    # wan_dit.dit_body)
    out, _ = wan_dit.dit_body(
        bp, tokens, t, context, cfg=base_cfg, seq_len=seq_len,
        rope_sin=rope_sin, rope_cos=rope_cos, n_tokens=n_packed,
        context_lens=context_lens, policy=policy, remat=remat,
        attn_impl=attn_impl, token_sharding=token_sharding,
        audio_ctx=audio_ctx)
    # drop reference/motion/pad tokens before unpatchify: only video
    # tokens decode
    return wan_dit._unpatchify(out[:, :n_video], grid,
                               base_cfg).astype(jnp.float32)
