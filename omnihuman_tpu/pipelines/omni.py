"""OmniHuman sampling pipeline — CFG-annealed flow sampling with the
mesh execution plan.

The generation loop of reference `Omnihuman/omnihuman_wan_t2v.py:310-451`
(FlowDPMSolver sampling, CFG annealing ":432-438") as a reusable
function shared by `cli/omni_inference.py` and the mesh equivalence
tests. The mesh plan mirrors `pipelines/text2video.py:64-82`: an active
mesh routes self-attention through the shard_map ring path (bare Pallas
under a mesh-jit cannot be GSPMD-partitioned, REPORTS/memory_14B.md),
annotates the token axis on `sp`, and aligns the PACKED sequence
(video + reference + motion tokens) to the sp degree via
`omni_model_forward(seq_align=...)` — packed omni sequences are longer
than plain i2v at the same resolution, which is exactly why the plain
pipelines' seq_len rule cannot be reused verbatim (VERDICT r3 item 4).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

from omnihuman_tpu.configs.wan import DTypePolicy
from omnihuman_tpu.omni.model import OmniModelConfig, omni_model_forward
from omnihuman_tpu.samplers.fm_solvers import get_solver


def omni_mesh_plan(mesh):
    """(attn_impl, token_sharding, seq_align) for an optional mesh —
    the omni counterpart of WanT2V's constructor plan."""
    if mesh is None:
        return "auto", None, 1
    from jax.sharding import NamedSharding, PartitionSpec as P
    sp = int(mesh.shape.get("sp", 1))
    return "ring", NamedSharding(mesh, P(None, "sp", None)), sp


def omni_generate(
    params,
    noise: jnp.ndarray,                  # [B, C, F, H, W]
    context: jnp.ndarray,                # [B, L, text_dim]
    context_null: jnp.ndarray,
    *,
    cfg: OmniModelConfig,
    policy: DTypePolicy = DTypePolicy(),
    sampling_steps: int = 25,
    cfg_scale: float = 7.5,
    solver: str = "dpm++",
    shift: float = 1.0,
    mesh=None,
    audio: Optional[jnp.ndarray] = None,
    pose: Optional[jnp.ndarray] = None,
    ref_latent: Optional[jnp.ndarray] = None,
    motion_latent: Optional[jnp.ndarray] = None,
    context_lens: Optional[jnp.ndarray] = None,
    null_lens: Optional[jnp.ndarray] = None,
    remat=False,
) -> jnp.ndarray:
    """Sample latents with CFG annealing
    (omnihuman_wan_t2v.py:432-438: cfg_t = cfg*(1-progress) + progress).

    CFG is sequential by construction here: the uncond branch carries no
    omni conditions, so the batch-2 fused trick of the wan pipelines
    would run the condition encoders on garbage for half the batch."""
    sol = get_solver(solver, sampling_steps, shift)
    attn_impl, token_sharding, seq_align = omni_mesh_plan(mesh)
    b = noise.shape[0]
    akw = dict(cfg=cfg, policy=policy, remat=remat,
               attn_impl=attn_impl, token_sharding=token_sharding,
               seq_align=seq_align)

    def model_fn(x, t, i):
        progress = i / sampling_steps
        cfg_t = cfg_scale * (1.0 - progress) + progress
        tb = jnp.full((b,), t, jnp.float32)
        v_c = omni_model_forward(
            params, x, tb, context, audio=audio, pose=pose,
            ref_latent=ref_latent, motion_latent=motion_latent,
            context_lens=context_lens, **akw)
        v_u = omni_model_forward(
            params, x, tb, context_null, context_lens=null_lens, **akw)
        return v_u + cfg_t * (v_c - v_u)

    ctxmgr = contextlib.nullcontext()
    if mesh is not None:
        from omnihuman_tpu.parallel.mesh import use_mesh
        ctxmgr = use_mesh(mesh)
    with ctxmgr:
        latents = jax.jit(lambda z: sol.sample_loop(model_fn, z))(noise)
    return latents


def omni_generate_windowed(
    params,
    key,
    *,
    cfg: OmniModelConfig,
    latent_shape,                        # (B, C, F_window, H, W)
    context: jnp.ndarray,
    context_null: jnp.ndarray,
    total_frames: int,                   # total latent frames wanted
    motion_frames: int = 2,
    audio: Optional[jnp.ndarray] = None,     # [B, total_frames(+), D]
    pose: Optional[jnp.ndarray] = None,      # [B, K, total_frames(+), H2, W2]
    ref_latent: Optional[jnp.ndarray] = None,
    **gen_kw,
) -> jnp.ndarray:
    """Windowed autoregressive long-video generation (the spec's 'motion
    frames for long video', reference README.md:150-154; VERDICT r4
    item 3).

    Window 1 samples unconditioned on motion; every later window packs
    the previous window's LAST `motion_frames` latent frames as motion
    tokens (omni/model.py packed-RoPE layout: ref @ t=0, motion @ 1..M,
    video @ M+1..), so clip N+1 continues clip N's motion. All windows
    share `latent_shape`'s static F_window (two jit graphs total: with /
    without motion tokens); the result is trimmed to `total_frames`.

    Per-frame conditions (audio [B,F,D], pose [B,K,F,H,W]) are sliced
    per window; if they are shorter than the padded window span, the
    last frame is repeated (the dataset's zero-fill cousin, but
    continuity-preserving for inference).
    """
    b, c, f_win, h, w = latent_shape
    if total_frames <= f_win:
        noise = jax.random.normal(key, latent_shape, jnp.float32)
        return omni_generate(
            params, noise, context, context_null, cfg=cfg,
            audio=None if audio is None else audio[:, :f_win],
            pose=None if pose is None else pose[:, :, :f_win],
            ref_latent=ref_latent, **gen_kw)[:, :, :total_frames]
    if not 0 < motion_frames < f_win:
        raise ValueError(f"motion_frames {motion_frames} must be in "
                         f"(0, window {f_win})")

    def _slice_frames(x, axis, start):
        """x[start:start+f_win] on `axis`, repeating the last frame when
        the condition track runs out before the final padded window."""
        n = x.shape[axis]
        take = min(f_win, max(0, n - start))
        sl = jax.lax.slice_in_dim(x, start, start + take, axis=axis)
        if take < f_win:
            last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
            reps = [1] * x.ndim
            reps[axis] = f_win - take
            sl = jnp.concatenate([sl, jnp.tile(last, reps)], axis=axis)
        return sl

    clips = []
    motion = None
    start = 0
    widx = 0
    while start < total_frames:
        noise = jax.random.normal(jax.random.fold_in(key, widx),
                                  latent_shape, jnp.float32)
        lat = omni_generate(
            params, noise, context, context_null, cfg=cfg,
            audio=None if audio is None else _slice_frames(audio, 1, start),
            pose=None if pose is None else _slice_frames(pose, 2, start),
            ref_latent=ref_latent, motion_latent=motion, **gen_kw)
        clips.append(lat)
        motion = lat[:, :, -motion_frames:]
        start += f_win
        widx += 1
    return jnp.concatenate(clips, axis=2)[:, :, :total_frames]
