"""Image-to-video generation pipeline.

Capability parity with reference wan/image2video.py:129-350 (`WanI2V`):
  - max_area-driven latent sizing snapped to patch multiples (":180-190")
  - first-frame conditioning: mask channel block (frame 0 = 1, rest = 0,
    grouped 4-per-latent-frame → 4 channels) concatenated with the VAE
    latent of [img, 80 zero frames] → y [20, F_lat, h, w] (":208-245")
  - CLIP 257-token image context prepended inside the DiT (img_emb)
  - UniPC/DPM++ sampling at 40 steps with CFG, same jitted-loop design
    as WanT2V.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omnihuman_tpu.configs.wan import WanConfig
from omnihuman_tpu.models import clip as clip_mod
from omnihuman_tpu.models import vae as vae_mod
from omnihuman_tpu.models import wan_dit
from omnihuman_tpu.ops.rope import rope_angles_3d
from omnihuman_tpu.pipelines.text2video import WanT2V
from omnihuman_tpu.samplers.fm_solvers import get_solver


class WanI2V(WanT2V):
    """Wan image-to-video pipeline (extends the t2v pipeline with the CLIP
    encoder and mask+reference-latent conditioning)."""

    def __init__(self, config: WanConfig, checkpoint_dir: Optional[str] = None,
                 mesh=None, init_seed: int = 0,
                 param_dtype: jnp.dtype = jnp.bfloat16, tokenizer=None,
                 precision: str = "reference"):
        super().__init__(config, checkpoint_dir=checkpoint_dir, mesh=mesh,
                         init_seed=init_seed, param_dtype=param_dtype,
                         tokenizer=tokenizer, precision=precision)
        assert config.clip is not None, "i2v config requires a CLIP encoder"
        self.clip = clip_mod.CLIPModel(config.clip, init_seed=init_seed + 1)

    def latent_size_for(self, img_hw: Tuple[int, int],
                        max_area: int) -> Tuple[int, int]:
        """(lat_h, lat_w) snapped to patch multiples (image2video.py:180-190)."""
        h, w = img_hw
        ar = h / w
        lat_h = int(round(
            np.sqrt(max_area * ar) // self.vae_stride[1]
            // self.patch_size[1] * self.patch_size[1]))
        lat_w = int(round(
            np.sqrt(max_area / ar) // self.vae_stride[2]
            // self.patch_size[2] * self.patch_size[2]))
        return lat_h, lat_w

    @staticmethod
    def first_frame_mask(frame_num: int, lat_h: int, lat_w: int
                         ) -> jnp.ndarray:
        """[4, F_lat, lat_h, lat_w] mask: frame 0 active
        (image2video.py:208-216: repeat frame-0 4x then group by 4)."""
        msk = jnp.zeros((frame_num, lat_h, lat_w))
        msk = msk.at[0].set(1.0)
        msk = jnp.concatenate([jnp.repeat(msk[0:1], 4, axis=0), msk[1:]],
                              axis=0)
        f_lat = msk.shape[0] // 4
        msk = msk.reshape(f_lat, 4, lat_h, lat_w)
        return msk.transpose(1, 0, 2, 3)

    def generate(
        self,
        input_prompt: str,
        img: np.ndarray,                  # [3, H, W] in [-1, 1]
        max_area: int = 720 * 1280,
        frame_num: int = 81,
        shift: float = 5.0,
        sample_solver: str = "unipc",
        sampling_steps: int = 40,
        guide_scale: float = 5.0,
        n_prompt: str = "",
        seed: int = -1,
        context: Optional[jnp.ndarray] = None,
        context_null: Optional[jnp.ndarray] = None,
        context_lens: Optional[jnp.ndarray] = None,   # [2] (cond, uncond)
        return_latents: bool = False,
        fused_loop: bool = False,
        cfg_mode: Optional[str] = None,
    ):
        cfg = self.config
        if n_prompt == "":
            n_prompt = cfg.sample_neg_prompt
        seed = seed if seed >= 0 else int(np.random.randint(0, 2 ** 31))

        img = jnp.asarray(img, jnp.float32)
        lat_h, lat_w = self.latent_size_for(img.shape[1:], max_area)
        h, w = lat_h * self.vae_stride[1], lat_w * self.vae_stride[2]
        f_lat = (frame_num - 1) // self.vae_stride[0] + 1

        if context is None:
            context, lens_c = self.encode_text([input_prompt])
            context_null, lens_n = self.encode_text([n_prompt])
            context_lens = jnp.concatenate([lens_c, lens_n])
            if self.t5_auto_unload:
                # free the encoder's HBM before CLIP + denoise (see
                # WanT2V.generate; reference text2video.py:172-182)
                jax.block_until_ready((context, context_null))
                self.unload_t5()
        # varlen text masking (reference model.py:530-531) + trim the
        # padded context to a 128-bucket of the true max length — masked
        # kv columns contribute nothing, so output is bit-identical and
        # cross-attention cost drops ~4x for typical prompts
        if context_lens is not None:
            bucket = int(np.ceil(max(1, int(jnp.max(context_lens)))
                                 / 128) * 128)
            if bucket < context.shape[1]:
                context = context[:, :bucket]
                context_null = context_null[:, :bucket]

        # CLIP image context (257 tokens)
        clip_fea = self.clip.visual(img[None])

        # reference latent: [img, zeros x (frame_num-1)] through the VAE
        import jax.image
        img_r = jax.image.resize(img[None], (1, 3, h, w), method="bicubic")
        vid = jnp.concatenate(
            [img_r[:, :, None], jnp.zeros((1, 3, frame_num - 1, h, w))],
            axis=2)
        ref_lat = vae_mod.vae_encode_jit(
            self.vae_params, vid, cfg=cfg.vae, streaming=True
        )[0]   # [16, F_lat, h, w]
        msk = self.first_frame_mask(frame_num, lat_h, lat_w)
        y = jnp.concatenate([msk, ref_lat], axis=0)[None]  # [1, 20, F, h, w]

        noise = jax.random.normal(
            jax.random.key(seed), (1, cfg.vae.z_dim, f_lat, lat_h, lat_w),
            jnp.float32)

        seq_len = self.seq_len_for((cfg.vae.z_dim, f_lat, lat_h, lat_w))
        if cfg_mode is None:
            cfg_mode = self.default_cfg_mode(seq_len)
        latents = _i2v_sample(
            self.params, noise, y, clip_fea, context, context_null,
            context_lens=context_lens,
            model_cfg=cfg.model, policy=self.policy,
            patch_size=self.patch_size, seq_len=seq_len, shift=shift,
            solver=sample_solver, steps=sampling_steps,
            guide_scale=guide_scale,
            num_train_timesteps=cfg.num_train_timesteps,
            fused_loop=fused_loop, mesh=self.mesh,
            attn_impl=self.attn_impl, token_sharding=self.token_sharding,
            cfg_mode=cfg_mode)
        if return_latents:
            return latents
        video = vae_mod.vae_decode_jit(self.vae_params, latents,
                                       cfg=cfg.vae, streaming=True)
        return video[0]


def _i2v_sample(params, noise, y, clip_fea, context, context_null, *,
                model_cfg, policy, patch_size, seq_len, shift, solver,
                steps, guide_scale, num_train_timesteps, fused_loop=False,
                mesh=None, attn_impl="auto", token_sharding=None,
                cfg_mode="fused", context_lens=None):
    grid = (noise.shape[2] // patch_size[0],
            noise.shape[3] // patch_size[1],
            noise.shape[4] // patch_size[2])
    rope_sin, rope_cos = rope_angles_3d(grid, model_cfg.head_dim,
                                        seq_len=seq_len)
    sol = get_solver(solver, steps, float(shift), num_train_timesteps)

    ctx2 = jnp.concatenate([context, context_null], axis=0)
    ctx_lens = (None if context_lens is None
                else jnp.asarray(context_lens, jnp.int32))
    y2 = jnp.concatenate([y, y], axis=0)
    clip2 = jnp.concatenate([clip_fea, clip_fea], axis=0)
    statics = dict(model_cfg=model_cfg, policy=policy, seq_len=seq_len,
                   guide_scale=float(guide_scale), attn_impl=attn_impl,
                   token_sharding=token_sharding, cfg_mode=cfg_mode)

    import contextlib
    from omnihuman_tpu.parallel.mesh import use_mesh
    mesh_ctx = (lambda: use_mesh(mesh)) if mesh is not None else \
        contextlib.nullcontext

    if fused_loop:
        def model_fn(x, t, i):
            return _i2v_cfg_model_step(params, x, t, ctx2, y2, clip2,
                                       rope_sin, rope_cos,
                                       ctx_lens=ctx_lens, **statics)
        with mesh_ctx():
            return sol.sample_loop(model_fn, noise)

    ts = sol.timesteps
    x = noise
    state = sol.init_state(noise)
    for i in range(steps):
        with mesh_ctx():
            v = _i2v_cfg_model_step(params, x, jnp.float32(ts[i]), ctx2, y2,
                                    clip2, rope_sin, rope_cos,
                                    ctx_lens=ctx_lens, **statics)
        x, state = sol.jitted_step(state, v, x, jnp.asarray(i, jnp.int32))
    return x


@functools.partial(jax.jit, static_argnames=(
    "model_cfg", "policy", "seq_len", "guide_scale", "attn_impl",
    "token_sharding", "cfg_mode"))
def _i2v_cfg_model_step(params, x, t, ctx2, y2, clip2, rope_sin, rope_cos,
                        ctx_lens=None, *, model_cfg, policy, seq_len,
                        guide_scale, attn_impl="auto", token_sharding=None,
                        cfg_mode="fused"):
    """i2v CFG step; cfg_mode='sequential' runs cond/uncond one after the
    other in the same compiled program — the memory-validated mode for
    i2v-14B@720p on v5e-8 (REPORTS/memory_14B.md: fused OOMs by 1 GiB)."""
    fwd = functools.partial(
        wan_dit.wan_model_forward, params, cfg=model_cfg, seq_len=seq_len,
        rope_sin=rope_sin, rope_cos=rope_cos, policy=policy, remat=False,
        attn_impl=attn_impl, token_sharding=token_sharding)
    if cfg_mode == "fused":
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((x2.shape[0],), t, jnp.float32)
        v = fwd(x2, t2, ctx2, clip_fea=clip2, y=y2,
                context_lens=ctx_lens)
        v_cond, v_uncond = jnp.split(v, 2, axis=0)
    elif cfg_mode == "sequential":
        ctx, ctx_null = jnp.split(ctx2, 2, axis=0)
        y1, _ = jnp.split(y2, 2, axis=0)
        clip1, _ = jnp.split(clip2, 2, axis=0)
        lens_c = lens_n = None
        if ctx_lens is not None:
            lens_c, lens_n = ctx_lens[:1], ctx_lens[1:]
        t1 = jnp.full((x.shape[0],), t, jnp.float32)
        v_cond = fwd(x, t1, ctx, clip_fea=clip1, y=y1,
                     context_lens=lens_c)
        v_uncond = fwd(x, t1, ctx_null, clip_fea=clip1, y=y1,
                       context_lens=lens_n)
    else:
        raise ValueError(f"unknown cfg_mode {cfg_mode!r}; "
                         "expected 'fused' or 'sequential'")
    return v_uncond + guide_scale * (v_cond - v_uncond)
