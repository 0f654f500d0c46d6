"""Text-to-video generation pipeline.

Capability parity with reference wan/text2video.py:28-269 (`WanT2V`):
umT5 prompt encoding (cond + negative), seeded noise, FlowUniPC/FlowDPM
multistep sampling with classifier-free guidance, VAE decode.

TPU-first redesign (SURVEY §7.1):
  - The ENTIRE denoising loop (model fwd ×2-in-one-batch CFG + solver
    update ×steps) is ONE jitted program — no per-step host sync, no
    `dist.barrier()` (text2video.py:103,266), no CPU offload hops
    (":172-182,224-235").
  - CFG is fused: cond/uncond stacked on the batch axis instead of two
    sequential forwards (text2video.py:238-241).
  - Sharding: params placed via `shard_params` over the (data, fsdp, sp)
    mesh; the same jitted program runs 1-chip or N-chip (GSPMD inserts
    the collectives the reference got from FSDP/xfuser).
  - seq_len rounded up to a multiple of sp_size like the reference
    (text2video.py:162-164), but RoPE tables are built for the padded
    length directly — no per-rank padding hack.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omnihuman_tpu.configs.wan import WanConfig
from omnihuman_tpu.models import t5 as t5_mod
from omnihuman_tpu.models import vae as vae_mod
from omnihuman_tpu.models import wan_dit
from omnihuman_tpu.models.tokenizers import HuggingfaceTokenizer
from omnihuman_tpu.ops.rope import rope_angles_3d
from omnihuman_tpu.samplers.fm_solvers import get_solver
from omnihuman_tpu.utils import convert


class WanT2V:
    """Wan text-to-video pipeline.

    Parameters are either loaded from converted reference checkpoints
    (checkpoint_dir with the torch files) or randomly initialised
    (checkpoint_dir=None — smoke tests, benchmarks).
    """

    def __init__(
        self,
        config: WanConfig,
        checkpoint_dir: Optional[str] = None,
        mesh=None,
        init_seed: int = 0,
        param_dtype: jnp.dtype = jnp.bfloat16,
        tokenizer: Optional[HuggingfaceTokenizer] = None,
        precision: str = "reference",
    ):
        self.config = config
        self.mesh = mesh
        self.param_dtype = param_dtype
        # precision="fast" is the documented serving mode: bf16 residual
        # stream (the context trim rides the tokenizer lens either way
        # and is exact). Pixel gate on the real chip (_bf16_pixel_gate,
        # REPORTS/perf_r4.md §6): PSNR 39.8 dB / SSIM 0.989 vs the fp32
        # reference at a measured 3813.8 vs 3956.7 ms step
        # (REPORTS/perf_r3.md). "reference" keeps the fp32 residual the
        # torch reference uses (model.py:287-296) — the parity default.
        # precision="int8" additionally replaces the DiT block GEMM
        # weights with per-channel int8 and runs them as W8A8 MXU dots
        # (2x the bf16 FLOP rate on v5e, ops/quant.py) on top of the
        # fast-mode bf16 residual stream. Serving-only: training and the
        # parity paths never see quantized params.
        if precision not in ("reference", "fast", "int8"):
            raise ValueError(f"unknown precision {precision!r}; "
                             "supported: 'reference', 'fast', 'int8'")
        self.precision = precision
        import dataclasses as _dc
        self.policy = (config.policy if precision == "reference"
                       else _dc.replace(config.policy,
                                        residual=jnp.bfloat16))
        self.vae_stride = config.vae_stride
        self.patch_size = config.model.patch_size
        self.sp_size = 1 if mesh is None else mesh.shape.get("sp", 1)
        # Mesh execution plan: any active mesh routes self-attention
        # through the shard_map ring path (a bare Pallas call inside a
        # mesh-jit cannot be GSPMD-partitioned, REPORTS/memory_14B.md) and
        # annotates the token axis with the sp sharding (replaces xDiT's
        # explicit chunk/all-gather, xdit_context_parallel.py:130-142).
        if mesh is None:
            self.attn_impl = "auto"
            self.token_sharding = None
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.attn_impl = "ring"
            self.token_sharding = NamedSharding(mesh, P(None, "sp", None))

        self._init_seed = init_seed
        self._t5_params = None
        self._t5_ckpt_path = None
        # Single chip cannot hold umt5-xxl (11.4 GB bf16) AND a resident
        # DiT through the denoise loop (16 GB HBM): free the encoder
        # right after the prompt is embedded, like the reference's
        # t5_cpu/offload_model juggling (text2video.py:172-182). Sharded
        # meshes keep T5 resident (aggregate HBM covers it).
        self.t5_auto_unload = mesh is None
        if checkpoint_dir is not None:
            self.params = self._load_checkpoint(checkpoint_dir)
        else:
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(param_dtype), t)
            key = jax.random.key(init_seed)
            k1, k2, _ = jax.random.split(key, 3)
            init = jax.jit(lambda k1, k2: (
                cast(wan_dit.init_wan_model(k1, config.model)),
                cast(vae_mod.init_vae(k2, config.vae)),
            ))
            # umT5 (5.7B params for umt5-xxl — 11.4GB bf16) is initialised
            # LAZILY on first encode_text(): callers that pass precomputed
            # context never pay its HBM (replaces the reference's t5_cpu
            # offload juggling, text2video.py:172-182)
            self.params, self.vae_params = init(k1, k2)

        if precision == "int8":
            from omnihuman_tpu.ops.quant import quantize_wan_params_jit
            self.params = quantize_wan_params_jit(self.params)

        if mesh is not None:
            from omnihuman_tpu.parallel.partition import shard_params
            self.params = shard_params(self.params, mesh)
            self.vae_params = shard_params(self.vae_params, mesh)
            if self._t5_params is not None:
                self._t5_params = shard_params(self._t5_params, mesh)

        self.tokenizer = tokenizer  # lazily constructed when needed

    @property
    def t5_params(self):
        if self._t5_params is None:
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(self.param_dtype), t)
            if self._t5_ckpt_path is not None:
                self._t5_params = cast(convert.convert_t5(
                    convert.load_torch_state_dict(self._t5_ckpt_path),
                    self.config.t5))
            else:
                key = jax.random.key(self._init_seed + 1000)
                self._t5_params = jax.jit(
                    lambda k: cast(t5_mod.init_t5_encoder(
                        k, self.config.t5)))(key)
            if self.mesh is not None:
                from omnihuman_tpu.parallel.partition import shard_params
                self._t5_params = shard_params(self._t5_params, self.mesh)
        return self._t5_params

    @t5_params.setter
    def t5_params(self, value):
        self._t5_params = value

    def unload_t5(self):
        """Free the text encoder's device memory (the reference's
        offload_model/.cpu() round trips, text2video.py:172-182). The
        lazy `t5_params` property restores it on next use — re-init for
        random weights, reload from `_t5_ckpt_path` for converted ones."""
        self._t5_params = None

    # -- checkpoint loading -------------------------------------------------

    def _load_checkpoint(self, ckpt_dir: str):
        import os
        cast = lambda t: jax.tree.map(lambda x: x.astype(self.param_dtype), t)
        dit_sd = {}
        for fn in sorted(os.listdir(ckpt_dir)):
            if fn.endswith(".safetensors"):
                dit_sd.update(convert.load_torch_state_dict(
                    os.path.join(ckpt_dir, fn)))
        self.params = cast(convert.convert_wan_dit(dit_sd, self.config.model))
        vae_path = os.path.join(ckpt_dir, "Wan2.1_VAE.pth")
        self.vae_params = cast(convert.convert_vae(
            convert.load_torch_state_dict(vae_path), self.config.vae))
        t5_path = os.path.join(ckpt_dir,
                               "models_t5_umt5-xxl-enc-bf16.pth")
        if os.path.exists(t5_path):
            self._t5_ckpt_path = t5_path
            self._t5_params = cast(convert.convert_t5(
                convert.load_torch_state_dict(t5_path), self.config.t5))
        return self.params

    # -- text encoding ------------------------------------------------------

    def _get_tokenizer(self):
        if self.tokenizer is None:
            self.tokenizer = HuggingfaceTokenizer(
                name=self.config.t5_tokenizer, seq_len=self.config.text_len,
                clean="whitespace")
        return self.tokenizer

    def encode_text(self, prompts) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[prompts] → (context [B, text_len, t5.dim], lens [B])."""
        tok = self._get_tokenizer()
        ids, mask = tok(prompts, return_mask=True)
        ctx = t5_mod.t5_encode(self.t5_params, jnp.asarray(ids),
                               jnp.asarray(mask), self.config.t5)
        lens = jnp.asarray(mask.sum(-1), jnp.int32)
        return ctx, lens

    # -- generation ---------------------------------------------------------

    def latent_shape(self, size: Tuple[int, int], frame_num: int):
        """(C, F, H, W) of the latent for a (W, H) pixel size
        (text2video.py:153-161; size is (width, height) like the CLI)."""
        w, h = size
        f = (frame_num - 1) // self.vae_stride[0] + 1
        return (self.config.vae.z_dim, f,
                h // self.vae_stride[1], w // self.vae_stride[2])

    def seq_len_for(self, latent_shape) -> int:
        """Padded token length: a multiple of sp (so tokens shard evenly)
        and, for long sequences, of the flash kernel's 1024 q/k block —
        block-aligned inputs skip the kernel's internal pad copies
        (~24 ms/step at 32k tokens); the 8 extra masked tokens cost
        nothing (seq_lens still carries the true count)."""
        _, f, h, w = latent_shape
        pt, ph, pw = self.patch_size
        n = (f // pt) * (h // ph) * (w // pw)
        align = int(np.lcm(self.sp_size, 1024)) if n >= 4096 else self.sp_size
        return int(math.ceil(n / align) * align)

    def default_cfg_mode(self, seq_len: int) -> str:
        """Decision table from REPORTS/memory_14B.md: fused 2B CFG OOMs
        v5e-8 at 14B/720p (16.75 > 15.75 GiB) while sequential fits
        (15.18 GiB); 1.3B@480p fused fits with 11 GiB headroom."""
        if self.config.model.dim >= 3072 and seq_len >= 40_000:
            return "sequential"
        return "fused"

    def generate(
        self,
        input_prompt: str,
        size: Tuple[int, int] = (832, 480),
        frame_num: int = 81,
        shift: float = 5.0,
        sample_solver: str = "unipc",
        sampling_steps: int = 50,
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
        """Generate one clip; returns video [3, F, H, W] in [-1, 1]
        (reference WanT2V.generate, text2video.py:112-269).

        cfg_mode: 'fused' batches cond+uncond in one 2B forward;
        'sequential' runs them one after the other inside the same jitted
        step (half the activation peak — the mode the 14B@720p v5e-8 mesh
        was memory-validated for, REPORTS/memory_14B.md). None picks the
        recorded decision per model size / token count.
        """
        cfg = self.config
        if n_prompt == "":
            n_prompt = cfg.sample_neg_prompt
        seed = seed if seed >= 0 else np.random.randint(0, 2 ** 31)

        if context is None:
            context, lens_c = self.encode_text([input_prompt])
            context_null, lens_n = self.encode_text([n_prompt])
            context_lens = jnp.concatenate([lens_c, lens_n])
            if self.t5_auto_unload:
                # materialize the (tiny) embeddings, then free the
                # encoder's 11.4 GB before the denoise loop allocates
                jax.block_until_ready((context, context_null))
                self.unload_t5()

        # varlen text masking (reference model.py:530-531 computes
        # context_lens and masks padded tokens in cross-attention) + a
        # TPU win the reference can't take: masked kv columns contribute
        # nothing, so the padded 512-token context can be TRIMMED to a
        # 128-bucket of the true max length — cross-attention cost drops
        # ~4x for typical prompts with bit-identical output. Static
        # bucket → at most text_len/128 step recompiles.
        if context_lens is not None:
            bucket = int(np.ceil(max(1, int(jnp.max(context_lens)))
                                 / 128) * 128)
            if bucket < context.shape[1]:
                context = context[:, :bucket]
                context_null = context_null[:, :bucket]

        lat_shape = self.latent_shape(size, frame_num)
        seq_len = self.seq_len_for(lat_shape)
        if cfg_mode is None:
            cfg_mode = self.default_cfg_mode(seq_len)
        noise = jax.random.normal(jax.random.key(seed), (1,) + lat_shape,
                                  jnp.float32)

        latents = sample(
            self.params, noise, context, context_null,
            model_cfg=self.config.model, policy=self.policy,
            patch_size=self.patch_size, seq_len=seq_len, shift=shift,
            solver=sample_solver, steps=sampling_steps,
            guide_scale=guide_scale,
            num_train_timesteps=self.config.num_train_timesteps,
            fused_loop=fused_loop, mesh=self.mesh,
            attn_impl=self.attn_impl, token_sharding=self.token_sharding,
            cfg_mode=cfg_mode, context_lens=context_lens)
        if return_latents:
            return latents
        video = vae_mod.vae_decode_jit(self.vae_params, latents,
                                       cfg=cfg.vae, streaming=True)
        return video[0]


@functools.partial(jax.jit, static_argnames=(
    "model_cfg", "policy", "seq_len", "guide_scale", "attn_impl",
    "token_sharding", "cfg_mode"))
def _cfg_model_step(params, x, t, ctx2, rope_sin, rope_cos, ctx_lens=None,
                    *, model_cfg, policy, seq_len, guide_scale,
                    attn_impl="auto", token_sharding=None,
                    cfg_mode="fused"):
    """One CFG denoise model call (module-level jit → cached across
    generate() invocations).

    cfg_mode='fused': cond/uncond stacked on batch — max MXU utilisation
    where memory allows (vs two sequential forwards, text2video.py:238-241).
    cfg_mode='sequential': two forwards in the same compiled step — halves
    the activation peak; the validated 14B@720p v5e-8 configuration
    (REPORTS/memory_14B.md decision table).
    """
    fwd = functools.partial(
        wan_dit.wan_model_forward, params, cfg=model_cfg, seq_len=seq_len,
        rope_sin=rope_sin, rope_cos=rope_cos, policy=policy, remat=False,
        attn_impl=attn_impl, token_sharding=token_sharding)
    if cfg_mode == "fused":
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((x2.shape[0],), t, jnp.float32)
        v2 = fwd(x2, t2, ctx2, context_lens=ctx_lens)
        v_cond, v_uncond = jnp.split(v2, 2, axis=0)
    elif cfg_mode == "sequential":
        ctx, ctx_null = jnp.split(ctx2, 2, axis=0)
        lens_c = lens_n = None
        if ctx_lens is not None:
            lens_c, lens_n = ctx_lens[:1], ctx_lens[1:]
        t1 = jnp.full((x.shape[0],), t, jnp.float32)
        v_cond = fwd(x, t1, ctx, context_lens=lens_c)
        v_uncond = fwd(x, t1, ctx_null, context_lens=lens_n)
    else:
        raise ValueError(f"unknown cfg_mode {cfg_mode!r}; "
                         "expected 'fused' or 'sequential'")
    return v_uncond + guide_scale * (v_cond - v_uncond)


def sample(params, noise, context, context_null, *, model_cfg, policy,
           patch_size, seq_len, shift, solver, steps, guide_scale,
           num_train_timesteps, fused_loop=False, mesh=None,
           attn_impl="auto", token_sharding=None, cfg_mode="fused",
           context_lens=None):
    """Denoising loop.

    fused_loop=False (default): ONE compiled model step driven by a host
    loop — compile cost independent of `steps`, and long runs cannot hit
    single-program execution limits of remote runtimes.
    fused_loop=True: the whole loop inside one jitted fori_loop (zero
    host round-trips; preferable on local chips for short step counts).

    mesh/attn_impl/token_sharding: the multi-chip execution plan — the
    mesh is activated around every traced model call so the shard_map
    sequence-parallel attention paths can reach it (parallel.use_mesh).
    """
    grid = (noise.shape[2] // patch_size[0],
            noise.shape[3] // patch_size[1],
            noise.shape[4] // patch_size[2])
    rope_sin, rope_cos = rope_angles_3d(
        grid, model_cfg.head_dim, seq_len=seq_len)

    sol = get_solver(solver, steps, float(shift), num_train_timesteps)

    ctx2 = jnp.concatenate([context, context_null], axis=0)
    ctx_lens = (None if context_lens is None
                else jnp.asarray(context_lens, jnp.int32))
    statics = dict(model_cfg=model_cfg, policy=policy, seq_len=seq_len,
                   guide_scale=float(guide_scale), attn_impl=attn_impl,
                   token_sharding=token_sharding, cfg_mode=cfg_mode)

    import contextlib
    from omnihuman_tpu.parallel.mesh import use_mesh
    mesh_ctx = (lambda: use_mesh(mesh)) if mesh is not None else \
        contextlib.nullcontext

    if fused_loop:
        def model_fn(x, t, i):
            return _cfg_model_step(params, x, t, ctx2, rope_sin, rope_cos,
                                   ctx_lens=ctx_lens, **statics)
        with mesh_ctx():
            return sol.sample_loop(model_fn, noise)

    ts = sol.timesteps
    x = noise
    state = sol.init_state(noise)
    for i in range(steps):
        with mesh_ctx():
            v = _cfg_model_step(params, x, jnp.float32(ts[i]), ctx2,
                                rope_sin, rope_cos, ctx_lens=ctx_lens,
                                **statics)
        x, state = sol.jitted_step(state, v, x, jnp.asarray(i, jnp.int32))
    return x
