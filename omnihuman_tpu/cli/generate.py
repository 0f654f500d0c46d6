"""Generation CLI — t2v / t2i / i2v over the named model registry.

Capability parity with the reference's top-level generation entry points
(wan CLI surface: --task/--size/--frame_num/--sample_steps/... flags;
seaweed_apt/generate.py teacher-data mode is `cli/teacher_data.py`).
Sequence parallelism is exposed as --sp_size (replacing --ulysses_size /
--ring_size: both map onto the single `sp` mesh axis here).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("omnihuman-tpu generate")
    p.add_argument("--task", default="t2v-1.3B",
                   help="model registry key (t2v-1.3B, t2v-14B, i2v-14B, "
                        "t2i-14B, t2v-1.3B-small)")
    p.add_argument("--size", default="480*832",
                   help="HxW key from SIZE_CONFIGS, e.g. 480*832")
    p.add_argument("--frame_num", type=int, default=None)
    p.add_argument("--prompt", default="a cat walking in the rain")
    p.add_argument("--image", default=None, help="reference image (i2v)")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--sample_solver", default="unipc",
                   choices=("unipc", "dpm++"))
    p.add_argument("--sample_steps", type=int, default=None)
    p.add_argument("--sample_shift", type=float, default=None)
    p.add_argument("--sample_guide_scale", type=float, default=None)
    p.add_argument("--base_seed", type=int, default=-1)
    p.add_argument("--n_prompt", default="")
    p.add_argument("--save_file", default=None)
    p.add_argument("--sp_size", type=int, default=1,
                   help="sequence-parallel degree (sp mesh axis)")
    p.add_argument("--fsdp_size", type=int, default=1,
                   help="parameter-sharding degree (fsdp mesh axis)")
    p.add_argument("--precision", default="fast",
                   choices=("fast", "reference", "int8"),
                   help="serving default 'fast' = bf16 residual stream "
                        "(real-chip pixel gate: PSNR 39.8 dB / SSIM "
                        "0.989 vs fp32, 3.6%% faster step — "
                        "REPORTS/perf_r4.md §6); 'reference' = fp32 "
                        "residual, exact torch-reference parity; "
                        "'int8' = fast + W8A8 int8 DiT GEMMs on the MXU "
                        "(ops/quant.py, REPORTS/perf_r4.md §7)")
    p.add_argument("--cfg_mode", default=None,
                   choices=("fused", "sequential"),
                   help="classifier-free-guidance execution: fused 2B "
                        "batch or sequential cond/uncond (default: the "
                        "memory-validated mode per model/resolution, "
                        "REPORTS/memory_14B.md)")
    p.add_argument("--one_step", action="store_true",
                   help="Seaweed-APT one-step generation: a SINGLE DiT "
                        "forward at t=T (no CFG/solver loop), then VAE "
                        "decode — the reference's wan_inference.py CLI "
                        "(seaweed_apt/wan_inference.py:217-230). Pass the "
                        "trained one-step generator via --generator_ckpt")
    p.add_argument("--prompts_file", default=None, metavar="TXT",
                   help="one-step batch serving: file with ONE prompt "
                        "per line; all clips are generated in a single "
                        "batched DiT forward + batched VAE decode (batch "
                        "2 fits v5e HBM at 81f 480x832, batch 4 does not "
                        "— REPORTS/perf_r4.md 'batched throughput'). "
                        "Overrides --prompt; outputs get a _NN suffix. "
                        "Requires --one_step")
    p.add_argument("--generator_ckpt", default=None, metavar="DIR",
                   help="orbax dir of a distill/APT training state; its "
                        "EMA stream becomes the one-step generator "
                        "(reference --model_path). Omit to run the base "
                        "DiT weights one-step (smoke/debug)")
    p.add_argument("--export_step", default=None, metavar="PATH",
                   help="instead of generating, export the denoise step "
                        "for this task/size/frame_num as a serialized "
                        "StableHLO serving artifact (utils/export.py)")
    p.add_argument("--export_platform", default="tpu",
                   choices=["tpu", "cpu"])
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the generation")
    p.add_argument("--use_prompt_extend", action="store_true",
                   help="expand the prompt with an LLM (Qwen if local "
                        "weights exist, else the offline template "
                        "expander; DashScope via DASH_API_KEY)")
    p.add_argument("--prompt_extend_target_lang", default="en",
                   choices=("en", "zh"))
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from omnihuman_tpu.configs import SIZE_CONFIGS, SUPPORTED_SIZES, WAN_CONFIGS
    from omnihuman_tpu.utils.logging import logger
    from omnihuman_tpu.utils.media import cache_video

    cfg = WAN_CONFIGS[args.task]
    if args.size in SIZE_CONFIGS:
        if args.size not in SUPPORTED_SIZES[args.task]:
            sys.exit(f"size {args.size} unsupported for {args.task}; "
                     f"choose from {SUPPORTED_SIZES[args.task]}")
        h, w = SIZE_CONFIGS[args.size]
    else:
        try:   # custom "H*W" sizes for smoke runs / small models
            h, w = (int(x) for x in args.size.split("*"))
        except ValueError:
            sys.exit(f"size {args.size} not parseable; registry sizes: "
                     f"{list(SIZE_CONFIGS)}")
    frame_num = args.frame_num or (1 if args.task == "t2i-14B"
                                   else cfg.frame_num)

    if args.export_step:
        from omnihuman_tpu.utils.export import (
            export_i2v_denoise_step, export_t2v_denoise_step)
        guide = (args.sample_guide_scale
                 if args.sample_guide_scale is not None
                 else cfg.sample_guide_scale)
        exporter = (export_i2v_denoise_step if args.task.startswith("i2v")
                    else export_t2v_denoise_step)
        path = exporter(
            cfg, (w, h), frame_num, args.export_step, guide_scale=guide,
            platforms=(args.export_platform,),
            cfg_mode=args.cfg_mode or "fused", precision=args.precision)
        logger.info(f"exported serving step -> {path} (+.json sidecar)")
        return path

    if args.use_prompt_extend:
        # reference CLI surface: --use_prompt_extend with dashscope/qwen
        # backends (wan/utils/prompt_extend.py)
        import os as _os
        from omnihuman_tpu.utils.prompt_extend import (
            DashScopePromptExpander, QwenPromptExpander)
        expander = (DashScopePromptExpander()
                    if _os.environ.get("DASH_API_KEY")
                    else QwenPromptExpander())
        out = expander(args.prompt, tar_lang=args.prompt_extend_target_lang,
                       seed=max(args.base_seed, 0))
        if out.status:
            logger.info(f"prompt extended: {out.prompt}")
            args.prompt = out.prompt
        else:
            logger.warning(f"prompt extension failed: {out.message}")

    mesh = None
    if args.sp_size > 1 or args.fsdp_size > 1:
        from omnihuman_tpu.parallel import MeshConfig, create_mesh
        mesh = create_mesh(MeshConfig(data=-1, fsdp=args.fsdp_size,
                                      sp=args.sp_size))

    import contextlib
    prof = contextlib.nullcontext()
    if args.profile:
        from omnihuman_tpu.utils.logging import profile_trace
        prof = profile_trace(args.profile)

    if args.prompts_file and not args.one_step:
        sys.exit("--prompts_file is the one-step batch-serving mode; "
                 "pass --one_step (the multi-step solver loop serves one "
                 "clip per run)")
    if args.one_step and args.task.startswith("i2v"):
        sys.exit("--one_step is the Seaweed-APT t2v path; i2v tasks have "
                 "no one-step generator (reference wan_inference.py is "
                 "t2v-only)")

    if args.task.startswith("i2v"):
        import numpy as np
        from PIL import Image
        from omnihuman_tpu.pipelines.image2video import WanI2V
        pipe = WanI2V(cfg, checkpoint_dir=args.ckpt_dir, mesh=mesh,
                      precision=args.precision)
        img = np.asarray(Image.open(args.image).convert("RGB"),
                         np.float32).transpose(2, 0, 1) / 127.5 - 1.0
        with prof:
            video = pipe.generate(
                args.prompt, img, max_area=h * w, frame_num=frame_num,
                shift=args.sample_shift or cfg.sample_shift,
                sample_solver=args.sample_solver,
                sampling_steps=args.sample_steps or cfg.sample_steps,
                guide_scale=(args.sample_guide_scale
                             or cfg.sample_guide_scale),
                n_prompt=args.n_prompt, seed=args.base_seed,
                cfg_mode=args.cfg_mode)
    elif args.one_step:
        from omnihuman_tpu.pipelines.text2video import WanT2V
        from omnihuman_tpu.pipelines.wan_inference import (
            SeaweedWanAPTGenerator)
        pipe = WanT2V(cfg, checkpoint_dir=args.ckpt_dir, mesh=mesh,
                      precision=args.precision)
        g_params = None
        if args.generator_ckpt:
            from omnihuman_tpu.utils.checkpoint import CheckpointManager
            state = CheckpointManager(args.generator_ckpt).restore()
            if state is None:
                sys.exit(f"no checkpoint found in {args.generator_ckpt}")
            # distill/APT states both carry the generator as `ema_params`
            # (apt/distill.py:39, apt/apt_trainer.py:74); a bare params
            # PyTree is accepted as-is
            if isinstance(state, dict) and "ema_params" in state:
                g_params = state["ema_params"]
            else:
                g_params = getattr(state, "ema_params", state)
            if args.precision == "int8":
                from omnihuman_tpu.ops.quant import quantize_wan_params_jit
                g_params = quantize_wan_params_jit(g_params)
        gen = SeaweedWanAPTGenerator(pipe, generator_params=g_params)
        if args.prompts_file:
            # batch serving: B prompts -> ONE batched forward + ONE
            # batched decode (REPORTS/perf_r4.md "batched throughput";
            # batch 2 fits v5e HBM at 81f 480x832, batch 4 does not)
            prompts = [ln.strip() for ln in
                       open(args.prompts_file, encoding="utf-8")
                       if ln.strip()]
            if not prompts:
                sys.exit(f"{args.prompts_file} contains no prompts")
            with prof:
                videos = gen.generate_batch(prompts, size=(w, h),
                                            frame_num=frame_num,
                                            seed=args.base_seed)
            logger.info(f"one-step batch timings: {gen.timings}")
            stem = (args.save_file or
                    f"{args.task.replace('-', '_')}"
                    f"_{args.size.replace('*', 'x')}.mp4")
            root, ext = os.path.splitext(stem)
            paths = [cache_video(videos[i], f"{root}_{i:02d}{ext}",
                                 fps=cfg.sample_fps)
                     for i in range(videos.shape[0])]
            for p_ in paths:
                logger.info(f"saved {p_}")
            return paths
        with prof:
            video = gen.generate(args.prompt, size=(w, h),
                                 frame_num=frame_num, seed=args.base_seed)
        logger.info(f"one-step stage timings: {gen.timings}")
    else:
        from omnihuman_tpu.pipelines.text2video import WanT2V
        pipe = WanT2V(cfg, checkpoint_dir=args.ckpt_dir, mesh=mesh,
                      precision=args.precision)
        with prof:
            video = pipe.generate(
                args.prompt, size=(w, h), frame_num=frame_num,
                shift=args.sample_shift or cfg.sample_shift,
                sample_solver=args.sample_solver,
                sampling_steps=args.sample_steps or cfg.sample_steps,
                guide_scale=(args.sample_guide_scale
                             or cfg.sample_guide_scale),
                n_prompt=args.n_prompt, seed=args.base_seed,
                cfg_mode=args.cfg_mode)

    out = args.save_file or f"{args.task.replace('-', '_')}_{args.size.replace('*','x')}.mp4"
    path = cache_video(video, out, fps=cfg.sample_fps)
    logger.info(f"saved {path}")
    return path


if __name__ == "__main__":
    main()
