"""OmniHuman 3-stage training CLI (reference Omnihuman/omnihuman_trainer.py
main(), :496-542): YAML-driven, dataset + tracker + trainer, with REAL
conditioning — T5-encoded captions (omnihuman_wan_t2v.py:270-275),
VAE-encoded reference latents, pose heatmaps and audio features assembled
into every batch, converted Wan weights via --ckpt_dir, (step, stage)
resume via --resume."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("omnihuman-tpu train-omni")
    p.add_argument("--config", default="configs/omni_config.yaml")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--task", default=None,
                   help="registry config (e.g. t2v-1.3B) for the "
                        "backbone/VAE/T5 dims; default = YAML model section")
    p.add_argument("--ckpt_dir", default=None,
                   help="converted Wan checkpoint dir (DiT safetensors + "
                        "Wan2.1_VAE.pth + umT5 .pth); None = random init")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest (step, stage) checkpoint")
    from omnihuman_tpu.parallel.train_mesh import add_mesh_args
    add_mesh_args(p)
    args = p.parse_args(argv)

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from omnihuman_tpu.configs import WAN_CONFIGS
    from omnihuman_tpu.configs.wan import T5Config, VAEConfig, WanModelConfig
    from omnihuman_tpu.models.t5 import T5TextEncoder
    from omnihuman_tpu.models.vae import init_vae, vae_encode_jit
    from omnihuman_tpu.omni.dataset import OmniHumanDataset
    from omnihuman_tpu.omni.model import OmniModelConfig, init_omni_model
    from omnihuman_tpu.omni.tracker import ProblematicVideoTracker
    from omnihuman_tpu.omni.trainer import OmniHumanTrainer, StageConfig
    from omnihuman_tpu.utils.config_io import load_yaml, save_snapshot
    from omnihuman_tpu.utils.logging import MetricsLogger, logger

    cfg = load_yaml(args.config)
    data_dir = args.data_dir or cfg.get_path("data.data_dir", "data/videos")
    out_dir = args.output_dir or cfg.get_path("training.output_dir",
                                              "checkpoints/omni")
    save_snapshot(cfg, out_dir)

    mc = cfg.get_path("model", {})
    if args.task:
        reg = WAN_CONFIGS[args.task]
        base, t5_cfg, vae_cfg = reg.model, reg.t5, reg.vae
        text_len, tok_name = reg.text_len, reg.t5_tokenizer
        policy = reg.policy
    else:
        base = WanModelConfig(
            dim=mc.get("dim", 1536), ffn_dim=mc.get("ffn_dim", 8960),
            num_heads=mc.get("num_heads", 12),
            num_layers=mc.get("num_layers", 30),
            text_dim=mc.get("text_dim", 4096))
        text_len, tok_name = base.text_len, "google/umt5-xxl"
        # random-init encoder sized to the model's text width (a converted
        # umT5 via --ckpt_dir replaces this)
        t5_cfg = T5Config(vocab_size=256384, dim=base.text_dim,
                          dim_attn=base.text_dim,
                          dim_ffn=base.text_dim * 2, num_heads=8,
                          num_layers=2)
        vae_cfg = VAEConfig()
        from omnihuman_tpu.configs.wan import DTypePolicy
        policy = DTypePolicy()
    ocfg = OmniModelConfig(
        base=base, audio_dim=mc.get("audio_dim", 1024),
        num_keypoints=mc.get("num_keypoints", 308),
        num_frames=mc.get("num_frames", 13))

    stages = tuple(
        StageConfig(s["name"], int(s["num_steps"]),
                    dict(s["condition_ratios"]))
        for s in cfg.get("stages", []))

    # ---- weights: converted checkpoint or random init ----------------------
    base_params = None
    if args.ckpt_dir:
        from omnihuman_tpu.utils.convert import load_wan_checkpoint_dir
        base_params, vae_params = load_wan_checkpoint_dir(
            args.ckpt_dir, base, vae_cfg)
        if base_params is not None:
            logger.info("omni backbone <- converted Wan DiT")
    else:
        vae_params = init_vae(jax.random.key(1), vae_cfg)
    params = init_omni_model(jax.random.key(0), ocfg,
                             base_params=base_params)

    text_encoder = T5TextEncoder(t5_cfg, text_len, tokenizer_name=tok_name,
                                 ckpt_dir=args.ckpt_dir)

    from omnihuman_tpu.parallel.train_mesh import (
        TrainMeshPlan, resolve_remat)
    plan = TrainMeshPlan.from_sizes(args.fsdp_size, args.sp_size)
    plan.check_batch(cfg.get_path("training.batch_size", 1))
    logger.info(f"training plan: {plan.describe()}")

    metrics = MetricsLogger(project=cfg.get("project", "omnihuman-tpu"),
                            run_name=cfg.get("run_name"), out_dir=out_dir)
    tracker = ProblematicVideoTracker(f"{out_dir}/bad_videos")
    trainer = OmniHumanTrainer(
        params, ocfg, stages=stages, plan=plan,
        remat=resolve_remat(args.remat_group, base.num_layers),
        learning_rate=cfg.get_path("training.learning_rate", 1e-4),
        scheduler_type=cfg.get_path("training.scheduler_type", "cosine"),
        weight_decay=cfg.get_path("training.weight_decay", 0.01),
        max_grad_norm=cfg.get_path("training.max_grad_norm", 1.0),
        checkpoint_dir=out_dir,
        checkpoint_interval=cfg.get_path("training.checkpoint_interval",
                                         1000),
        log_interval=cfg.get_path("training.log_interval", 100),
        policy=policy,
        metric_writer=lambda m, s: metrics.log(m, step=s))

    # ---- dataset + device-batch assembly ------------------------------------
    frame_size = tuple(cfg.get_path("data.frame_size", (256, 256)))
    # pose heatmaps at pixel/4 = 2x latent resolution (the guider
    # downsamples 4x to one cell per (1,2,2) patch, omni/model.py)
    heatmap_size = tuple(cfg.get_path(
        "data.heatmap_size", (frame_size[0] // 4, frame_size[1] // 4)))
    pixel_frames = ocfg.num_frames * 4 - 3

    def encode_pixels(px):
        return vae_encode_jit(vae_params, jnp.asarray(px), cfg=vae_cfg,
                              streaming=True)

    def factory(stage_idx):
        ds = OmniHumanDataset(
            data_dir, condition_ratios=stages[stage_idx].condition_ratios,
            num_frames=pixel_frames, frame_size=frame_size,
            num_keypoints=ocfg.num_keypoints, heatmap_size=heatmap_size,
            audio_dim=ocfg.audio_dim,
            fps=cfg.get_path("data.fps", 16.0), tracker=tracker)

        def it():
            bs = cfg.get_path("training.batch_size", 1)
            for batch in ds.batches(bs):
                samples = batch["samples"]
                lat = encode_pixels(batch["frames"])
                refs = np.stack([s["conditions"]["reference"]
                                 for s in samples])           # [B,3,1,H,W]
                out = {
                    "frames": lat,
                    "context": text_encoder(
                        [s["conditions"]["text"] for s in samples]),
                    "reference": encode_pixels(refs),
                }
                if all("audio" in s["conditions"] for s in samples):
                    out["audio"] = jnp.asarray(np.stack(
                        [s["conditions"]["audio"] for s in samples]))
                if all("pose" in s["conditions"] for s in samples):
                    # [K, T_pixel, h, w] → latent frame rate (stride 4,
                    # matching the VAE's temporal compression). bf16: the
                    # [0,1] Gaussian heatmaps don't need fp32, and at 308
                    # keypoints × full spatial res the fp32 tensor alone
                    # is ~6.4 GiB at 480p·81f (the omni-14B AOT OOM).
                    out["pose"] = jnp.asarray(np.stack(
                        [s["conditions"]["pose"][:, ::4][:, :ocfg.num_frames]
                         for s in samples]), jnp.bfloat16)
                yield out

        return it()

    trainer.train(factory, resume=args.resume)
    trainer.ckpt.wait()
    tracker.save_summary()
    metrics.finish()
    logger.info("training complete")


if __name__ == "__main__":
    main()
