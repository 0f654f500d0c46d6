"""OmniHuman 3-stage training CLI (reference Omnihuman/omnihuman_trainer.py
main(), :496-542): YAML-driven, dataset + tracker + trainer."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("omnihuman-tpu train-omni")
    p.add_argument("--config", default="configs/omni_config.yaml")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--output_dir", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from omnihuman_tpu.configs.wan import WanModelConfig
    from omnihuman_tpu.omni.dataset import OmniHumanDataset
    from omnihuman_tpu.omni.model import OmniModelConfig, init_omni_model
    from omnihuman_tpu.omni.tracker import ProblematicVideoTracker
    from omnihuman_tpu.omni.trainer import (
        OmniHumanTrainer, StageConfig)
    from omnihuman_tpu.models.vae import init_vae, vae_encode_jit
    from omnihuman_tpu.utils.config_io import load_yaml, save_snapshot
    from omnihuman_tpu.utils.logging import logger

    cfg = load_yaml(args.config)
    data_dir = args.data_dir or cfg.get_path("data.data_dir", "data/videos")
    out_dir = args.output_dir or cfg.get_path("training.output_dir",
                                              "checkpoints/omni")
    save_snapshot(cfg, out_dir)

    mc = cfg.get_path("model", {})
    base = WanModelConfig(
        dim=mc.get("dim", 1536), ffn_dim=mc.get("ffn_dim", 8960),
        num_heads=mc.get("num_heads", 12),
        num_layers=mc.get("num_layers", 30),
        text_dim=mc.get("text_dim", 4096))
    ocfg = OmniModelConfig(
        base=base, audio_dim=mc.get("audio_dim", 1024),
        num_keypoints=mc.get("num_keypoints", 308),
        num_frames=mc.get("num_frames", 49))

    stages = tuple(
        StageConfig(s["name"], int(s["num_steps"]),
                    dict(s["condition_ratios"]))
        for s in cfg.get("stages", []))

    tracker = ProblematicVideoTracker(f"{out_dir}/bad_videos")
    params = init_omni_model(jax.random.key(0), ocfg)
    trainer = OmniHumanTrainer(
        params, ocfg, stages=stages,
        learning_rate=cfg.get_path("training.learning_rate", 1e-4),
        scheduler_type=cfg.get_path("training.scheduler_type", "cosine"),
        checkpoint_dir=out_dir,
        checkpoint_interval=cfg.get_path("training.checkpoint_interval",
                                         1000))

    # dataset + device-batch assembly (latents via VAE on the fly)
    from omnihuman_tpu.configs.wan import VAEConfig
    vae_params = init_vae(jax.random.key(1), VAEConfig())

    def factory(stage_idx):
        ds = OmniHumanDataset(
            data_dir, condition_ratios=stages[stage_idx].condition_ratios,
            num_frames=ocfg.num_frames * 4 - 3, tracker=tracker)

        def it():
            bs = cfg.get_path("training.batch_size", 1)
            for batch in ds.batches(bs):
                frames = jnp.asarray(batch["frames"])
                lat = vae_encode_jit(vae_params, frames, cfg=VAEConfig(),
                                     streaming=True)
                samples = batch["samples"]
                out = {"frames": lat,
                       "context": jnp.zeros((bs, base.text_len,
                                             base.text_dim))}
                if all("audio" in s["conditions"] for s in samples):
                    out["audio"] = jnp.asarray(np.stack(
                        [s["conditions"]["audio"] for s in samples]))
                yield out

        return it()

    trainer.train(factory)
    tracker.save_summary()
    logger.info("training complete")


if __name__ == "__main__":
    main()
