"""f-divergence one-step distillation CLI.

Capability parity with reference seaweed_apt/f_distilled_trainer.py:353-444
(__main__) + ":140-330" (`train_consistency_distillation` loop):
  - selectable f-divergence (reverse-kl / forward-kl / jensen-shannon /
    squared-hellinger / softened-rkl), alpha/beta loss weights,
    --use_discriminator toggle and its own LR (":370-385"),
  - live teacher CFG velocity every step (teacher params stay resident),
  - epoch loop over the noise/context dataset, checkpoints every
    --save_interval steps + per-epoch + final (":300-345"),
  - metrics per step (wandb when available, JSONL fallback).

TPU-first: one jitted step updates D and the student together (teacher
CFG, D update, density-ratio weighting, student update in a single
compiled graph — the reference pays three separate forward passes plus
host sync between D and G optimizers).
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("omnihuman-tpu train-f-distill")
    p.add_argument("--config", default=None, help="optional YAML")
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--checkpoint_dir", default=None,
                   help="converted Wan weights for the teacher "
                        "(None = random init)")
    p.add_argument("--data_path", default="dummy_data_480x832.npz")
    p.add_argument("--output_dir", default="checkpoints/f_distill")
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--discriminator_lr", type=float, default=1e-5)
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--save_interval", type=int, default=10)
    p.add_argument("--f_divergence", default="jensen-shannon",
                   choices=["reverse-kl", "forward-kl", "jensen-shannon",
                            "squared-hellinger", "softened-rkl"])
    p.add_argument("--use_discriminator", type=lambda s: s.lower() != "false",
                   default=True)
    p.add_argument("--alpha", type=float, default=0.1,
                   help="GAN loss weight")
    p.add_argument("--beta", type=float, default=0.9,
                   help="f-divergence loss weight")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--wandb_project", default="wan-f-distillation")
    p.add_argument("--wandb_run_name", default=None)
    from omnihuman_tpu.parallel.train_mesh import add_mesh_args
    add_mesh_args(p)
    args = p.parse_args(argv)

    if args.config:
        from omnihuman_tpu.utils.config_io import load_yaml, merge_args
        merge_args(load_yaml(args.config), args)

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from omnihuman_tpu.apt.f_distill import (
        default_feature_fn, f_distill_train_step, init_f_distill_state,
        init_mlp_discriminator)
    from omnihuman_tpu.apt.generate import create_dataloader, load_teacher_data
    from omnihuman_tpu.configs import WAN_CONFIGS
    from omnihuman_tpu.ops.rope import rope_angles_3d
    from omnihuman_tpu.pipelines.text2video import WanT2V
    from omnihuman_tpu.utils.checkpoint import CheckpointManager
    from omnihuman_tpu.utils.logging import MetricsLogger, logger

    cfg = WAN_CONFIGS[args.task]
    from omnihuman_tpu.parallel.train_mesh import TrainMeshPlan
    plan = TrainMeshPlan.from_sizes(args.fsdp_size, args.sp_size)
    plan.check_batch(args.batch_size)
    logger.info(f"training plan: {plan.describe()}")
    pipe = WanT2V(cfg, checkpoint_dir=args.checkpoint_dir, mesh=plan.mesh)
    data = load_teacher_data(args.data_path)
    dl = create_dataloader(data, batch_size=args.batch_size,
                           seed=args.seed)
    neg_ctx = jnp.asarray(np.broadcast_to(
        data["negative_context"][None],
        (args.batch_size,) + data["negative_context"].shape))

    c, f, h, w = data["noise"].shape[1:]
    pt, ph, pw = cfg.model.patch_size
    grid = (f // pt if pt > 1 else f, h // ph, w // pw)
    seq_len = plan.seq_len(grid[0] * grid[1] * grid[2])
    sin, cos = rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len)

    optimizer = optax.adamw(args.learning_rate, weight_decay=0.01)
    d_optimizer = optax.adam(args.discriminator_lr)
    student = jax.tree.map(jnp.copy, pipe.params)
    # velocity-feature width: the reference's fixed 512 slice
    # (f_distilled_trainer.py:217-218), clamped for small latents
    feat_dim = min(512, int(np.prod(data["noise"].shape[1:])))
    d_params = init_mlp_discriminator(jax.random.key(args.seed),
                                      in_dim=feat_dim)
    state = plan.shard_tree(
        init_f_distill_state(student, d_params, optimizer, d_optimizer))

    ckpt = CheckpointManager(args.output_dir)
    start_step = 0
    if args.resume:
        restored = ckpt.restore(target=state)
        if restored is not None:
            state = restored
            start_step = int(state.step)
            logger.info(f"resumed at step {start_step}")

    metrics_log = MetricsLogger(
        project=args.wandb_project, run_name=args.wandb_run_name,
        out_dir=args.output_dir,
        config={"f_divergence": args.f_divergence, "alpha": args.alpha,
                "beta": args.beta, "lr": args.learning_rate})

    step_fn = jax.jit(functools.partial(
        f_distill_train_step, optimizer=optimizer, d_optimizer=d_optimizer,
        cfg=cfg.model, seq_len=seq_len, rope_sin=sin, rope_cos=cos,
        policy=cfg.policy, f_divergence=args.f_divergence,
        cfg_scale=args.cfg_scale, alpha=args.alpha, beta=args.beta,
        use_discriminator=args.use_discriminator,
        t_max=float(cfg.num_train_timesteps),
        feature_fn=functools.partial(default_feature_fn, dim=feat_dim),
        attn_impl=plan.attn_impl, token_sharding=plan.token_sharding),
        donate_argnums=(0,))

    step = start_step
    steps_per_epoch = max(1, data["noise"].shape[0] // args.batch_size)
    start_epoch = start_step // steps_per_epoch
    # mid-epoch resume: skip the batches the checkpointed epoch already
    # consumed, so the total step count matches an uninterrupted run and
    # no sample is trained twice within the epoch. The dataloader RNG is
    # fast-forwarded by start_epoch permutations so the resumed epoch
    # replays the interrupted epoch's exact shuffle.
    skip_in_epoch = start_step - start_epoch * steps_per_epoch
    if start_epoch:
        dl = create_dataloader(data, batch_size=args.batch_size,
                               seed=args.seed, skip_epochs=start_epoch)
    for epoch in range(start_epoch, args.num_epochs):
        for i, batch in enumerate(dl()):
            if epoch == start_epoch and i < skip_in_epoch:
                continue
            batch = {"noise": batch["noise"], "context": batch["context"],
                     "context_null": neg_ctx[:batch["noise"].shape[0]]}
            with plan.mesh_context():
                state, m = step_fn(state, pipe.params,
                                   plan.put_batch(batch))
            step += 1
            if step % 5 == 0 or step == start_step + 1:
                rec = {k: float(v) for k, v in m.items()}
                metrics_log.log(rec, step=step)
                logger.info(
                    f"epoch {epoch} step {step} loss {rec['loss']:.5f} "
                    f"f_div {rec['f_div_loss']:.5f} d {rec['d_loss']:.5f} "
                    f"ratio {rec['density_ratio_mean']:.3f}")
            if step % args.save_interval == 0:
                ckpt.save(step, state, metadata={"epoch": epoch})
        if step % args.save_interval != 0:
            ckpt.save(step, state, metadata={"epoch": epoch, "final":
                                             epoch == args.num_epochs - 1})
    ckpt.wait()
    metrics_log.finish()
    logger.info(f"f-distill complete: {step} steps → {args.output_dir}")


if __name__ == "__main__":
    main()
