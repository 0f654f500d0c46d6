"""Consistency-distillation training CLI (reference distilled_trainer.py
__main__, :351-415). YAML fills unset flags (utils/config_io.merge_args)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("omnihuman-tpu train-distill")
    p.add_argument("--config", default=None, help="optional YAML")
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--data_path", default="dummy_data_480x832.npz")
    p.add_argument("--output_dir", default="checkpoints/distill")
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--ema_decay", type=float, default=None)
    p.add_argument("--save_interval", type=int, default=None)
    from omnihuman_tpu.parallel.train_mesh import add_mesh_args
    add_mesh_args(p)
    args = p.parse_args(argv)

    if args.config:
        from omnihuman_tpu.utils.config_io import load_yaml, merge_args
        merge_args(load_yaml(args.config), args)
    lr = args.learning_rate or 5e-6
    epochs = args.num_epochs or 10
    bsz = args.batch_size or 1
    ema_decay = args.ema_decay or 0.995
    save_interval = args.save_interval or 100

    import functools
    import jax
    import numpy as np
    from omnihuman_tpu.apt.distill import (
        distill_train_step, init_distill_state, make_optimizer)
    from omnihuman_tpu.apt.generate import create_dataloader, load_teacher_data
    from omnihuman_tpu.configs import WAN_CONFIGS
    from omnihuman_tpu.ops.rope import rope_angles_3d
    from omnihuman_tpu.pipelines.text2video import WanT2V
    from omnihuman_tpu.utils.checkpoint import CheckpointManager
    from omnihuman_tpu.utils.logging import logger

    cfg = WAN_CONFIGS[args.task]
    from omnihuman_tpu.parallel.train_mesh import (
        TrainMeshPlan, resolve_remat)
    plan = TrainMeshPlan.from_sizes(args.fsdp_size, args.sp_size)
    plan.check_batch(bsz)
    logger.info(f"training plan: {plan.describe()}")
    pipe = WanT2V(cfg, checkpoint_dir=args.checkpoint_dir, mesh=plan.mesh)
    data = load_teacher_data(args.data_path)
    dl = create_dataloader(data, batch_size=bsz)

    c, f, h, w = data["noise"].shape[1:]
    grid = (f // cfg.model.patch_size[0], h // cfg.model.patch_size[1],
            w // cfg.model.patch_size[2])
    seq_len = plan.seq_len(grid[0] * grid[1] * grid[2])
    sin, cos = rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len)

    opt = make_optimizer(lr=lr)
    state = plan.shard_tree(init_distill_state(pipe.params, opt))
    ckpt = CheckpointManager(args.output_dir)
    step_fn = jax.jit(functools.partial(
        distill_train_step, optimizer=opt, cfg=cfg.model, seq_len=seq_len,
        rope_sin=sin, rope_cos=cos, policy=cfg.policy,
        ema_decay=ema_decay,
        remat=resolve_remat(args.remat_group, cfg.model.num_layers),
        attn_impl=plan.attn_impl,
        token_sharding=plan.token_sharding), donate_argnums=(0,))

    step = 0
    for epoch in range(epochs):
        for batch in dl():
            with plan.mesh_context():
                state, m = step_fn(state, plan.put_batch(batch))
            step += 1
            if step % 5 == 0:
                logger.info(f"epoch {epoch} step {step} "
                            f"loss {float(m['loss']):.5f}")
            if step % save_interval == 0:
                ckpt.save(step, state)
        ckpt.save(step, state, metadata={"epoch": epoch})
    ckpt.wait()
    logger.info(f"done: {step} steps")


if __name__ == "__main__":
    main()
