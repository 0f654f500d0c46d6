"""Stage-2 Seaweed-APT adversarial post-training CLI.

Capability parity with reference seaweed_apt/apt_trainer.py:379-489
(__main__) + ":96-342" (`train_seaweed_apt` orchestration):
  - two-phase schedule: image (350 updates) then video (300 updates) with
    fresh discriminator + G <- image-phase EMA handoff (":202-232"),
  - one D update + one G update per step (":113-157"),
  - checkpoint cadence every 50 updates + per-phase finals (":172-195"),
  - metrics each update (wandb when available, JSONL fallback),
  - optional pre-trained consistency model to boot the generator
    (":440-449" --consistency_path).

TPU-first: the phase loop drives two jitted, donated step functions; the
phase handoff is a PyTree copy; resume restores (step, phase) from
checkpoint metadata instead of the reference's filename convention.
"""

import argparse


def _build_batch(data, sel, rng, jnp):
    """GAN batch from the teacher artifact: real = teacher one-step x0
    (noise - v_teacher), fresh gaussian noise, positive contexts."""
    import numpy as np
    noise = rng.normal(size=data["noise"][sel].shape).astype(np.float32)
    return {
        "real": jnp.asarray(data["noise"][sel] - data["v_teacher"][sel]),
        "noise": jnp.asarray(noise),
        "context": jnp.asarray(data["positive_contexts"][sel]),
    }


def main(argv=None):
    p = argparse.ArgumentParser("omnihuman-tpu train-apt")
    p.add_argument("--config", default=None, help="optional YAML")
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--checkpoint_dir", default=None,
                   help="converted Wan weights (None = random init)")
    p.add_argument("--consistency_path", default=None,
                   help="distill checkpoint dir to boot the generator "
                        "(EMA stream); default = copy of the teacher")
    p.add_argument("--data_path", default="dummy_data_480x832.npz",
                   help="teacher npz for the image phase")
    p.add_argument("--video_data_path", default=None,
                   help="teacher npz for the video phase (defaults to "
                        "--data_path, like the reference's dummy loaders)")
    p.add_argument("--output_dir", default="checkpoints/apt")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--image_updates", type=int, default=None)
    p.add_argument("--video_updates", type=int, default=None)
    p.add_argument("--g_lr_image", type=float, default=None)
    p.add_argument("--d_lr_image", type=float, default=None)
    p.add_argument("--g_lr_video", type=float, default=None)
    p.add_argument("--d_lr_video", type=float, default=None)
    p.add_argument("--lambda_r1", type=float, default=None)
    p.add_argument("--ema_decay", type=float, default=None)
    p.add_argument("--save_interval", type=int, default=50)
    p.add_argument("--log_interval", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--wandb_project", default="seaweed-apt-stage2")
    p.add_argument("--wandb_run_name", default=None)
    p.add_argument("--grad_accumulation", type=int, default=1,
                   help="micro-batches accumulated per optimizer update "
                        "(optax.MultiSteps) — lets the effective batch "
                        "approach the paper's 9062/2048 recipe")
    from omnihuman_tpu.parallel.train_mesh import add_mesh_args
    add_mesh_args(p)
    args = p.parse_args(argv)

    if args.config:
        from omnihuman_tpu.utils.config_io import load_yaml, merge_args
        merge_args(load_yaml(args.config), args)

    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from omnihuman_tpu.apt.apt_trainer import (
        SeaweedAPTConfig, apt_d_step, apt_g_step, init_apt_state,
        make_d_optimizer, make_rmsprop, start_video_phase)
    from omnihuman_tpu.apt.distill import init_distill_state, make_optimizer
    from omnihuman_tpu.apt.generate import load_teacher_data
    from omnihuman_tpu.apt.model import init_apt_discriminator
    from omnihuman_tpu.configs import WAN_CONFIGS
    from omnihuman_tpu.ops.rope import rope_angles_3d
    from omnihuman_tpu.pipelines.text2video import WanT2V
    from omnihuman_tpu.utils.checkpoint import CheckpointManager
    from omnihuman_tpu.utils.logging import MetricsLogger, logger

    cfg = WAN_CONFIGS[args.task]
    apt_cfg = SeaweedAPTConfig(
        **{k: v for k, v in (
            ("image_updates", args.image_updates),
            ("video_updates", args.video_updates),
            ("g_lr_image", args.g_lr_image),
            ("d_lr_image", args.d_lr_image),
            ("g_lr_video", args.g_lr_video),
            ("d_lr_video", args.d_lr_video),
            ("lambda_r1", args.lambda_r1),
            ("ema_decay", args.ema_decay)) if v is not None})
    bsz = args.batch_size or 1
    accum = max(1, args.grad_accumulation)

    from omnihuman_tpu.parallel.train_mesh import (
        TrainMeshPlan, resolve_remat)
    plan = TrainMeshPlan.from_sizes(args.fsdp_size, args.sp_size)
    plan.check_batch(bsz)
    logger.info(f"training plan: {plan.describe()} "
                f"grad_accumulation={accum}")
    pipe = WanT2V(cfg, checkpoint_dir=args.checkpoint_dir, mesh=plan.mesh)

    # generator boot: pre-trained consistency EMA, else teacher copy
    # (apt_trainer.py:440-449)
    if args.consistency_path:
        opt = make_optimizer(lr=1e-5)
        target = init_distill_state(pipe.params, opt)
        ck = CheckpointManager(args.consistency_path)
        restored = ck.restore(target=target)
        if restored is None:
            raise SystemExit(
                f"no distill checkpoint found in {args.consistency_path}")
        g_params = restored.ema_params
        logger.info(f"generator <- consistency EMA @ step "
                    f"{int(restored.step)} ({args.consistency_path})")
    else:
        logger.info("no --consistency_path: generator <- teacher copy")
        g_params = jax.tree.map(jnp.copy, pipe.params)

    metrics_log = MetricsLogger(project=args.wandb_project,
                                run_name=args.wandb_run_name,
                                out_dir=args.output_dir,
                                config=dataclasses.asdict(apt_cfg))
    ckpt = CheckpointManager(args.output_dir)

    def phase_geometry(data):
        c, f, h, w = data["noise"].shape[1:]
        pt, ph, pw = cfg.model.patch_size
        grid = (f // pt if pt > 1 else f, h // ph, w // pw)
        seq_len = plan.seq_len(grid[0] * grid[1] * grid[2])
        sin, cos = rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len)
        return seq_len, sin, cos

    def make_steps(seq_len, sin, cos, video, g_lr, d_lr, d_params):
        g_opt = make_rmsprop(g_lr, accum)
        d_opt = make_d_optimizer(d_lr, d_params, accum)
        kw = dict(cfg=cfg.model, apt_cfg=apt_cfg, video=video,
                  seq_len=seq_len, rope_sin=sin, rope_cos=cos,
                  policy=cfg.policy, attn_impl=plan.attn_impl,
                  token_sharding=plan.token_sharding)
        d_fn = jax.jit(functools.partial(apt_d_step, d_optimizer=d_opt,
                                         **kw), donate_argnums=(0,))
        g_fn = jax.jit(functools.partial(
            apt_g_step, g_optimizer=g_opt,
            remat=resolve_remat(args.remat_group, cfg.model.num_layers),
            **kw), donate_argnums=(0,))
        return g_opt, d_opt, d_fn, g_fn

    def run_phase(state, data, *, start_update, num_updates, step_offset,
                  d_fn, g_fn, phase_name, key, rng):
        # step_offset keeps checkpoint indices globally unique across the
        # phase handoff (start_video_phase resets state.step to 0)
        n = data["noise"].shape[0]
        for update in range(start_update, num_updates):
            sel = rng.integers(0, n, size=bsz)
            batch = plan.put_batch(_build_batch(data, sel, rng, jnp))
            key, kd, kg = jax.random.split(key, 3)
            with plan.mesh_context():
                state, dm = d_fn(state, batch, kd)
                state, gm = g_fn(state, batch, kg)
            if (update + 1) % args.log_interval == 0:
                m = {"phase": 0.0 if phase_name == "image" else 1.0,
                     "d_loss": float(dm["d_loss"]),
                     "r1_loss": float(dm["r1_loss"]),
                     "g_loss": float(gm["g_loss"])}
                metrics_log.log(m, step=step_offset + update + 1)
                logger.info(f"[{phase_name}] update {update + 1}/"
                            f"{num_updates} g {m['g_loss']:.4f} "
                            f"d {m['d_loss']:.4f} r1 {m['r1_loss']:.4f}")
            # checkpoint every 50 updates (apt_trainer.py:172-184)
            if ((update + 1) % args.save_interval == 0
                    and (update + 1) < num_updates):
                ckpt.save(step_offset + update + 1, state,
                          metadata={"phase": phase_name, "update": update + 1})
        ckpt.save(step_offset + num_updates, state,
                  metadata={"phase": phase_name, "update": num_updates,
                            "final": True})
        return state, key

    # ---- resume bookkeeping -------------------------------------------------
    start_phase, start_update = "image", 0
    key = jax.random.key(args.seed)
    rng = np.random.default_rng(args.seed + 1)

    image_data = load_teacher_data(args.data_path)
    video_data = (load_teacher_data(args.video_data_path)
                  if args.video_data_path else image_data)
    img_geom = phase_geometry(image_data)
    vid_geom = phase_geometry(video_data)

    d_params = init_apt_discriminator(
        jax.random.fold_in(key, 1), pipe.params, cfg.model)
    state = plan.shard_tree(init_apt_state(
        g_params, d_params, apt_cfg.g_lr_image, apt_cfg.d_lr_image, accum))

    if args.resume:
        meta = ckpt.restore_metadata() or {}
        if not meta and ckpt.latest_step() is not None:
            # a checkpoint exists but its metadata is unreadable —
            # restarting from scratch here would silently discard it
            raise RuntimeError(
                f"--resume: checkpoint at step {ckpt.latest_step()} in "
                f"{args.output_dir} has no readable metadata; refusing to "
                "silently restart from scratch")
        if meta:
            ckpt_phase = meta.get("phase", "image")
            start_update = int(meta.get("update", 0))
            if ckpt_phase == "video":
                # match the video-phase tree before restoring into it
                state = start_video_phase(state, d_params, apt_cfg, accum)
            restored = ckpt.restore(target=state)
            if restored is None:
                raise RuntimeError(
                    f"--resume: state restore from {args.output_dir} "
                    "returned no payload (metadata present but the state "
                    "checkpoint is missing or corrupt)")
            state = restored
            start_phase = ckpt_phase
            if meta.get("final"):
                if ckpt_phase == "image":
                    # image phase done: perform the EMA handoff now
                    fresh_d = init_apt_discriminator(
                        jax.random.fold_in(key, 2), pipe.params, cfg.model)
                    state = plan.shard_tree(
                        start_video_phase(state, fresh_d, apt_cfg, accum))
                    start_phase, start_update = "video", 0
                else:
                    logger.info("training already complete")
                    metrics_log.finish()
                    return
            logger.info(f"resumed: phase {start_phase} "
                        f"update {start_update}")

    # ---- phase 1: image (apt_trainer.py:96-195) -----------------------------
    if start_phase == "image":
        _, _, d_fn, g_fn = make_steps(
            *img_geom, video=False, g_lr=apt_cfg.g_lr_image,
            d_lr=apt_cfg.d_lr_image, d_params=state.d_params)
        state, key = run_phase(
            state, image_data, start_update=start_update,
            num_updates=apt_cfg.image_updates, step_offset=0,
            d_fn=d_fn, g_fn=g_fn, phase_name="image", key=key, rng=rng)
        start_update = 0
        # phase handoff: G <- image EMA, fresh D (":202-232"). The frozen
        # backbone is taken from the live state: the jitted steps donate
        # their input state, so the original pipe.params buffers are gone.
        fresh_d = init_apt_discriminator(
            jax.random.fold_in(key, 2), state.d_params["backbone"],
            cfg.model)
        state = plan.shard_tree(
            start_video_phase(state, fresh_d, apt_cfg, accum))

    # ---- phase 2: video (apt_trainer.py:236-331) ----------------------------
    _, _, d_fn, g_fn = make_steps(
        *vid_geom, video=True, g_lr=apt_cfg.g_lr_video,
        d_lr=apt_cfg.d_lr_video, d_params=state.d_params)
    state, key = run_phase(
        state, video_data, start_update=start_update,
        num_updates=apt_cfg.video_updates,
        step_offset=apt_cfg.image_updates, d_fn=d_fn, g_fn=g_fn,
        phase_name="video", key=key, rng=rng)

    ckpt.wait()
    metrics_log.finish()
    logger.info(f"APT training complete; final EMA in step "
                f"{int(state.step)} checkpoint at {args.output_dir}")


if __name__ == "__main__":
    main()
