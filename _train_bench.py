"""On-chip distill-training benchmark (VERDICT r4 item 1).

Measures the jitted stage-1 consistency-distillation train step
(fwd + bwd + AdamW + on-device EMA, apt/distill.py) on the real TPU at
the flagship Wan-1.3B geometry, and optionally runs a ~100-step
synthetic-teacher training loop logging a decaying loss via
MetricsLogger — the reference's core loop
(seaweed_apt/distilled_trainer.py:241-316) exercised on silicon.

Usage:
  python _train_bench.py --frames 81 --remat_group 6   # step timing
  python _train_bench.py --frames 1 --train_steps 100  # loss-decay run

All tensors are created ON DEVICE under jit (host->device transfers
through the tunnel take minutes at GB scale; CLAUDE.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("_train_bench")
    p.add_argument("--frames", type=int, default=81,
                   help="pixel frames (81 -> 21 latent frames, 32760 tok; "
                        "1 -> the reference's own distill geometry, "
                        "seq 1560)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--remat_group", type=int, default=6)
    p.add_argument("--train_steps", type=int, default=0,
                   help="run a synthetic-teacher training loop this many "
                        "steps and log the loss curve")
    p.add_argument("--n_samples", type=int, default=8,
                   help="distinct synthetic teacher samples cycled during "
                        "--train_steps")
    p.add_argument("--out", default=None, help="write JSON here too")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import functools

    from omnihuman_tpu.apt.distill import (
        distill_train_step, init_distill_state, make_optimizer)
    from omnihuman_tpu.configs import WAN_CONFIGS
    from omnihuman_tpu.models.wan_dit import init_wan_model
    from omnihuman_tpu.ops.rope import rope_angles_3d
    from omnihuman_tpu.parallel.train_mesh import resolve_remat

    cfg = WAN_CONFIGS["t2v-1.3B"]
    f_lat = (args.frames - 1) // cfg.vae_stride[0] + 1
    h, w = 60, 104                       # 480x832 latents
    grid = (f_lat, h // 2, w // 2)
    n_tokens = grid[0] * grid[1] * grid[2]
    align = 1024 if n_tokens >= 4096 else 1
    seq_len = -(-n_tokens // align) * align
    remat = resolve_remat(args.remat_group, cfg.model.num_layers)

    opt = make_optimizer()               # AdamW 5e-6, clip 1.0 (reference)
    init = jax.jit(lambda k: init_distill_state(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                     init_wan_model(k, cfg.model)), opt))
    state = init(jax.random.key(0))
    jax.block_until_ready(state.params)
    sin, cos = rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len)

    b = args.batch
    lat = (b, cfg.vae.z_dim, f_lat, h, w)

    # teacher CFG velocity target: v = eps - x0 under flow matching, so
    # the regression is learnable and sample-dependent
    @jax.jit
    def make_sample(key):
        kn, kc, kv = jax.random.split(key, 3)
        noise = jax.random.normal(kn, lat, jnp.float32)
        x0 = 0.5 * jax.random.normal(kv, lat, jnp.float32)
        return {"noise": noise,
                "context": 0.1 * jax.random.normal(
                    kc, (b, cfg.text_len, cfg.t5.dim), jnp.bfloat16),
                "v_teacher": noise - x0}

    step_fn = jax.jit(functools.partial(
        distill_train_step, optimizer=opt, cfg=cfg.model, seq_len=seq_len,
        rope_sin=sin, rope_cos=cos, policy=cfg.policy, remat=remat),
        donate_argnums=(0,))

    batch = make_sample(jax.random.key(1))
    jax.block_until_ready(batch)

    t0 = time.perf_counter()
    state, m = step_fn(state, batch)
    first_loss = float(m["loss"])        # honest sync (scalar fetch)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, m = step_fn(state, batch)
        _ = float(m["loss"])
        times.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(times, 50))

    out = {
        "distill_step_ms": round(p50, 1),
        "frames": args.frames,
        "latent": list(lat),
        "n_tokens": n_tokens,
        "seq_len": seq_len,
        "batch": b,
        "remat_group": args.remat_group,
        "train_tokens_per_sec": round(b * n_tokens / (p50 / 1e3), 1),
        "compile_or_warmup_s": round(compile_s, 1),
        "first_loss": round(first_loss, 4),
        "times_ms": [round(t, 1) for t in times],
    }

    if args.train_steps:
        from omnihuman_tpu.utils.logging import MetricsLogger
        ml = MetricsLogger(run_name="train_bench",
                           out_dir="checkpoints/train_bench")
        samples = [make_sample(jax.random.key(100 + i))
                   for i in range(args.n_samples)]
        jax.block_until_ready(samples)
        losses = []
        t0 = time.perf_counter()
        for i in range(args.train_steps):
            state, m = step_fn(state, samples[i % args.n_samples])
            loss = float(m["loss"])
            losses.append(loss)
            ml.log({"loss": loss, "grad_norm": float(m["grad_norm"])},
                   step=i)
        wall = time.perf_counter() - t0
        k = max(1, args.n_samples)
        out["train_steps"] = args.train_steps
        out["loss_first_epoch_mean"] = round(float(np.mean(losses[:k])), 4)
        out["loss_last_epoch_mean"] = round(float(np.mean(losses[-k:])), 4)
        out["loss_decayed"] = bool(np.mean(losses[-k:])
                                   < np.mean(losses[:k]))
        out["train_wall_s"] = round(wall, 1)
        out["losses_every_10"] = [round(v, 4) for v in losses[::10]]

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
