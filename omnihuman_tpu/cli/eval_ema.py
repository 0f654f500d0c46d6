"""EMA evaluation CLI (reference seaweed_apt/eval_ema.py)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("omnihuman-tpu eval-ema")
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--ema_checkpoint", default=None,
                   help="orbax dir of the distill state (EMA stream)")
    p.add_argument("--data_path", default="dummy_data_480x832.npz")
    p.add_argument("--num_samples", type=int, default=10)
    p.add_argument("--out_dir", default="eval_images")
    args = p.parse_args(argv)

    import jax
    from omnihuman_tpu.apt.eval_ema import evaluate_ema
    from omnihuman_tpu.configs import WAN_CONFIGS
    from omnihuman_tpu.pipelines.text2video import WanT2V
    from omnihuman_tpu.utils.checkpoint import CheckpointManager

    pipe = WanT2V(WAN_CONFIGS[args.task], checkpoint_dir=args.checkpoint_dir)
    if args.ema_checkpoint:
        from omnihuman_tpu.apt.distill import (
            init_distill_state, make_optimizer)
        state = init_distill_state(pipe.params, make_optimizer())
        state = CheckpointManager(args.ema_checkpoint).restore(target=state)
        pipe.params = state.ema_params
    metrics = evaluate_ema(pipe, args.data_path,
                           num_samples=args.num_samples,
                           out_dir=args.out_dir)
    print(metrics)


if __name__ == "__main__":
    main()
