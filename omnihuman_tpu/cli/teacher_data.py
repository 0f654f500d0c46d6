"""Teacher-data generation CLI (reference seaweed_apt/generate.py mode)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("omnihuman-tpu teacher-data")
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--num_samples", type=int, default=100)
    p.add_argument("--size", default="480*832")
    p.add_argument("--base_seed", type=int, default=0)
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--out_dir", default=".")
    args = p.parse_args(argv)

    import sys
    from omnihuman_tpu.apt.generate import generate_batch
    from omnihuman_tpu.configs import SIZE_CONFIGS, WAN_CONFIGS
    from omnihuman_tpu.pipelines.text2video import WanT2V

    if args.size not in SIZE_CONFIGS:
        sys.exit(f"unknown size {args.size!r}; choose from "
                 f"{list(SIZE_CONFIGS)}")
    pipe = WanT2V(WAN_CONFIGS[args.task], checkpoint_dir=args.checkpoint_dir)
    data = generate_batch(
        pipe, num_samples=args.num_samples,
        size=SIZE_CONFIGS[args.size], base_seed=args.base_seed,
        cfg_scale=args.cfg_scale, out_dir=args.out_dir)
    print({k: getattr(v, "shape", len(v)) for k, v in data.items()})


if __name__ == "__main__":
    main()
