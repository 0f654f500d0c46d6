"""Torch-checkpoint → PyTree conversion CLI.

Converts the reference's torch/safetensors checkpoints (diffusers-format
Wan DiT shards, Wan2.1_VAE.pth, umt5 encoder .pth, CLIP .pth) into orbax
checkpoints loadable by the pipelines — the offline half of
`WanT2V(checkpoint_dir=...)`.
"""

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser("omnihuman-tpu convert-checkpoint")
    p.add_argument("--src", required=True,
                   help="reference checkpoint dir (torch/safetensors)")
    p.add_argument("--dst", required=True, help="output orbax dir")
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--components", nargs="+",
                   default=("dit", "vae", "t5"),
                   choices=("dit", "vae", "t5", "clip"))
    p.add_argument("--dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from omnihuman_tpu.configs import WAN_CONFIGS
    from omnihuman_tpu.utils import convert
    from omnihuman_tpu.utils.checkpoint import CheckpointManager
    from omnihuman_tpu.utils.logging import logger

    cfg = WAN_CONFIGS[args.task]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cast = lambda t: jax.tree.map(lambda x: x.astype(dtype), t)
    out = {}

    if "dit" in args.components:
        sd = {}
        for fn in sorted(os.listdir(args.src)):
            if fn.endswith(".safetensors"):
                sd.update(convert.load_torch_state_dict(
                    os.path.join(args.src, fn)))
        if not sd:   # single-file .pt fallback (distilled/EMA students)
            for fn in sorted(os.listdir(args.src)):
                if fn.endswith((".pt", ".pth")) and "dit" in fn.lower():
                    sd = convert.load_torch_state_dict(
                        os.path.join(args.src, fn))
                    break
        if sd:
            out["dit"] = cast(convert.convert_wan_dit(sd, cfg.model))
            logger.info("converted DiT")
    if "vae" in args.components:
        path = os.path.join(args.src, "Wan2.1_VAE.pth")
        if os.path.exists(path):
            out["vae"] = cast(convert.convert_vae(
                convert.load_torch_state_dict(path), cfg.vae))
            logger.info("converted VAE")
    if "t5" in args.components:
        path = os.path.join(args.src, "models_t5_umt5-xxl-enc-bf16.pth")
        if os.path.exists(path):
            out["t5"] = cast(convert.convert_t5(
                convert.load_torch_state_dict(path), cfg.t5))
            logger.info("converted umT5")
    if "clip" in args.components and cfg.clip is not None:
        for fn in os.listdir(args.src):
            if "clip" in fn.lower() and fn.endswith((".pth", ".pt")):
                out["clip"] = cast(convert.convert_clip(
                    convert.load_torch_state_dict(
                        os.path.join(args.src, fn)), cfg.clip))
                logger.info("converted CLIP")
                break

    if not out:
        raise SystemExit(f"no convertible checkpoints found in {args.src}")
    mgr = CheckpointManager(args.dst, async_save=False)
    mgr.save(0, out)
    mgr.wait()
    logger.info(f"saved converted components {sorted(out)} → {args.dst}")


if __name__ == "__main__":
    main()
