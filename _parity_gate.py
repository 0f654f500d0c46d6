"""The weights-day parity gate (VERDICT r3 item 10).

Given a directory of REAL released Wan torch checkpoints, this runs the
whole conversion + numerical-parity chain end-to-end and enforces the
BASELINE.json north-star gate: per-frame latent MSE <= 1e-2 vs the
PyTorch reference (the actual /root/reference modules, exec'd read-only
via tests/ref_compat.py — nothing copied).

Stages (each prints PASS/FAIL):
  1. convert the DiT safetensors (+ VAE .pth when present);
  2. fp32 forward parity: reference WanModel.forward vs
     wan_model_forward on the SAME converted weights at the target
     latent geometry (one denoise step, t=999);
  3. one-step latent gate: x0 = z - v per-frame MSE <= 1e-2;
  4. VAE decode parity on the converted VAE (when present).

Without weights the gate SKIPS (exit 0) so it can sit in CI until the
day weights appear. Usage: scripts/parity_gate.sh <ckpt_dir> [task].
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))


def main(argv=None):
    p = argparse.ArgumentParser("parity-gate")
    p.add_argument("ckpt_dir")
    p.add_argument("--task", default="t2v-1.3B")
    p.add_argument("--frames", type=int, default=1,
                   help="latent frames for the gate forward (1 keeps the "
                        "torch-CPU reference tractable; widths are real)")
    p.add_argument("--latent_hw", default="60*104",
                   help="latent H*W of the gate forward (default: the "
                        "repo's 480x832 target geometry)")
    p.add_argument("--mse_gate", type=float, default=1e-2)
    args = p.parse_args(argv)

    if not os.path.isdir(args.ckpt_dir) or not any(
            f.endswith(".safetensors") for f in os.listdir(args.ckpt_dir)):
        print(f"parity_gate: SKIP — no *.safetensors DiT shards in "
              f"{args.ckpt_dir} (gate is armed and waiting for weights)")
        return 0

    import numpy as np
    import torch
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")   # fp32 golden path

    from omnihuman_tpu.configs import WAN_CONFIGS
    from omnihuman_tpu.configs.wan import DTypePolicy
    from omnihuman_tpu.models.wan_dit import wan_model_forward
    from omnihuman_tpu.models.vae import vae_decode
    from omnihuman_tpu.ops.rope import rope_angles_3d
    from omnihuman_tpu.utils import convert
    from ref_compat import load_reference

    cfg = WAN_CONFIGS[args.task]
    mc = cfg.model
    ok = True

    # ---- 1. conversion -----------------------------------------------------
    sd = {}
    for fn in sorted(os.listdir(args.ckpt_dir)):
        if fn.endswith(".safetensors"):
            sd.update(convert.load_torch_state_dict(
                os.path.join(args.ckpt_dir, fn)))
    params = convert.convert_wan_dit(sd, mc)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"parity_gate: converted DiT ({n/1e9:.2f}B params) PASS")

    # ---- 2. reference forward on the SAME weights ---------------------------
    _, ref_model, ref_vae_mod = load_reference()
    ref = ref_model.WanModel(
        model_type="t2v", dim=mc.dim, ffn_dim=mc.ffn_dim,
        num_heads=mc.num_heads, num_layers=mc.num_layers,
        freq_dim=mc.freq_dim, text_dim=mc.text_dim, text_len=mc.text_len,
        in_dim=16, out_dim=16, patch_size=tuple(mc.patch_size),
        use_checkpoint=False).eval().float()
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    if missing:
        print(f"parity_gate: reference load missing keys: {missing[:5]} "
              "FAIL")
        ok = False

    f = args.frames
    h, w = (int(v) for v in args.latent_hw.replace("x", "*").split("*"))
    grid = (f, h // mc.patch_size[1], w // mc.patch_size[2])
    seq_len = grid[0] * grid[1] * grid[2]
    g = np.random.default_rng(0)
    x = g.normal(size=(1, 16, f, h, w)).astype(np.float32)
    ctx = (g.normal(size=(1, mc.text_len, mc.text_dim)) * 0.2
           ).astype(np.float32)
    t = np.asarray([999.0], np.float32)

    with torch.no_grad():
        want = ref(
            [torch.from_numpy(x[0])], torch.from_numpy(t),
            [torch.from_numpy(ctx[0])], seq_len)[0].numpy()

    sin, cos = rope_angles_3d(grid, mc.head_dim, seq_len=seq_len)
    got = np.asarray(wan_model_forward(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg=mc,
        seq_len=seq_len, rope_sin=sin, rope_cos=cos, remat=False,
        policy=DTypePolicy(compute=jnp.float32)))

    v_mse = float(np.mean((got[0] - want) ** 2))
    print(f"parity_gate: velocity MSE {v_mse:.3e} "
          f"{'PASS' if v_mse <= args.mse_gate else 'FAIL'}")
    ok &= v_mse <= args.mse_gate

    # ---- 3. one-step latent gate (x0 = z - v, wan_inference.py:186) --------
    lat_mse = float(np.mean(((x[0] - got[0]) - (x[0] - want)) ** 2,
                            axis=(0, 2, 3)).max())
    print(f"parity_gate: per-frame one-step latent MSE {lat_mse:.3e} "
          f"(gate {args.mse_gate}) "
          f"{'PASS' if lat_mse <= args.mse_gate else 'FAIL'}")
    ok &= lat_mse <= args.mse_gate

    # ---- 4. VAE (optional) ---------------------------------------------------
    vae_path = os.path.join(args.ckpt_dir, "Wan2.1_VAE.pth")
    if os.path.exists(vae_path):
        vsd = convert.load_torch_state_dict(vae_path)
        vparams = convert.convert_vae(vsd, cfg.vae)
        z = g.normal(size=(1, 16, 2, 8, 8)).astype(np.float32)
        ours = np.asarray(vae_decode(vparams, jnp.asarray(z), cfg.vae,
                                     streaming=True, clamp=False))
        tv = ref_vae_mod.WanVAE_(
            dim=cfg.vae.base_dim, z_dim=cfg.vae.z_dim,
            dim_mult=list(cfg.vae.dim_mult),
            num_res_blocks=cfg.vae.num_res_blocks,
            temperal_downsample=list(cfg.vae.temporal_downsample)
        ).eval().float()
        tv.load_state_dict({k.replace("module.", ""):
                            torch.as_tensor(np.asarray(v))
                            for k, v in vsd.items()}, strict=False)
        mean = torch.as_tensor(np.asarray(cfg.vae.latent_mean))
        std = torch.as_tensor(np.asarray(cfg.vae.latent_std))
        with torch.no_grad():
            zt = torch.from_numpy(z) * std.view(1, -1, 1, 1, 1) \
                + mean.view(1, -1, 1, 1, 1)
            tv.clear_cache()
            ref_out = tv.decode(zt).numpy()
        vae_mse = float(np.mean((ours - ref_out) ** 2))
        print(f"parity_gate: VAE decode MSE {vae_mse:.3e} "
              f"{'PASS' if vae_mse <= args.mse_gate else 'FAIL'}")
        ok &= vae_mse <= args.mse_gate
    else:
        print("parity_gate: no Wan2.1_VAE.pth — VAE stage skipped")

    print(f"parity_gate: {'ALL PASS' if ok else 'FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
