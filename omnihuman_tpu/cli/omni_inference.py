"""OmniHuman inference CLI.

Capability parity with reference Omnihuman/inference.py:13-247 — which
imports a module that does not exist in the reference repo (SURVEY §2.8:
`from omnihuman import OmniHumanSeaweedWan`); this is the WORKING version
of that intent: audio features from a wav (log-mel, wav2vec hook),
keypoint heatmaps via the pluggable processor, reference image
conditioning, omni DiT sampling, video save.
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("omnihuman-tpu omni-inference")
    p.add_argument("--reference_image", required=True)
    p.add_argument("--audio", default=None, help="wav file")
    p.add_argument("--pose_video", default=None,
                   help="driving video for pose heatmaps")
    p.add_argument("--prompt", default="a person talking")
    p.add_argument("--checkpoint", default=None, help="orbax state dir")
    p.add_argument("--num_frames", type=int, default=8,
                   help="latent frames")
    p.add_argument("--latent_size", type=int, nargs=2, default=(8, 8))
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", default="omnihuman_output.mp4")
    p.add_argument("--model_dim", type=int, default=64)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from omnihuman_tpu.configs.wan import (DTypePolicy, VAEConfig,
                                           WanModelConfig)
    from omnihuman_tpu.models.vae import init_vae, vae_decode, vae_encode
    from omnihuman_tpu.omni.dataset import AudioFeatureExtractor, read_wav
    from omnihuman_tpu.omni.model import (
        OmniModelConfig, init_omni_model, omni_model_forward)
    from omnihuman_tpu.samplers.fm_solvers import FlowDPMSolver
    from omnihuman_tpu.utils.logging import logger
    from omnihuman_tpu.utils.media import cache_video

    base = WanModelConfig(dim=args.model_dim, ffn_dim=args.model_dim * 2,
                          num_heads=4, num_layers=2, freq_dim=32,
                          text_dim=32, text_len=16)
    ocfg = OmniModelConfig(base=base, audio_dim=64,
                           num_frames=args.num_frames)
    vcfg = VAEConfig(base_dim=8, z_dim=16, dim_mult=(1, 1, 1, 1),
                     num_res_blocks=1,
                     temporal_downsample=(False, True, True))
    policy = DTypePolicy(compute=jnp.float32)

    params = init_omni_model(jax.random.key(0), ocfg)
    vae_params = init_vae(jax.random.key(1), vcfg)
    if args.checkpoint:
        from omnihuman_tpu.utils.checkpoint import CheckpointManager
        restored = CheckpointManager(args.checkpoint).restore(target=params)
        if restored is not None:
            params = restored

    h_lat, w_lat = args.latent_size
    f_lat = args.num_frames

    # reference image → VAE latent (omni ref conditioning)
    img = Image.open(args.reference_image).convert("RGB")
    img = img.resize((w_lat * 8, h_lat * 8))
    ref = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0
                      ).transpose(2, 0, 1)[None, :, None]
    ref_lat = vae_encode(vae_params, ref, vcfg, streaming=True)

    # audio features (inference.py:29-56 used a librosa-mel placeholder;
    # ours are the dataset's real log-mel features)
    audio = None
    if args.audio:
        waveform, sr = read_wav(args.audio)
        ext = AudioFeatureExtractor(dim=ocfg.audio_dim)
        audio = jnp.asarray(ext(waveform, sr, f_lat))[None]

    # pose heatmaps from a driving video (inference.py:58-126)
    pose = None
    if args.pose_video:
        from omnihuman_tpu.omni.keypoints import SapiensKeypointProcessor
        from omnihuman_tpu import native
        import cv2
        kp_proc = SapiensKeypointProcessor()
        cap = cv2.VideoCapture(args.pose_video)
        kps = []
        for _ in range(f_lat):
            ok, frame = cap.read()
            if not ok:
                break
            k = kp_proc.extract_keypoints(
                cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            kps.append(k if k is not None
                       else np.zeros((ocfg.num_keypoints, 3), np.float32))
        cap.release()
        while len(kps) < f_lat:
            kps.append(kps[-1] if kps
                       else np.zeros((ocfg.num_keypoints, 3), np.float32))
        hm = native.gaussian_heatmaps(np.stack(kps),
                                      (h_lat * 2 * 2, w_lat * 2 * 2))
        pose = jnp.asarray(hm.transpose(1, 0, 2, 3))[None]

    ctx = jnp.zeros((1, base.text_len, base.text_dim), jnp.float32)
    noise = jax.random.normal(jax.random.key(args.seed),
                              (1, 16, f_lat, h_lat, w_lat), jnp.float32)

    sol = FlowDPMSolver(steps=args.num_inference_steps, shift=1.0)

    def model_fn(x, t, i):
        # CFG annealing (omnihuman_wan_t2v.py:432-438):
        # cfg_t = cfg*(1-progress) + progress
        progress = i / args.num_inference_steps
        cfg_t = args.cfg_scale * (1.0 - progress) + progress
        tb = jnp.full((1,), t, jnp.float32)
        v_c = omni_model_forward(params, x, tb, ctx, cfg=ocfg, audio=audio,
                                 pose=pose, ref_latent=ref_lat,
                                 policy=policy, remat=False)
        v_u = omni_model_forward(params, x, tb, ctx, cfg=ocfg,
                                 policy=policy, remat=False)
        return v_u + cfg_t * (v_c - v_u)

    latents = jax.jit(lambda z: sol.sample_loop(model_fn, z))(noise)
    video = vae_decode(vae_params, latents, vcfg, streaming=True)
    path = cache_video(np.asarray(video[0]), args.output, fps=16)
    logger.info(f"saved {path}")
    return path


if __name__ == "__main__":
    main()
