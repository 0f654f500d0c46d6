"""Honest single-chip 50-step e2e measurement (upgrades the derived
number in bench extras to a measured one).

Runs the REAL pipeline path — WanT2V.generate with the UniPC solver,
host-looped CFG steps (the production default; single fused programs
over ~3 min trip the runtime watchdog) — at the flagship geometry
(t2v-1.3B, 480x832, 81 frames, 50 steps), then streaming VAE decode.
Random weights (no checkpoints in this image): latency is
weight-independent.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from omnihuman_tpu.pipelines.text2video import WanT2V

    from omnihuman_tpu.configs import WAN_CONFIGS

    t2v = WanT2V(WAN_CONFIGS["t2v-1.3B"], precision="fast")
    walls = []
    for i in range(2):                    # call 1 pays compiles; call 2
        t0 = time.perf_counter()          # is the warm serving number
        video = t2v.generate(
            "a red fox running through a snowy forest",
            size=(832, 480), frame_num=81, sampling_steps=50,
            guide_scale=6.0, seed=7 + i)
        np_video = np.asarray(video)      # decode fetch = honest sync
        walls.append(time.perf_counter() - t0)
    print(json.dumps({
        "e2e_50step_cold_ms": round(walls[0] * 1e3, 1),
        "e2e_50step_warm_ms": round(walls[-1] * 1e3, 1),
        "video_shape": list(np_video.shape),
        "finite": bool(np.all(np.isfinite(np_video))),
    }))


if __name__ == "__main__":
    main()
