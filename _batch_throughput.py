"""On-chip: one-step serving THROUGHPUT at batch 1/2/4.

Motivation (REPORTS/perf_r3.md / perf_r4.md): the batch-1 one-step clip
is decode-dominated (4.86 s of 7.07 s) and the decode convs run at
35-59% MXU efficiency — too little parallel work per conv at C<128.
Batching clips multiplies the per-conv work without touching the
per-step scan/copy overhead, so throughput (frames/sec/chip) should
rise even though per-clip latency does.

Measures, per batch B in argv (default 1 2 4):
  - one-step DiT forward [B, 16, 21, 60, 104] p50 of 5
  - streaming VAE decode [B, 16, 21, 60, 104] p50 of 3
  - derived: clips/s, frames/s/chip = 81*B / (dit + decode + t5*B)
    (T5 encode is per-prompt; 82 ms each, batch-1 measured value reused)

Usage: python _batch_throughput.py [1 2 4]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from omnihuman_tpu.configs import WAN_CONFIGS
from omnihuman_tpu.models.wan_dit import init_wan_model, wan_model_forward
from omnihuman_tpu.models.vae import init_vae, vae_decode
from omnihuman_tpu.ops.rope import rope_angles_3d

T5_MS = 82.3   # measured batch-1 (bench.py north star); per-prompt cost

cfg = WAN_CONFIGS["t2v-1.3B"]
frames, h, w = 21, 60, 104
grid = (21, 30, 52)
seq_len = -(-(grid[0] * grid[1] * grid[2]) // 1024) * 1024

batches = [int(a) for a in (sys.argv[1:] or ["1", "2", "4"])]

params = jax.jit(lambda k: jax.tree.map(
    lambda x: x.astype(jnp.bfloat16),
    init_wan_model(k, cfg.model)))(jax.random.key(0))
jax.block_until_ready(params)
vae_params = jax.jit(lambda k: jax.tree.map(
    lambda v: v.astype(jnp.bfloat16),
    init_vae(k, cfg.vae)))(jax.random.key(1))
jax.block_until_ready(vae_params)

sin, cos = rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len)
rng = np.random.default_rng(0)

rows = []
for b in batches:
    row = {"batch": b}
    x = jnp.asarray(rng.normal(size=(b, 16, frames, h, w)), jnp.bfloat16)
    ctx = jnp.asarray(rng.normal(size=(b, 512, 4096)) * 0.1, jnp.bfloat16)
    t = jnp.full((b,), 999.0, jnp.float32)

    @jax.jit
    def one_step(params, x, t, ctx):
        return wan_model_forward(params, x, t, ctx, cfg=cfg.model,
                                 seq_len=seq_len, rope_sin=sin,
                                 rope_cos=cos, remat=False)

    t0 = time.time()
    float(jnp.sum(one_step(params, x, t, ctx)[:, 0, 0, 0, 0]))
    row["dit_compile_s"] = round(time.time() - t0, 1)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(one_step(params, x, t, ctx)[:, 0, 0, 0, 0]))
        ts.append((time.perf_counter() - t0) * 1e3)
    row["dit_ms"] = round(float(np.percentile(ts, 50)), 1)

    dec = jax.jit(lambda p, z: vae_decode(p, z, cfg.vae, streaming=True))
    t0 = time.time()
    try:
        float(jnp.sum(dec(vae_params, x)[:, 0, 0, 0, 0]))
        row["dec_compile_s"] = round(time.time() - t0, 1)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(dec(vae_params, x)[:, 0, 0, 0, 0]))
            ts.append((time.perf_counter() - t0) * 1e3)
        row["decode_ms"] = round(float(np.percentile(ts, 50)), 1)
        e2e = row["dit_ms"] + row["decode_ms"] + T5_MS * b
        row["e2e_ms"] = round(e2e, 1)
        row["frames_per_sec_chip"] = round(81.0 * b / (e2e / 1e3), 2)
    except Exception as e:
        row["decode_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    rows.append(row)
    print(json.dumps(row), flush=True)

print(json.dumps({"rows": rows}))
