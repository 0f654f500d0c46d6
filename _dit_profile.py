"""Op-level profile of the 1.3B fused-CFG denoise step on the real chip.

Writes a trace to /tmp/dit_trace; prints the top self-time ops aggregated
from the trace's .xplane.pb via the raw protobuf (no tensorboard needed).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
print("backend:", jax.default_backend(), flush=True)

import math
from omnihuman_tpu.configs import WAN_CONFIGS
from omnihuman_tpu.models.wan_dit import init_wan_model, wan_model_forward
from omnihuman_tpu.ops.rope import rope_angles_3d

cfg = WAN_CONFIGS["t2v-1.3B"].model
rng = np.random.default_rng(0)

params = jax.jit(lambda k: jax.tree.map(
    lambda t: t.astype(jnp.bfloat16), init_wan_model(k, cfg)))(
        jax.random.key(0))
jax.block_until_ready(params)

F, H, W = 21, 60, 104           # 81f 480x832 latent grid
grid = (F // cfg.patch_size[0], H // cfg.patch_size[1],
        W // cfg.patch_size[2])
n_tokens = grid[0] * grid[1] * grid[2]
seq_len = int(math.ceil(n_tokens / 1024) * 1024)
sin, cos = rope_angles_3d(grid, cfg.head_dim, seq_len=seq_len)

x = jnp.asarray(rng.normal(size=(2, 16, F, H, W)), jnp.bfloat16)
t = jnp.asarray([500.0, 500.0], jnp.float32)
ctx = jnp.asarray(rng.normal(size=(2, 512, cfg.text_dim)), jnp.bfloat16)


@jax.jit
def step(params, x, t, ctx):
    return wan_model_forward(
        params, x, t, ctx, cfg=cfg, seq_len=seq_len,
        rope_sin=sin, rope_cos=cos, remat=False)


out = step(params, x, t, ctx)
jax.block_until_ready(out)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(step(params, x, t, ctx))
    ts.append(time.perf_counter() - t0)
print(f"fused-CFG fwd p50: {np.median(ts)*1e3:.1f} ms", flush=True)

os.system("rm -rf /tmp/dit_trace")
with jax.profiler.trace("/tmp/dit_trace"):
    jax.block_until_ready(step(params, x, t, ctx))
print("trace written", flush=True)

from omnihuman_tpu.utils.xplane import device_op_stats, print_op_stats

print_op_stats(device_op_stats("/tmp/dit_trace"), top=40)
