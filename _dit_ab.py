"""A/B timings for the 1.3B fused-CFG step on the real chip:
baseline / bf16 residual / trimmed 128-token context / both.
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
from omnihuman_tpu.configs.wan import DTypePolicy
from omnihuman_tpu.models.wan_dit import init_wan_model, wan_model_forward
from omnihuman_tpu.ops.rope import rope_angles_3d

cfg = WAN_CONFIGS["t2v-1.3B"].model
rng = np.random.default_rng(0)
params = jax.jit(lambda k: jax.tree.map(
    lambda t: t.astype(jnp.bfloat16), init_wan_model(k, cfg)))(
        jax.random.key(0))
jax.block_until_ready(params)

F, H, W = 21, 60, 104
grid = (F // cfg.patch_size[0], H // cfg.patch_size[1],
        W // cfg.patch_size[2])
seq_len = -(-grid[0] * grid[1] * grid[2] // 1024) * 1024
sin, cos = rope_angles_3d(grid, cfg.head_dim, seq_len=seq_len)

x = jnp.asarray(rng.normal(size=(2, 16, F, H, W)), jnp.bfloat16)
t = jnp.full((2,), 500.0, jnp.float32)
ctx512 = jnp.asarray(rng.normal(size=(2, 512, cfg.text_dim)) * 0.1,
                     jnp.bfloat16)
lens = jnp.asarray([100, 100], jnp.int32)


def bench(label, ctx, policy, ctx_lens=None):
    @jax.jit
    def step(params, x, t, ctx, lens):
        v = wan_model_forward(params, x, t, ctx, cfg=cfg, seq_len=seq_len,
                              rope_sin=sin, rope_cos=cos, remat=False,
                              policy=policy, context_lens=lens)
        vc, vu = jnp.split(v, 2, axis=0)
        return vu + 5.0 * (vc - vu)

    float(jnp.sum(step(params, x, t, ctx, ctx_lens)[:, 0, 0, 0, 0]))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(jnp.sum(step(params, x, t, ctx, ctx_lens)[:, 0, 0, 0, 0]))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label}: p50 {np.median(ts):.1f} ms", flush=True)


fp32 = DTypePolicy()
bf16r = DTypePolicy(residual=jnp.bfloat16)
bench("baseline (ctx512, fp32 residual)", ctx512, fp32)
bench("ctx128 trim + lens", ctx512[:, :128], fp32, lens)
bench("bf16 residual", ctx512, bf16r)
bench("bf16 residual + ctx128", ctx512[:, :128], bf16r, lens)
