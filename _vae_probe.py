"""Probe 6: decode timing with hoisted transformed weights."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
print("backend:", jax.default_backend(), flush=True)

from omnihuman_tpu.configs.wan import VAEConfig
from omnihuman_tpu.models.vae import init_vae, vae_decode

rng = np.random.default_rng(0)
cfg = VAEConfig()
params = jax.jit(lambda k: jax.tree.map(
    lambda t: t.astype(jnp.bfloat16), init_vae(k, cfg)))(jax.random.key(0))
jax.block_until_ready(params)
z = jnp.asarray(rng.normal(size=(1, 16, 21, 60, 104)), jnp.bfloat16)

f = jax.jit(lambda p, z: vae_decode(p, z, cfg, streaming=True))
out = f(params, z)
float(jnp.sum(out[0, 0, 0, 0]))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out = f(params, z)
    float(jnp.sum(out[0, 0, 0, 0]))
    ts.append(time.perf_counter() - t0)
print(f"decode 81f 480x832: {np.median(ts)*1e3:.0f} ms", flush=True)
