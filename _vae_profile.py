"""Op-level profile of the streaming VAE decode on the real chip."""
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

impl = sys.argv[1] if len(sys.argv) > 1 else "xla"
f = jax.jit(lambda p, z: vae_decode(p, z, cfg, streaming=True,
                                    conv_impl=impl))
# scalar fetch: honest sync on this backend (block_until_ready lags one
# dispatch behind — see bench.py)
float(jnp.sum(f(params, z)[:, 0, 0, 0, 0]))

os.system("rm -rf /tmp/vae_trace")
with jax.profiler.trace("/tmp/vae_trace"):
    float(jnp.sum(f(params, z)[:, 0, 0, 0, 0]))
print(f"trace written (conv_impl={impl})", flush=True)

from omnihuman_tpu.utils.xplane import device_op_stats, print_op_stats
print_op_stats(device_op_stats("/tmp/vae_trace"), top=40)
