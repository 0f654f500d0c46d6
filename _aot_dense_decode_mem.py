"""Chipless AOT: does the DENSE (non-streaming) 81f 480x832 VAE decode
fit v5e HBM, and what does buffer assignment say? (The on-chip attempt
died in the remote compile helper with HTTP 500 — this isolates whether
that's memory or a helper failure.)"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

topo = topologies.get_topology_desc("v5e:2x4", "tpu")
mesh = Mesh(np.array(topo.devices[:1]).reshape(1), ("d",))
rep = NamedSharding(mesh, P())

from omnihuman_tpu.configs.wan import VAEConfig
from omnihuman_tpu.models.vae import init_vae, vae_decode

cfg = VAEConfig()
params = jax.eval_shape(lambda k: init_vae(k, cfg), jax.random.key(0))
params = jax.tree.map(
    lambda t: jax.ShapeDtypeStruct(t.shape, jnp.bfloat16, sharding=rep),
    params)
z = jax.ShapeDtypeStruct((1, 16, 21, 60, 104), jnp.bfloat16, sharding=rep)

t0 = time.time()
c = jax.jit(lambda p, z: vae_decode(p, z, cfg, streaming=False)).lower(
    params, z).compile()
m = c.memory_analysis()
print(f"compiled in {time.time()-t0:.0f}s")
for k in ("temp_size_in_bytes", "argument_size_in_bytes",
          "output_size_in_bytes", "alias_size_in_bytes",
          "generated_code_size_in_bytes"):
    print(k, getattr(m, k, None))
tot = (m.temp_size_in_bytes + m.argument_size_in_bytes
       + m.output_size_in_bytes - m.alias_size_in_bytes)
print(f"peak-ish total: {tot/2**30:.2f} GiB (v5e HBM 16 GiB)")
