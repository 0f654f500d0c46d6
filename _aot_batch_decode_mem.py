"""Chipless AOT: HBM footprint of the STREAMING 81f 480x832 decode at
batch 1/2/4 (real v5e compiler, no chip). Gate before the on-chip
batched-throughput measurement: decode conv MXU efficiency is 35-59%
at batch 1 (REPORTS/perf_r3.md), so batching clips should lift
frames/sec/chip -- if it fits."""
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
for b in (int(a) for a in (sys.argv[1:] or ["1", "2", "4"])):
    z = jax.ShapeDtypeStruct((b, 16, 21, 60, 104), jnp.bfloat16,
                             sharding=rep)
    t0 = time.time()
    try:
        c = jax.jit(lambda p, z: vae_decode(p, z, cfg, streaming=True)
                    ).lower(params, z).compile()
        m = c.memory_analysis()
        tot = (m.temp_size_in_bytes + m.argument_size_in_bytes
               + m.output_size_in_bytes - m.alias_size_in_bytes)
        print(f"batch {b}: compiled {time.time()-t0:.0f}s  "
              f"temp {m.temp_size_in_bytes/2**30:.2f}  "
              f"arg {m.argument_size_in_bytes/2**30:.2f}  "
              f"out {m.output_size_in_bytes/2**30:.2f}  "
              f"total {tot/2**30:.2f} GiB (16 GiB HBM)", flush=True)
    except Exception as e:
        print(f"batch {b}: FAILED after {time.time()-t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
