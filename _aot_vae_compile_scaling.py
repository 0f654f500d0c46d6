"""Chipless probe: how does fused-Pallas streaming-decode COMPILE time
scale with latent T (number of scan steps)?  T=1 compiles only the
first-chunk (no scan); T=2 adds the scan body; larger T should be free
if the scan compiles once.  Run each case in sequence and print wall
times; compare vs conv_impl=xla to separate Mosaic cost from XLA-pass
cost."""
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

cases = []
for spec in sys.argv[1:]:
    impl, t = spec.split(":")
    cases.append((impl, int(t)))
if not cases:
    cases = [("pallas", 1), ("pallas", 2), ("pallas", 3)]

for impl, t in cases:
    z = jax.ShapeDtypeStruct((1, 16, t, 60, 104), jnp.bfloat16,
                             sharding=rep)
    fn = lambda p, a: vae_decode(p, a, cfg, streaming=True, conv_impl=impl)
    t0 = time.time()
    lowered = jax.jit(fn).lower(params, z)
    t1 = time.time()
    try:
        compiled = lowered.compile()
        t2 = time.time()
        print(f"{impl} T={t}: lower {t1-t0:.1f}s compile {t2-t1:.1f}s "
              f"code={compiled.memory_analysis().generated_code_size_in_bytes/2**20:.1f}MiB",
              flush=True)
    except Exception as e:
        print(f"{impl} T={t}: lower {t1-t0:.1f}s FAILED "
              + " / ".join(str(e).splitlines()[:4]), flush=True)
