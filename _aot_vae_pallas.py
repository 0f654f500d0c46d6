"""Chipless v5e AOT compile of the fused-Pallas streaming VAE decode.

The kernels were interpret-verified during the tunnel outage; this runs
the REAL Mosaic/TPU compiler (topology AOT, no chip needed) to catch
lowering rejections (bf16 precision, VMEM overflow, tiling) before the
chip is back. Also compiles the encoder's fused path and reports
temp/peak memory.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp
# eager ops (key creation, host constants) must NOT touch the axon
# backend — the AOT compile below targets the topology regardless.
jax.config.update("jax_platforms", "cpu")
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

topo = topologies.get_topology_desc("v5e:2x4", "tpu")
mesh = Mesh(np.array(topo.devices[:1]).reshape(1), ("d",))
rep = NamedSharding(mesh, P())

from omnihuman_tpu.configs.wan import VAEConfig
from omnihuman_tpu.models.vae import init_vae, vae_decode, vae_encode

cfg = VAEConfig()
params = jax.eval_shape(lambda k: init_vae(k, cfg), jax.random.key(0))
params = jax.tree.map(
    lambda t: jax.ShapeDtypeStruct(t.shape, jnp.bfloat16, sharding=rep),
    params)
z = jax.ShapeDtypeStruct((1, 16, 21, 60, 104), jnp.bfloat16, sharding=rep)
vid = jax.ShapeDtypeStruct((1, 3, 81, 480, 832), jnp.bfloat16, sharding=rep)

for label, fn, arg in (
    ("decode/pallas", lambda p, a: vae_decode(
        p, a, cfg, streaming=True, conv_impl="pallas"), z),
    ("encode/pallas", lambda p, a: vae_encode(
        p, a, cfg, streaming=True, conv_impl="pallas"), vid),
):
    try:
        lowered = jax.jit(fn).lower(params, arg)
        compiled = lowered.compile()
        m = compiled.memory_analysis()
        print(f"{label}: COMPILED  temp={m.temp_size_in_bytes/2**30:.2f}GiB "
              f"args={m.argument_size_in_bytes/2**30:.2f}GiB "
              f"code={m.generated_code_size_in_bytes/2**20:.1f}MiB",
              flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        print(f"{label}: FAILED: " + " / ".join(msg[:6]), flush=True)
