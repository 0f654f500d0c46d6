"""Chipless AOT re-verification of _pick_up_tiles' corrected VMEM model
(ADVICE r3 medium: count the im2col scratch twice, like _pick_tiles).

Compiles fused_upsample_conv2d with the REAL TPU compiler at the three
upsample sites of the streaming decode (decoder_spec: upsample3d @
60x104 384->192 t=1, upsample3d @ 120x208 384->192 t=2, upsample2d @
240x416 192->96 t=4) plus first-chunk t=1 variants. A scoped-VMEM
rejection here means the fits() model is still wrong.
"""
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

from omnihuman_tpu.ops.vae_pallas import (
    _pick_up_tiles, fused_upsample_conv2d)

SHAPES = [  # (t, h, w, cin, cout)
    (1, 60, 104, 384, 192),
    (2, 120, 208, 384, 192),
    (4, 240, 416, 192, 96),
    (1, 120, 208, 384, 192),   # first-chunk variants
    (1, 240, 416, 192, 96),
]

for (t, h, w, cin, cout) in SHAPES:
    th, wc = _pick_up_tiles(t, h, w, cin, cout)
    x = jax.ShapeDtypeStruct((1, t, h, w, cin), jnp.bfloat16, sharding=rep)
    w4 = jax.ShapeDtypeStruct((2, 2, 4 * cin, cout), jnp.bfloat16,
                              sharding=rep)
    b = jax.ShapeDtypeStruct((cout,), jnp.float32, sharding=rep)
    t0 = time.time()
    try:
        jax.jit(lambda x, w4, b: fused_upsample_conv2d(
            x, w4, b, tile_h=th, tile_w=wc)).lower(x, w4, b).compile()
        print(f"t={t} {h}x{w} {cin}->{cout} tiles=({th},{wc}): "
              f"OK ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"t={t} {h}x{w} {cin}->{cout} tiles=({th},{wc}): "
              f"FAILED {type(e).__name__}: {str(e)[:250]}", flush=True)
