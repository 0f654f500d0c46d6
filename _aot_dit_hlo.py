"""Chipless v5e AOT compile of the 1.3B fused-CFG step; dump + analyze
the optimized HLO to attribute the non-attention remainder (VERDICT r2
item 9) without chip access: which dots exist (did XLA merge q/k/v?),
how many full-stream fp32 elementwise passes survive fusion, and the
estimated HBM bytes they move.
"""
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")   # keep eager ops off axon
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

topo = topologies.get_topology_desc("v5e:2x4", "tpu")
mesh = Mesh(np.array(topo.devices[:1]).reshape(1), ("d",))
rep = NamedSharding(mesh, P())

from omnihuman_tpu.configs import WAN_CONFIGS
from omnihuman_tpu.models.wan_dit import init_wan_model, wan_model_forward
from omnihuman_tpu.ops.rope import rope_angles_3d

cfg = WAN_CONFIGS["t2v-1.3B"].model
F, H, W = 21, 60, 104
grid = (F // cfg.patch_size[0], H // cfg.patch_size[1],
        W // cfg.patch_size[2])
seq_len = -(-grid[0] * grid[1] * grid[2] // 1024) * 1024
sin, cos = rope_angles_3d(grid, cfg.head_dim, seq_len=seq_len)
sin = jax.device_put(sin) if False else sin  # host consts fold into jit

params = jax.eval_shape(lambda k: init_wan_model(k, cfg), jax.random.key(0))
params = jax.tree.map(
    lambda t: jax.ShapeDtypeStruct(t.shape, jnp.bfloat16, sharding=rep),
    params)
sd = lambda s, dt: jax.ShapeDtypeStruct(s, dt, sharding=rep)
x = sd((2, 16, F, H, W), jnp.bfloat16)
t = sd((2,), jnp.float32)
ctx = sd((2, 512, cfg.text_dim), jnp.bfloat16)


def step(params, x, t, ctx):
    # attn_impl explicit: "auto" keys off the default backend, which is
    # CPU here (the AOT targets the topology) and would pick dense XLA
    v = wan_model_forward(params, x, t, ctx, cfg=cfg, seq_len=seq_len,
                          rope_sin=sin, rope_cos=cos, remat=False,
                          attn_impl="pallas")
    vc, vu = jnp.split(v, 2, axis=0)
    return vu + 5.0 * (vc - vu)


print("lowering...", flush=True)
lowered = jax.jit(step).lower(params, x, t, ctx)
print("compiling...", flush=True)
compiled = lowered.compile()
m = compiled.memory_analysis()
print(f"compiled. temp={m.temp_size_in_bytes/2**30:.2f} GiB", flush=True)

hlo = compiled.as_text()
with open("/tmp/dit_step_opt.hlo", "w") as f:
    f.write(hlo)
print(f"HLO dumped: {len(hlo.splitlines())} lines", flush=True)

# ---- analysis -------------------------------------------------------------
# per-layer while-body ops dominate; find dots and big elementwise fusions
dot_re = re.compile(r"%?([\w.\-]+) = (\S+) dot\(")
shape_re = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(stext):
    m2 = shape_re.match(stext)
    if not m2:
        return 0, stext
    dt, dims = m2.group(1), m2.group(2)
    sz = {"f32": 4, "bf16": 2, "s32": 4, "f16": 2, "s8": 1,
          "pred": 1, "u32": 4}.get(dt, 4)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * sz, dt


dots = {}
for line in hlo.splitlines():
    mm = dot_re.search(line)
    if mm:
        nm, shp = mm.group(1), mm.group(2)
        key = shp
        dots[key] = dots.get(key, 0) + 1
print("\n== dot output shapes (count) ==")
for k, v in sorted(dots.items(), key=lambda kv: -kv[1]):
    print(f"  {v:4d}x {k}")

# fusions writing full-stream fp32/bf16 tensors of the token stream size
stream = 2 * seq_len * cfg.dim
big = {}
for line in hlo.splitlines():
    mm = re.search(r"= (\S+) fusion\(", line)
    if not mm:
        continue
    b, dt = shape_bytes(mm.group(1))
    if b >= stream * 2:                      # >= bf16 full stream
        kind = re.search(r"kind=(\w+)", line)
        key = (mm.group(1), kind.group(1) if kind else "?")
        big[key] = big.get(key, 0) + 1
print("\n== full-stream fusion outputs (shape, kind, count) ==")
tot = 0
for (shp, kind), v in sorted(big.items(), key=lambda kv: -kv[1]):
    b, _ = shape_bytes(shp)
    tot += v * b
    print(f"  {v:4d}x {shp} {kind}  ({b/2**20:.0f} MiB each)")
print(f"  total full-stream fusion output traffic: {tot/2**30:.1f} GiB "
      f"(write side only; ~{tot/800e9*1e3:.0f} ms at 800 GB/s)")
