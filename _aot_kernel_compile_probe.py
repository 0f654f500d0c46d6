"""Isolate WHERE the fused-VAE kernel's Mosaic compile time goes.

Variants at the full-res decoder shape (t=4, th=8, wc=144, C 96->96):
  full     — the production kernel (27 unrolled tap writes + big-K dot)
  dotonly  — same big-K dot from a pre-filled scratch (no im2col writes)
  im2col   — the 27 tap writes only (no dot)
  rolled   — 9-iteration fori_loop over (dt, dy) with dynamic outer/H
             starts, dx kept static (x3 unroll): ~9x less IR
Each is AOT-compiled with the real TPU compiler; wall time printed.
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

topo = topologies.get_topology_desc("v5e:2x4", "tpu")
mesh = Mesh(np.array(topo.devices[:1]).reshape(1), ("d",))
rep = NamedSharding(mesh, P())

T, TH, WC, CIN, COUT = 4, 8, 144, 96, 96
H, W = 480, 840
NH, NW = H // TH, -(-W // WC)
WP = NW * WC


def mk_inputs():
    xp = jax.ShapeDtypeStruct((1, T, H + 2, WP + 8, CIN), jnp.bfloat16,
                              sharding=rep)
    w2 = jax.ShapeDtypeStruct((27 * CIN, COUT), jnp.bfloat16, sharding=rep)
    return xp, w2


def halo_spec():
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(T), pl.Element(TH + 2),
         pl.Element(WC + 8), pl.Element(CIN)),
        lambda i, j: (0, 0, i * TH, j * WC, 0))


def out_spec():
    return pl.BlockSpec((1, T, TH, WC, COUT), lambda i, j: (0, 0, i, j, 0))


def out_shape():
    return jax.ShapeDtypeStruct((1, T, NH * TH, WP, COUT), jnp.bfloat16)


def scratch():
    return [pltpu.VMEM((T * TH * WC, 27 * CIN), jnp.bfloat16)]


def k_full(x_ref, w_ref, y_ref, xc_ref):
    xin = x_ref[0]
    idx = 0
    for dt in range(3):
        for dy in range(3):
            for dx in range(3):
                tap = xin[dt:dt + T, dy:dy + TH, dx:dx + WC, :]
                xc_ref[:, idx * CIN:(idx + 1) * CIN] = tap.reshape(
                    T * TH * WC, CIN)
                idx += 1
    acc = jax.lax.dot_general(xc_ref[...], w_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    y_ref[0] = acc.reshape(T, TH, WC, COUT).astype(jnp.bfloat16)


def k_dotonly(x_ref, w_ref, y_ref, xc_ref):
    # touch the input once, then only the big dot
    xc_ref[:, :CIN] = x_ref[0, :, 1:1 + TH, 1:1 + WC, :].reshape(
        T * TH * WC, CIN)
    acc = jax.lax.dot_general(xc_ref[...], w_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    y_ref[0] = acc.reshape(T, TH, WC, COUT).astype(jnp.bfloat16)


def k_im2col(x_ref, w_ref, y_ref, xc_ref):
    xin = x_ref[0]
    idx = 0
    for dt in range(3):
        for dy in range(3):
            for dx in range(3):
                xc_ref[:, idx * CIN:(idx + 1) * CIN] = xin[
                    dt:dt + T, dy:dy + TH, dx:dx + WC, :].reshape(
                        T * TH * WC, CIN)
                idx += 1
    y_ref[0] = xc_ref[:, :COUT].reshape(T, TH, WC, COUT)


def k_rolled(x_ref, w_ref, y_ref, xc_ref):
    def body(i, _):
        dt = i // 3
        dy = i % 3
        tap = pl.load(x_ref, (0, pl.ds(dt, T), pl.ds(dy, TH),
                              slice(None), slice(None)))
        for dx in range(3):
            idx = 9 * dx + i            # layout: dx-major groups
            xc_ref[:, idx * CIN:(idx + 1) * CIN] = tap[
                :, :, dx:dx + WC, :].reshape(T * TH * WC, CIN)
        return 0
    jax.lax.fori_loop(0, 9, body, 0)
    acc = jax.lax.dot_general(xc_ref[...], w_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    y_ref[0] = acc.reshape(T, TH, WC, COUT).astype(jnp.bfloat16)


KERNELS = {"full": k_full, "dotonly": k_dotonly, "im2col": k_im2col,
           "rolled": k_rolled}

for name in (sys.argv[1:] or list(KERNELS)):
    kern = KERNELS[name]
    xp, w2 = mk_inputs()

    def fn(x, w):
        return pl.pallas_call(
            kern, grid=(NH, NW),
            in_specs=[halo_spec(),
                      pl.BlockSpec((27 * CIN, COUT), lambda i, j: (0, 0))],
            out_specs=out_spec(), out_shape=out_shape(),
            scratch_shapes=scratch())(x, w)

    t0 = time.time()
    try:
        c = jax.jit(fn).lower(xp, w2).compile()
        sz = c.memory_analysis().generated_code_size_in_bytes / 2**20
        print(f"{name}: compile {time.time()-t0:.1f}s code={sz:.2f}MiB",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {time.time()-t0:.1f}s: "
              + " / ".join(str(e).splitlines()[:3]), flush=True)
