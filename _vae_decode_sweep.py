"""Sweep VAE streaming-decode variants on the real chip.

Usage: python _vae_decode_sweep.py fc1u1 fc1u4 fc2u1 fc4u1 fc1u1p
Each spec fc<frame_chunk>u<scan_unroll>[p] is compiled + timed (p50 of
5); trailing 'p' selects conv_impl="pallas" (fused resblock kernels).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import re
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

if "encode" in sys.argv[1:]:
    from omnihuman_tpu.models.vae import vae_encode
    vid = jnp.asarray(rng.normal(size=(1, 3, 81, 480, 832)) * 0.3,
                      jnp.bfloat16)
    for impl in ("xla", "pallas"):
        try:
            f = jax.jit(lambda p, v, impl=impl: vae_encode(
                p, v, cfg, streaming=True, conv_impl=impl))
            out = f(params, vid)
            float(jnp.sum(out[:, 0, 0, 0, 0]))   # honest sync (see below)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(f(params, vid)[:, 0, 0, 0, 0]))
                ts.append(time.perf_counter() - t0)
            print(f"encode {impl}: {np.median(ts)*1e3:.0f} ms", flush=True)
        except Exception as e:
            print(f"encode {impl}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    sys.argv = [a for a in sys.argv if a != "encode"]

ref = None
for spec in sys.argv[1:]:
    m = re.fullmatch(r"fc(\d+)u(\d+)(p?)", spec)
    fc, un = int(m.group(1)), int(m.group(2))
    impl = "pallas" if m.group(3) else "xla"
    try:
        f = jax.jit(lambda p, z, fc=fc, un=un, impl=impl: vae_decode(
            p, z, cfg, streaming=True, frame_chunk=fc, scan_unroll=un,
            conv_impl=impl))
        t0 = time.perf_counter()
        out = f(params, z)
        got = np.asarray(out[:, :, ::7, ::31, ::37], np.float32)
        compile_s = time.perf_counter() - t0
        if ref is None:
            ref = got
        else:
            err = float(np.max(np.abs(got - ref)))
            if err > 1e-2:
                print(f"{spec}: OUTPUT MISMATCH {err}", flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            # scalar fetch: on this backend block_until_ready does not
            # truly block (queue-depth-1 backpressure) — a device->host
            # fetch is the honest sync (same as bench.py)
            float(jnp.sum(f(params, z)[:, 0, 0, 0, 0]))
            ts.append(time.perf_counter() - t0)
        print(f"{spec}: {np.median(ts)*1e3:.0f} ms  "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"{spec}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
