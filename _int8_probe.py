"""int8 vs bf16 MXU probe: 20 chained GEMMs in one jit; each iteration's
FULL output feeds the next via a total reduction (DCE-proof)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20

def make16():
    @jax.jit
    def f(x, w):
        acc = jnp.float32(0)
        xx = x
        for _ in range(ITERS):
            y = jax.lax.dot_general(xx, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = y.sum()                      # needs ALL of y
            acc = acc + s
            xx = x + (s * 1e-30).astype(x.dtype)
        return acc
    return f

def make8():
    @jax.jit
    def f(x, w):
        acc = jnp.int32(0)
        xx = x
        for _ in range(ITERS):
            y = jax.lax.dot_general(xx, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            s = y.sum()
            acc = acc + s
            xx = x ^ (s & 1).astype(jnp.int8)
        return acc
    return f

def bench(f, *args):
    float(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append((time.perf_counter() - t0) * 1e3 / ITERS)
    return float(np.percentile(ts, 50))

for (M, K, N) in [(65520, 1536, 8960), (65520, 8960, 1536),
                  (65520, 1536, 1536)]:
    key = jax.random.key(0)
    x16 = jax.random.normal(key, (M, K), jnp.bfloat16)
    w16 = jax.random.normal(key, (K, N), jnp.bfloat16)
    x8 = jnp.clip(jax.random.normal(key, (M, K)) * 40, -127, 127).astype(jnp.int8)
    w8 = jnp.clip(jax.random.normal(key, (K, N)) * 40, -127, 127).astype(jnp.int8)
    t16 = bench(make16(), x16, w16)
    t8 = bench(make8(), x8, w8)
    fl = 2 * M * K * N
    print(f"[{M}x{K}x{N}] bf16 {t16:.2f} ms ({fl/t16/1e9:.0f} TF/s)  "
          f"int8 {t8:.2f} ms ({fl/t8/1e9:.0f} TOP/s)  speedup {t16/t8:.2f}x",
          flush=True)
