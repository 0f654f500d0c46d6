"""On-chip re-verification after the offs_ref kernel change (temp)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from omnihuman_tpu.ops.attention import attention_xla_chunked
from omnihuman_tpu.ops.flash_pallas import pallas_flash_attention

rng = np.random.default_rng(0)
# real Wan-1.3B geometry
b, l, n, d = 1, 1560, 12, 128
q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.bfloat16)
lens = jnp.asarray([1400], jnp.int32)

# 1) parity vs chunked-XLA golden (fwd), incl. causal+window and offsets
for kw in (dict(), dict(causal=True), dict(window_size=(256, 128))):
    got = pallas_flash_attention(q, k, v, k_lens=lens, **kw)
    want = attention_xla_chunked(q, k, v, k_lens=lens, **kw)
    diff = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                 - want.astype(jnp.float32))))
    print(f"fwd parity {kw}: max|d|={diff:.5f}")
    assert diff < 2e-2, (kw, diff)

# offsets shift the causal diagonal — compare vs dense with same offsets
from omnihuman_tpu.ops.attention import attention_xla
offs = jnp.asarray([512, 0], jnp.int32)
ql = q[:, :512]
got = pallas_flash_attention(ql, k, v, k_lens=lens, causal=True,
                             offsets=offs)
want = attention_xla(ql, k, v, k_lens=lens, causal=True, offsets=offs)
diff = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                             - want.astype(jnp.float32))))
print(f"fwd parity offsets: max|d|={diff:.5f}")
assert diff < 2e-2, diff

# 2) bwd parity (grads) at moderate size
qs, ks, vs = q[:, :512], k[:, :512], v[:, :512]
w = jnp.asarray(rng.normal(size=qs.shape), jnp.bfloat16)


def loss(fn):
    f = lambda a, b_, c: jnp.sum((fn(a, b_, c)
                                  * w).astype(jnp.float32))
    return jax.grad(f, argnums=(0, 1, 2))(qs, ks, vs)


gp = loss(lambda a, b_, c: pallas_flash_attention(a, b_, c, causal=True))
gx = loss(lambda a, b_, c: attention_xla_chunked(a, b_, c, causal=True))
for a, b_, nm in zip(gp, gx, "qkv"):
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - b_.astype(jnp.float32))))
    print(f"bwd parity d{nm}: max|d|={diff:.5f}")
    assert diff < 5e-2, (nm, diff)

# 3) perf at the flagship 32k geometry (was 150 TFLOP/s fwd)
l2 = 32768
q2 = jnp.asarray(rng.normal(size=(1, l2, 12, 128)), jnp.bfloat16)
fa = jax.jit(lambda q, k, v: pallas_flash_attention(q, k, v))
float(jnp.sum(fa(q2, q2, q2)[0, 0, 0].astype(jnp.float32)))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    float(jnp.sum(fa(q2, q2, q2)[0, 0, 0].astype(jnp.float32)))
    ts.append(time.perf_counter() - t0)
p50 = float(np.percentile(ts, 50))
tflops = 4 * 1 * 12 * l2 * l2 * 128 / p50 / 1e12
print(f"fwd 32k p50 {p50*1e3:.1f} ms  {tflops:.1f} TFLOP/s")
