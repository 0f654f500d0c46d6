"""Device-time check for the flash kernel at B=2/32k (temp probe).

Closes the 117-vs-88 ms question: wall-clock per-call probes include one
tunnel round trip per iteration, so tunnel-latency days inflate them.
This profiles DEVICE time via jax.profiler + utils/xplane.py — if the
kernel's device time still matches the round-4 record, the "regression"
was pure dispatch latency and the kernel never changed speed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))

from omnihuman_tpu.ops.flash_pallas import pallas_flash_attention

rng = np.random.default_rng(0)
l2 = 32768
q2 = jnp.asarray(rng.normal(size=(2, l2, 12, 128)), jnp.bfloat16)
fa = jax.jit(lambda q, k, v: pallas_flash_attention(q, k, v))
float(jnp.sum(fa(q2, q2, q2)[0, 0, 0].astype(jnp.float32)))  # compile

trace_dir = "/tmp/flash_trace"
with jax.profiler.trace(trace_dir):
    o = None
    for _ in range(5):
        o = fa(q2, q2, q2)
    float(jnp.sum(o[0, 0, 0].astype(jnp.float32)))   # one fetch for 5 calls

from omnihuman_tpu.utils.xplane import device_op_stats, print_op_stats

stats = device_op_stats(trace_dir)
print_op_stats(stats, top=8)
total_ms = sum(s.total_ms for s in stats)
print(f"device total {total_ms:.1f} ms traced -> "
      f"kernel custom-call = dominant row above")
