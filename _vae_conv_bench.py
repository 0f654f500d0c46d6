"""Micro-benchmark: formulations of the streaming causal 3x3x3 conv at the
VAE decoder's hot shapes (full-res 96ch 480x840, mid 192ch 240x424).

Per step the decoder sees xin = concat(cache[2f], x[4f]) then a valid-time
conv3d -> 4 frames. Candidates:
  A conv3d NDHWC (current)
  B per-tap conv2d sum: y = sum_dt conv2d(xin[dt:dt+4], w[dt])
  C channel-stacked: conv2d([x_{t-2}|x_{t-1}|x_t] along C, kernel [3,3,3C,C])
  D conv3d on pre-concatenated input (isolate the concat cost)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(0)


def _sync(out):
    # scalar fetch: block_until_ready does not truly block on this
    # backend (queue-depth-1 backpressure); fetch one element instead
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.reshape(-1)[0]))


def bench(f, *args, n=10):
    _sync(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def run(C, H, W, label):
    T = 4
    x = jnp.asarray(rng.normal(size=(1, T, H, W, C)), jnp.bfloat16)
    cache = jnp.asarray(rng.normal(size=(1, 2, H, W, C)), jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.05, jnp.bfloat16)
    b = jnp.zeros((C,), jnp.bfloat16)
    dn3 = ("NDHWC", "DHWIO", "NDHWC")
    dn2 = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def conv3d_concat(cache, x, w, b):
        xin = jnp.concatenate([cache, x], axis=1)
        y = jax.lax.conv_general_dilated(
            xin, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=dn3)
        return y + b

    @jax.jit
    def conv3d_pre(xin, w, b):
        y = jax.lax.conv_general_dilated(
            xin, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=dn3)
        return y + b

    @jax.jit
    def conv2d_taps(cache, x, w, b):
        xin = jnp.concatenate([cache, x], axis=1)[0]     # [6,H,W,C]
        acc = None
        for dt in range(3):
            y = jax.lax.conv_general_dilated(
                xin[dt:dt + 4], w[dt], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=dn2)
            acc = y if acc is None else acc + y
        return (acc + b)[None]

    @jax.jit
    def conv2d_stacked(cache, x, w, b):
        xin = jnp.concatenate([cache, x], axis=1)[0]     # [6,H,W,C]
        stk = jnp.concatenate([xin[0:4], xin[1:5], xin[2:6]], axis=-1)
        wf = w.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * C, C)
        y = jax.lax.conv_general_dilated(
            stk, wf, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn2)
        return (y + b)[None]

    xin_pre = jnp.concatenate([cache, x], axis=1)
    ms_a = bench(conv3d_concat, cache, x, w3, b)
    ms_d = bench(conv3d_pre, xin_pre, w3, b)
    ms_b = bench(conv2d_taps, cache, x, w3, b)
    ms_c = bench(conv2d_stacked, cache, x, w3, b)

    ya = conv3d_concat(cache, x, w3, b)
    yb = conv2d_taps(cache, x, w3, b)
    yc = conv2d_stacked(cache, x, w3, b)
    db = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
    dc = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yc.astype(jnp.float32))))

    macs = T * H * W * C * C * 27
    ideal = macs * 2 / 197e12 * 1e3
    print(f"{label}: ideal {ideal:.2f} ms | conv3d+concat {ms_a:.2f} "
          f"({100*ideal/ms_a:.0f}%) | conv3d pre {ms_d:.2f} | "
          f"2d-taps {ms_b:.2f} (err {db:.3g}) | "
          f"2d-stacked {ms_c:.2f} (err {dc:.3g})", flush=True)


run(96, 480, 840, "96ch 480x840")
run(192, 240, 424, "192ch 240x424")
run(384, 120, 210, "384ch 120x210")
