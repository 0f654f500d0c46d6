"""int8 probe for the VAE decoder convs (VERDICT r4 item 4 / weak #5).

Decode is 69% of the one-step clip (4.86 s of 7.07 s); its in-loop conv
fusions run at 35-59% MXU efficiency (REPORTS/perf_r4.md §1). The v5e
MXU doubles throughput at int8 — this probe A/Bs, at the decoder's
streaming step shapes (xin = cache[2f] + x[4f] = 6 frames, valid-time
3x3x3 conv -> 4 frames, channels-last):

  A. bf16 conv3d                      (production path)
  B. W8A8: per-tensor int8 activations x per-OC int8 weights via
     lax.conv_general_dilated(int8, int8, preferred_element_type=int32)
  C. weight-only int8 (dequant inline, bf16 conv) — halves weight HBM

Adopt/kill on the same discipline as the DiT int8 decision (perf_r4
§7): only a clear speedup at the dominant shapes justifies wiring a
quantized decode path + pixel gate.
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(0)
DN3 = ("NDHWC", "DHWIO", "NDHWC")


def _sync(out):
    float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[0]))


def bench(f, *args, n=8):
    _sync(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def run(cin, cout, H, W, label):
    T = 6                                 # cache 2 + chunk 4
    x = jnp.asarray(rng.normal(size=(1, T, H, W, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.05,
                    jnp.bfloat16)
    b = jnp.zeros((cout,), jnp.bfloat16)

    @jax.jit
    def conv_bf16(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=DN3)
        return y + b

    # W8A8: per-tensor activation scale, per-OC weight scale (OC = last
    # axis of DHWIO, so reduce over the first four)
    w_s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2, 3)) / 127.
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / w_s), -127,
                   127).astype(jnp.int8)

    @jax.jit
    def conv_int8(x, w_q, b):
        xf = x.astype(jnp.float32)
        x_s = jnp.max(jnp.abs(xf)) / 127.0
        x_q = jnp.clip(jnp.round(xf / x_s), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            x_q, w_q, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=DN3, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (x_s * w_s)
        return y.astype(jnp.bfloat16) + b

    @jax.jit
    def conv_wonly(x, w_q, b):
        wd = (w_q.astype(jnp.bfloat16)
              * w_s.astype(jnp.bfloat16))
        y = jax.lax.conv_general_dilated(
            x, wd, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=DN3)
        return y + b

    out = {"A_bf16": bench(conv_bf16, x, w, b)}
    try:
        out["B_w8a8"] = bench(conv_int8, x, w_q, b)
    except Exception as e:
        out["B_w8a8"] = f"FAIL {type(e).__name__}: {e}"
    try:
        out["C_wonly"] = bench(conv_wonly, x, w_q, b)
    except Exception as e:
        out["C_wonly"] = f"FAIL {type(e).__name__}: {e}"
    print(label, {k: (round(v, 2) if isinstance(v, float) else v)
                  for k, v in out.items()}, flush=True)
    return out


if __name__ == "__main__":
    # decoder level shapes at 480x832 (channels-last, streaming step):
    # z 16ch 60x104 -> conv_in 384 -> mid 384 @60x104 -> up 384 @120x208
    # -> 192 @240x416 -> 96 @480x832 -> conv_out 3
    run(384, 384, 60, 104, "lvl0 384->384 @60x104 ")
    run(384, 384, 120, 208, "lvl1 384->384 @120x208")
    run(384, 192, 240, 416, "lvl2 384->192 @240x416")
    run(192, 96, 480, 832, "lvl3 192->96  @480x832")
    run(96, 96, 480, 832, "lvl4 96->96   @480x832")
