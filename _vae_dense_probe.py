"""On-chip probe: dense (non-streaming) VAE decode vs streaming, plus a
real-TPU smoke of the new wav2vec/syncc/i3d modules (verify drive).

Dense decode kills the per-step cache-concat relayout copies that cost
~119 ms/step in the streaming trace (REPORTS/perf_r3.md) at the price
of holding full-length activations (~6.3 GB at 480x832x81f full-res
level) — this measures whether it fits and what it buys.
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

from omnihuman_tpu.configs.wan import VAEConfig
from omnihuman_tpu.models.vae import init_vae, vae_decode

rng = np.random.default_rng(0)
cfg = VAEConfig()
params = jax.jit(lambda k: jax.tree.map(
    lambda t: t.astype(jnp.bfloat16), init_vae(k, cfg)))(jax.random.key(0))
jax.block_until_ready(params)
z = jnp.asarray(rng.normal(size=(1, 16, 21, 60, 104)), jnp.bfloat16)

for label, kw in (
    ("dense", dict(streaming=False)),
    ("stream-fc1", dict(streaming=True, frame_chunk=1)),
):
    try:
        f = jax.jit(lambda p, z, kw=kw: vae_decode(p, z, cfg, **kw))
        t0 = time.perf_counter()
        out = f(params, z)
        float(jnp.sum(out[:, 0, 0, 0, 0]))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(f(params, z)[:, 0, 0, 0, 0]))
            ts.append(time.perf_counter() - t0)
        print(f"decode {label}: {np.median(ts)*1e3:.0f} ms "
              f"(compile {compile_s:.0f}s) out={out.shape}", flush=True)
    except Exception as e:
        print(f"decode {label}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)

# ---- new-module on-chip smoke (wav2vec / syncc / i3d) ----
from omnihuman_tpu.omni.wav2vec import WAV2VEC2_PRESETS, \
    Wav2Vec2AudioFeatures
from omnihuman_tpu.omni.syncc import SyncCEmbedders
from omnihuman_tpu.omni.i3d import I3DVideoFeatures

t0 = time.time()
feat = Wav2Vec2AudioFeatures(preset="base", dim=1024, fps=16.0)
wav = rng.normal(size=16000).astype(np.float32)
out = feat(wav, 16000, num_frames=16)
assert out.shape == (16, 1024) and np.isfinite(out).all()
print(f"wav2vec base on-chip: {out.shape} finite ({time.time()-t0:.0f}s)",
      flush=True)

t0 = time.time()
e = SyncCEmbedders(audio_dim=1024, seed=0)
video = rng.normal(size=(3, 16, 128, 128)).astype(np.float32).clip(-1, 1)
a = e.audio_embed_fn(out)
v = e.visual_embed_fn(video)
assert np.isfinite(a).all() and np.isfinite(v).all()
print(f"syncc on-chip: audio {a.shape} visual {v.shape} finite "
      f"({time.time()-t0:.0f}s)", flush=True)

t0 = time.time()
i3d = I3DVideoFeatures(preset="kinetics-400", batch_size=2)
vids = rng.normal(size=(2, 3, 16, 224, 224)).astype(np.float32).clip(-1, 1)
f = i3d(vids)
assert f.shape == (2, 1024) and np.isfinite(f).all()
print(f"i3d kinetics-400 dims on-chip: {f.shape} finite "
      f"({time.time()-t0:.0f}s)", flush=True)
print("ALL OK", flush=True)
