"""Benchmark: Wan-1.3B denoise-step latency on the target config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

Workload: the repo's headline pipeline config — Wan2.1-T2V-1.3B,
480x832, 81 frames (latents [16,21,60,104], 32760 tokens), one
classifier-free-guidance denoise step (cond+uncond fused in one batch-2
forward), bf16, single chip.

Baseline for vs_baseline: BASELINE.json's north star — a 5 s clip
(81f @ 50 steps) in <= 30 s on v5e-8 → 30*8/50 = 4.8 chip-seconds per
CFG step. vs_baseline = 4800 / measured_ms (>1 beats the target).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _device_watchdog(timeout_s: float = None):
    """Fail loudly (one JSON line) instead of hanging forever if the TPU
    tunnel is down — device init normally takes seconds; an outage makes
    `jax.devices()` block indefinitely (observed 2026-08-17). The probe
    thread keeps blocking inside jax.devices(), so the wait below doubles
    as a retry window: if the tunnel comes back any time before the
    deadline, the bench proceeds normally."""
    if timeout_s is None:
        timeout_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT", 1800.0))
    import threading

    done = threading.Event()

    def probe():
        import jax
        jax.devices()
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(json.dumps({
            "metric": "p50 CFG denoise-step latency, Wan-1.3B "
                      "480x832x81f (32760 tok), 1 chip",
            "value": None,
            "unit": "ms",
            "vs_baseline": None,
            "extra": {"error": f"TPU device init exceeded {timeout_s:.0f}s"
                               " (tunnel down?)"},
        }), flush=True)
        os._exit(2)


def main():
    _device_watchdog()
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from omnihuman_tpu.configs import WAN_CONFIGS
    from omnihuman_tpu.models.wan_dit import init_wan_model, wan_model_forward
    from omnihuman_tpu.ops.rope import rope_angles_3d

    cfg = WAN_CONFIGS["t2v-1.3B"]
    frames, h, w = 21, 60, 104          # 81 pixel frames @ 81f 480x832
    grid = (21, 30, 52)
    # 32760 tokens padded to the kernel's 1024-block like the pipeline
    # (WanT2V.seq_len_for) — skips the kernel-internal pad copies
    seq_len = -(-(grid[0] * grid[1] * grid[2]) // 1024) * 1024  # 32768
    extra = {}

    # --- on-chip TRAINING measurement (VERDICT r4 item 1): the jitted
    # stage-1 distill step (fwd+bwd+AdamW+EMA, apt/distill.py) at the
    # reference's own distill geometry — Wan-1.3B, latents [16,1,60,104],
    # seq 1560 (distilled_trainer.py:241-316; BASELINE.md 'Distillation
    # target config'). The 81f geometry does NOT fit one v5e for
    # training (AOT: 20.4 GiB peak with grouped remat; it trains on the
    # mesh — REPORTS/memory_14B.md distill rows); state peaks at
    # 14.3 GiB here so it runs FIRST and is freed before serving params.
    try:
        import functools

        from omnihuman_tpu.apt.distill import (
            distill_train_step, init_distill_state, make_optimizer)

        opt = make_optimizer()
        t_grid = (1, 30, 52)
        t_seq = 1560
        t_sin, t_cos = rope_angles_3d(t_grid, cfg.model.head_dim,
                                      seq_len=t_seq)
        t_state = jax.jit(lambda k: init_distill_state(
            jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                         init_wan_model(k, cfg.model)), opt)
        )(jax.random.key(10))
        jax.block_until_ready(t_state.params)

        @jax.jit
        def make_train_batch(key):
            kn, kc, kv = jax.random.split(key, 3)
            noise = jax.random.normal(kn, (1, 16, 1, 60, 104), jnp.float32)
            x0 = 0.5 * jax.random.normal(kv, noise.shape, jnp.float32)
            return {"noise": noise, "v_teacher": noise - x0,
                    "context": 0.1 * jax.random.normal(
                        kc, (1, cfg.text_len, cfg.t5.dim), jnp.bfloat16)}

        t_batch = make_train_batch(jax.random.key(11))
        jax.block_until_ready(t_batch)
        t_step = jax.jit(functools.partial(
            distill_train_step, optimizer=opt, cfg=cfg.model,
            seq_len=t_seq, rope_sin=t_sin, rope_cos=t_cos,
            policy=cfg.policy, remat=True), donate_argnums=(0,))
        t_state, m = t_step(t_state, t_batch)
        float(m["loss"])                    # compile + sync
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            t_state, m = t_step(t_state, t_batch)
            float(m["loss"])
            ts.append((time.perf_counter() - t0) * 1e3)
        d_ms = float(np.percentile(ts, 50))
        extra["distill_step_ms"] = round(d_ms, 1)
        extra["train_tokens_per_sec"] = round(1560 / (d_ms / 1e3), 1)
        del t_state, t_batch, t_step
    except Exception as e:
        extra["distill_error"] = f"{type(e).__name__}: {e}"

    init = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_wan_model(k, cfg.model)))
    params = init(jax.random.key(0))
    jax.block_until_ready(params)

    sin, cos = rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len)
    rng = np.random.default_rng(0)
    # CFG fused: batch 2 = (cond, uncond)
    x = jnp.asarray(rng.normal(size=(2, 16, frames, h, w)), jnp.bfloat16)
    t = jnp.full((2,), 999.0, jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(2, 512, 4096)) * 0.1, jnp.bfloat16)

    @jax.jit
    def cfg_step(params, x, t, ctx):
        v = wan_model_forward(params, x, t, ctx, cfg=cfg.model,
                              seq_len=seq_len, rope_sin=sin, rope_cos=cos,
                              remat=False)
        vc, vu = jnp.split(v, 2, axis=0)
        return vu + 5.0 * (vc - vu)

    # NOTE: on this backend block_until_ready() does not truly block
    # (queue-depth-1 backpressure); a scalar fetch is the honest sync.
    float(jnp.sum(cfg_step(params, x, t, ctx)[:, 0, 0, 0, 0]))

    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        v = cfg_step(params, x, t, ctx)
        float(jnp.sum(v[:, 0, 0, 0, 0]))
        times.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(times, 50))

    # --- extra serving metrics (VERDICT r2 item 5): VAE streaming decode
    # and the APT one-step (batch-1, no CFG) DiT forward ---
    try:
        # serving fast mode (--precision fast, the generate-CLI default):
        # bf16 residual stream, pixel-gated at PSNR 39.8 dB / SSIM 0.989
        # vs fp32 (REPORTS/perf_r4.md §6). The headline stays the
        # fp32-residual reference-parity step for round-over-round
        # comparability.
        import dataclasses

        from omnihuman_tpu.configs.wan import DTypePolicy

        fast_policy = dataclasses.replace(DTypePolicy(),
                                          residual=jnp.bfloat16)

        @jax.jit
        def cfg_step_fast(params, x, t, ctx):
            v = wan_model_forward(params, x, t, ctx, cfg=cfg.model,
                                  seq_len=seq_len, rope_sin=sin,
                                  rope_cos=cos, policy=fast_policy,
                                  remat=False)
            vc, vu = jnp.split(v, 2, axis=0)
            return vu + 5.0 * (vc - vu)

        float(jnp.sum(cfg_step_fast(params, x, t, ctx)[:, 0, 0, 0, 0]))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(cfg_step_fast(params, x, t, ctx)[:, 0, 0, 0, 0]))
            ts.append((time.perf_counter() - t0) * 1e3)
        extra["p50_cfg_step_fast_precision_ms"] = round(
            float(np.percentile(ts, 50)), 1)

        # int8 serving mode (--precision int8, opt-in): W8A8 block GEMMs
        # on the MXU over the bf16 residual stream; pixel-gated at
        # PSNR 39.3 dB / SSIM 0.998 vs fp32 (REPORTS/perf_r4.md §7).
        from omnihuman_tpu.ops.quant import quantize_wan_params

        params_q = jax.jit(quantize_wan_params)(params)
        jax.block_until_ready(params_q)
        float(jnp.sum(cfg_step_fast(params_q, x, t, ctx)[:, 0, 0, 0, 0]))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(cfg_step_fast(params_q, x, t, ctx)
                          [:, 0, 0, 0, 0]))
            ts.append((time.perf_counter() - t0) * 1e3)
        extra["p50_cfg_step_int8_ms"] = round(
            float(np.percentile(ts, 50)), 1)
        del params_q
    except Exception as e:
        extra["fast_mode_error"] = f"{type(e).__name__}: {e}"
    try:
        from omnihuman_tpu.models.vae import init_vae, vae_decode

        @jax.jit
        def one_step(params, x1, t1, ctx1):
            return wan_model_forward(params, x1, t1, ctx1, cfg=cfg.model,
                                     seq_len=seq_len, rope_sin=sin,
                                     rope_cos=cos, remat=False)

        x1, t1, ctx1 = x[:1], t[:1], ctx[:1]
        float(jnp.sum(one_step(params, x1, t1, ctx1)[:, 0, 0, 0, 0]))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(one_step(params, x1, t1, ctx1)[:, 0, 0, 0, 0]))
            ts.append((time.perf_counter() - t0) * 1e3)
        extra["apt_one_step_dit_ms"] = round(
            float(np.percentile(ts, 50)), 1)

        vae_params = jax.jit(lambda k: jax.tree.map(
            lambda v: v.astype(jnp.bfloat16),
            init_vae(k, cfg.vae)))(jax.random.key(1))
        jax.block_until_ready(vae_params)
        z = jnp.asarray(rng.normal(size=(1, 16, frames, h, w)),
                        jnp.bfloat16)
        dec = jax.jit(lambda p, z: vae_decode(p, z, cfg.vae,
                                              streaming=True))
        float(jnp.sum(dec(vae_params, z)[:, 0, 0, 0, 0]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(dec(vae_params, z)[:, 0, 0, 0, 0]))
            ts.append((time.perf_counter() - t0) * 1e3)
        extra["vae_decode_81f_480x832_ms"] = round(
            float(np.percentile(ts, 50)), 1)

        # --- north star (BASELINE.json; VERDICT r3 item 2): end-to-end
        # one-step clip time = T5 encode + one-step DiT + VAE decode
        # (the reference's staged timings, wan_inference.py:94-178), and
        # the derived frames/sec/chip for the 81-frame clip. T5 runs
        # after the DiT params are freed — exactly the serving pipeline's
        # lazy-init/unload_t5 memory discipline (umt5-xxl bf16 is
        # ~11.4 GB; it does not coexist with a resident DiT on one v5e).
        del params, x, ctx, x1, ctx1

        # --- i2v branch on silicon (VERDICT r4 item 8): the mask+ref
        # channel concat (in_dim 36) + 257 CLIP tokens in cross-attn at
        # 1.3B dims — 14B doesn't fit one chip, so a 1.3B-dim i2v
        # variant exercises the branch (reference image2video.py:129-350)
        import dataclasses as _dc

        icfg = _dc.replace(cfg.model, model_type="i2v", in_dim=36)
        i_params = jax.jit(lambda k: jax.tree.map(
            lambda v: v.astype(jnp.bfloat16),
            init_wan_model(k, icfg)))(jax.random.key(3))
        jax.block_until_ready(i_params)
        xi = jnp.asarray(rng.normal(size=(2, 16, frames, h, w)),
                         jnp.bfloat16)
        yi = jnp.asarray(rng.normal(size=(2, 20, frames, h, w)),
                         jnp.bfloat16)
        clip_fea = jnp.asarray(rng.normal(size=(2, 257, 1280)) * 0.1,
                               jnp.bfloat16)
        ctx_i = jnp.asarray(rng.normal(size=(2, 512, 4096)) * 0.1,
                            jnp.bfloat16)
        ti = jnp.full((2,), 999.0, jnp.float32)

        @jax.jit
        def i2v_cfg_step(p, x, t, c, y, cf):
            v = wan_model_forward(p, x, t, c, cfg=icfg, seq_len=seq_len,
                                  rope_sin=sin, rope_cos=cos, y=y,
                                  clip_fea=cf, remat=False)
            vc, vu = jnp.split(v, 2, axis=0)
            return vu + 5.0 * (vc - vu)

        float(jnp.sum(i2v_cfg_step(i_params, xi, ti, ctx_i, yi,
                                   clip_fea)[:, 0, 0, 0, 0]))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(i2v_cfg_step(i_params, xi, ti, ctx_i, yi,
                                       clip_fea)[:, 0, 0, 0, 0]))
            ts.append((time.perf_counter() - t0) * 1e3)
        extra["i2v_cfg_step_ms"] = round(float(np.percentile(ts, 50)), 1)
        del i_params, xi, yi, clip_fea, ctx_i

        from omnihuman_tpu.models.t5 import init_t5_encoder, t5_encode

        t5_params = jax.jit(lambda k: jax.tree.map(
            lambda v: v.astype(jnp.bfloat16),
            init_t5_encoder(k, cfg.t5)))(jax.random.key(2))
        jax.block_until_ready(t5_params)
        ids = jnp.asarray(rng.integers(0, cfg.t5.vocab_size,
                                       size=(1, cfg.text_len)), jnp.int32)
        msk = jnp.ones((1, cfg.text_len), jnp.int32)
        enc = jax.jit(lambda p, i, m: t5_encode(p, i, m, cfg.t5))
        float(jnp.sum(enc(t5_params, ids, msk)[:, 0, 0]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(enc(t5_params, ids, msk)[:, 0, 0]))
            ts.append((time.perf_counter() - t0) * 1e3)
        extra["t5_encode_512tok_ms"] = round(float(np.percentile(ts, 50)),
                                             1)

        e2e_ms = (extra["t5_encode_512tok_ms"]
                  + extra["apt_one_step_dit_ms"]
                  + extra["vae_decode_81f_480x832_ms"])
        extra["e2e_one_step_clip_ms"] = round(e2e_ms, 1)
        extra["frames_per_sec_chip"] = round(81.0 / (e2e_ms / 1e3), 2)
        # 50-step clip derived from the measured p50 CFG step (staged sum;
        # a literal 50-step run is ~200 s and adds no information)
        extra["e2e_50step_clip_ms_derived"] = round(
            extra["t5_encode_512tok_ms"] + 50 * p50
            + extra["vae_decode_81f_480x832_ms"], 1)
        # v5e-8 PROJECTION (VERDICT r4 item 2; NOT a measurement — one
        # real chip here): sp=8 ring DiT (/8, +10% ring budget) +
        # 8-way W-sharded decode (/8, +25% halo budget) + replicated T5.
        # Both sharded programs AOT-compile and fit the chipless v5e:2x4
        # topology — see _v5e8_projection.py / REPORTS/v5e8_projection.json
        step8 = (extra.get("p50_cfg_step_fast_precision_ms", p50)
                 / 8 * 1.10)
        dec8 = extra["vae_decode_81f_480x832_ms"] / 8 * 1.25
        extra["e2e_50step_v5e8_projected_ms"] = round(
            extra["t5_encode_512tok_ms"] + 50 * step8 + dec8, 1)
        extra["v5e8_projection_note"] = (
            "projected from single-chip p50s (fast precision); "
            "assumptions in REPORTS/v5e8_projection.json")
    except Exception as e:          # extras must never break the bench
        extra["error"] = f"{type(e).__name__}: {e}"

    target_ms = 30_000.0 * 8 / 50      # 4800 chip-ms per CFG step
    print(json.dumps({
        "metric": "p50 CFG denoise-step latency, Wan-1.3B 480x832x81f "
                  "(32760 tok), 1 chip",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(target_ms / p50, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
