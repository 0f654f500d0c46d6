"""v5e-8 50-step clip projection (VERDICT r4 item 2 / weak #2).

Makes the ≤30 s north-star claim defensible in two parts:
 1. AOT-compile (chipless v5e:2x4 topology, real TPU compiler) the two
    sharded programs the projection assumes: the sp=8 ring-sharded 1.3B
    CFG denoise step and the 8-way W-sharded streaming VAE decode, and
    report per-chip memory — proving the programs exist and fit.
 2. An analytic per-stage latency projection from MEASURED single-chip
    stage times (bench.py p50s) and the 8-way sharding factors, with
    explicit overhead assumptions (ring KV ppermute, conv halo
    exchanges) — since only one real chip is reachable here.

Writes REPORTS/v5e8_projection.json and prints a summary.
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# ---- measured single-chip stage times (ms), from bench.py on the real
# v5e (BENCH_r04 / this round's rerun). Update alongside bench runs.
MEASURED = {
    "p50_cfg_step_ms_fp32": 3955.7,      # reference-parity residual
    "p50_cfg_step_ms_fast": 3850.9,      # bf16 residual (serving default)
    "p50_cfg_step_ms_int8": 3631.5,      # + W8A8 DiT GEMMs (opt-in)
    "vae_decode_81f_ms": 4861.5,
    "t5_encode_512tok_ms": 78.8,
}

# ---- projection assumptions (explicit; see REPORTS/perf_r4.md §1) ----
# DiT: compute scales 1/8 on sp=8 (attention FLOPs split exactly; GEMMs
# batch-token-parallel). Ring adds n_dev-1 KV ppermutes per attention:
# KV bytes/chip/layer = 2*(32768*1536*2B)/8 = 24.6 MB; at ~45 GB/s/link
# ICI that is ~0.55 ms x 30 layers x 2 (self KV rotate) ≈ 33 ms/step
# — but hop latency overlaps the per-chunk kernel; we budget a flat 10%.
DIT_SP_OVERHEAD = 1.10
# VAE decode: convs are W-local; 8-way W sharding divides conv+copy work
# by 8 with 1-column halos per 3x3 conv each side (~2/104 columns ≈ 2%
# extra compute) plus exchange latency; we budget 25% (perf_r4 §1
# projected 0.7–1.0 s from the same analysis).
VAE_W_OVERHEAD = 1.25
STEPS = 50


def project(measured=MEASURED):
    out = {}
    for mode in ("fp32", "fast", "int8"):
        step = measured[f"p50_cfg_step_ms_{mode}"] / 8 * DIT_SP_OVERHEAD
        dec = measured["vae_decode_81f_ms"] / 8 * VAE_W_OVERHEAD
        e2e = measured["t5_encode_512tok_ms"] + STEPS * step + dec
        out[mode] = {
            "denoise_step_ms": round(step, 1),
            "decode_ms": round(dec, 1),
            "e2e_50step_ms": round(e2e, 1),
            "meets_30s_budget": bool(e2e <= 30_000.0),
        }
    return out


def aot_compile_programs():
    """Chipless AOT of the two sharded programs; returns memory stats."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omnihuman_tpu.parallel.memory_report import (
        V5E_HBM_BYTES, _compile_stats, analyze_pipeline_cfg_step,
        topology_mesh)

    stats = {}
    # (a) sp=8 ring-sharded CFG denoise step (the ACTUAL pipeline step)
    stats["dit_cfg_step_sp8"] = analyze_pipeline_cfg_step(
        "t2v-1.3B", (832, 480), 81,
        mesh_shape={"data": 1, "fsdp": 1, "sp": 8}, batch=1,
        cfg_mode="fused")

    # (b) 8-way W-sharded streaming VAE decode
    from omnihuman_tpu.configs import WAN_CONFIGS
    from omnihuman_tpu.models.vae import init_vae, vae_decode

    cfg = WAN_CONFIGS["t2v-1.3B"]
    mesh = topology_mesh({"data": 1, "fsdp": 1, "sp": 8})
    sharding = NamedSharding(mesh, P(None, None, None, "sp", None))
    params_shape = jax.eval_shape(
        lambda: jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                             init_vae(jax.random.key(0), cfg.vae)))
    z = jax.ShapeDtypeStruct((1, 16, 21, 60, 104), jnp.bfloat16)
    repl = NamedSharding(mesh, P())
    dec = jax.jit(
        lambda p, z: vae_decode(p, z, cfg.vae, streaming=True,
                                conv_impl="xla",
                                spatial_sharding=sharding),
        in_shardings=(jax.tree.map(lambda _: repl, params_shape), repl))
    from omnihuman_tpu.parallel.mesh import use_mesh
    with use_mesh(mesh):
        s = _compile_stats(dec.lower(params_shape, z))
    s["fits_v5e"] = (s["peak_bytes"] < V5E_HBM_BYTES
                     and not s.get("oom", False))
    stats["vae_decode_w8"] = s
    return stats


def main():
    do_aot = "--no-aot" not in sys.argv
    result = {"measured_single_chip_ms": MEASURED,
              "assumptions": {
                  "dit_sp8_overhead": DIT_SP_OVERHEAD,
                  "vae_w8_overhead": VAE_W_OVERHEAD,
                  "steps": STEPS,
                  "note": "projection, NOT a multi-chip measurement; "
                          "single real chip reachable (CLAUDE.md)"},
              "projected_v5e8": project()}
    if do_aot:
        result["aot_v5e8"] = aot_compile_programs()
    os.makedirs("REPORTS", exist_ok=True)
    with open("REPORTS/v5e8_projection.json", "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result["projected_v5e8"], indent=1))
    if do_aot:
        for k, v in result["aot_v5e8"].items():
            print(k, "peak_gib", round(v.get("peak_gib", -1), 2),
                  "fits", v.get("fits_v5e"))


if __name__ == "__main__":
    main()
