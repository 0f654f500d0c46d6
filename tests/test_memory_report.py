"""AOT memory-report tests (SURVEY §7.3 hard part 5).

Runs on the virtual CPU mesh (conftest) — the TPU chipless-topology
backend needs the libtpu plugin and is exercised by
scripts/memory_report.sh / REPORTS/memory_14B.md instead.
"""

import jax
import pytest

from omnihuman_tpu.parallel.memory_report import (
    analyze_cfg_step, latent_geometry)
from omnihuman_tpu.configs import WAN_CONFIGS


def test_latent_geometry_flagship():
    """720p/81f i2v-14B → 75600 tokens (SURVEY §7.3: 1280*720 → latents
    [16, 21, 90, 160] → (21, 45, 80) grid)."""
    cfg = WAN_CONFIGS["i2v-14B"]
    lat, grid, n = latent_geometry(cfg, (1280, 720), 81)
    assert lat == (16, 21, 90, 160)
    assert grid == (21, 45, 80)
    assert n == 75600


def test_latent_geometry_1_3b():
    cfg = WAN_CONFIGS["t2v-1.3B"]
    lat, grid, n = latent_geometry(cfg, (832, 480), 81)
    assert n == 32760  # the bench.py headline sequence length


@pytest.mark.parametrize("fused", [True, False])
def test_analyze_cfg_step_tiny(fused):
    """End-to-end AOT lower+compile+memory_analysis on the CPU mesh with
    the tiny config: stats present, sane, and fused CFG costs more temp
    than sequential."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    devs = jax.devices()[:8]
    stats = analyze_cfg_step(
        "tiny-test", size=(64, 64), frame_num=9,
        mesh_shape={"data": 2, "fsdp": 2, "sp": 2}, batch=1,
        backend="cpu", devices=devs, fused_cfg=fused)
    assert stats["peak_bytes"] > 0
    assert stats["seq_len"] % 2 == 0
    assert stats["fits_v5e"]  # tiny model must trivially fit
    assert not stats.get("oom", False)


@pytest.mark.parametrize("cfg_mode", ["fused", "sequential"])
def test_pipeline_step_aot_tiny(cfg_mode):
    """AOT lower+compile the ACTUAL pipeline jitted step (the callable
    cli/generate.py drives) over a mesh — validates the user-facing
    multi-chip serving path end-to-end (VERDICT r2 missing #1)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from omnihuman_tpu.parallel.memory_report import (
        analyze_pipeline_cfg_step)
    devs = jax.devices()[:8]
    stats = analyze_pipeline_cfg_step(
        "tiny-test", size=(64, 64), frame_num=9,
        mesh_shape={"data": 1, "fsdp": 4, "sp": 2}, batch=1,
        backend="cpu", devices=devs, cfg_mode=cfg_mode)
    assert stats["step"] == "pipeline_cfg_denoise"
    assert stats["peak_bytes"] > 0
    assert not stats.get("oom", False)


@pytest.mark.skipif("OMNIHUMAN_TPU_AOT" not in __import__("os").environ,
                    reason="chipless TPU topology compile (slow, needs "
                           "the libtpu plugin tunnel); set "
                           "OMNIHUMAN_TPU_AOT=1 to run")
def test_pipeline_step_aot_i2v14b_720p_tpu():
    """The headline serving claim, compiled for real: the ACTUAL i2v
    pipeline step at 14B/720p over v5e-8 fsdp4/sp2 with sequential CFG
    must fit inside the 15.75 GiB/chip HBM budget (REPORTS/memory_14B.md
    decision table)."""
    from omnihuman_tpu.parallel.memory_report import (
        analyze_pipeline_cfg_step)
    stats = analyze_pipeline_cfg_step(
        "i2v-14B", size=(1280, 720), frame_num=81,
        mesh_shape={"data": 1, "fsdp": 4, "sp": 2}, batch=1,
        backend="tpu", cfg_mode="sequential")
    assert stats["fits_v5e"], stats


def test_analyze_omni_step_tiny():
    """Omni conditioned train step AOT on the CPU mesh — validates the
    packed video+ref sequence pads to an sp-divisible length and the
    whole state/batch shards (VERDICT r2 missing #4)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from omnihuman_tpu.parallel.memory_report import analyze_omni_step
    devs = jax.devices()[:8]
    stats = analyze_omni_step(
        "tiny-test", size=(64, 64), frame_num=9,
        mesh_shape={"data": 1, "fsdp": 4, "sp": 2}, batch=1,
        backend="cpu", devices=devs, remat=2)
    assert stats["step"] == "omni_train"
    assert stats["peak_bytes"] > 0
    assert not stats.get("oom", False)
