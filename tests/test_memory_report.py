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
