"""Minimal XPlane (jax.profiler trace) op-stats summarizer.

`jax.profiler.trace` writes `.xplane.pb` protos; the usual viewers
(tensorboard_plugin_profile / xprof) are version-broken in this image, so
this parses the proto directly (via tensorflow's bundled xplane_pb2) and
aggregates per-op self time on the device planes — enough to answer
"where does the step time go" without a UI.

Usage:
    from omnihuman_tpu.utils.xplane import device_op_stats, print_op_stats
    with jax.profiler.trace("/tmp/trace"):
        ...
    print_op_stats(device_op_stats("/tmp/trace"), top=30)

The reference ships no profiler tooling at all (its README points at
nsight); this is the TPU-native equivalent of a CUDA kernel-time table.
"""

from __future__ import annotations

import collections
import dataclasses
import glob
import re
from typing import Dict, List, Optional


@dataclasses.dataclass
class OpStat:
    name: str
    category: str
    total_ms: float = 0.0
    count: int = 0


_CATEGORY_RULES = [
    ("fusion", "fusion"),
    ("custom-call", "custom_call"),  # Pallas kernels / Mosaic
    ("convolution", "conv"),
    ("dot", "matmul"),
    ("copy", "copy"),
    ("transpose", "transpose"),
    ("all-reduce", "collective"),
    ("all-gather", "collective"),
    ("reduce-scatter", "collective"),
    ("collective-permute", "collective"),
    ("dynamic-update-slice", "dus"),
    ("dynamic-slice", "ds"),
    ("reduce", "reduce"),
    ("while", "control"),
]


def _categorize(name: str) -> str:
    base = name.split(".")[0]
    for pat, cat in _CATEGORY_RULES:
        if pat in base:
            return cat
    return base or "other"


def _strip_uid(name: str) -> str:
    """fusion.1234 → fusion; %dot.5 → dot (group repeats of the same op)."""
    return re.sub(r"\.\d+$", "", name.lstrip("%"))


def device_op_stats(trace_dir: str,
                    merge: bool = True) -> List[OpStat]:
    """Aggregate event durations per op name across all device planes.

    Device-plane lines in an XLA trace are flat per-core op timelines
    (one event per executed HLO), so total duration == self time. Host
    planes (python, runtime threads) are skipped.

    merge=True groups ops differing only in a numeric uid suffix
    (fusion.1/fusion.23 → 'fusion'): per-call-site grouping survives via
    distinct base names XLA assigns per computation.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")

    agg: Dict[str, OpStat] = {}
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            pname = plane.name.lower()
            if not ("tpu" in pname or "gpu" in pname or "device" in pname):
                continue
            if "host" in pname:
                continue
            emeta = plane.event_metadata
            for line in plane.lines:
                lname = line.name.lower()
                # keep op timelines; skip step/queue/annotation lines
                if "step" in lname or "queue" in lname:
                    continue
                for ev in line.events:
                    meta = emeta.get(ev.metadata_id)
                    name = meta.name if meta else str(ev.metadata_id)
                    key = _strip_uid(name) if merge else name
                    st = agg.get(key)
                    if st is None:
                        st = agg[key] = OpStat(key, _categorize(key))
                    st.total_ms += ev.duration_ps / 1e9
                    st.count += 1
    return sorted(agg.values(), key=lambda s: -s.total_ms)


def category_stats(stats: List[OpStat]) -> Dict[str, float]:
    cat = collections.defaultdict(float)
    for s in stats:
        cat[s.category] += s.total_ms
    return dict(sorted(cat.items(), key=lambda kv: -kv[1]))


def print_op_stats(stats: List[OpStat], top: int = 30,
                   file=None) -> None:
    total = sum(s.total_ms for s in stats)
    print(f"total device op time: {total:.1f} ms", file=file)
    print(f"{'op':<56} {'ms':>9} {'%':>6} {'n':>6}", file=file)
    for s in stats[:top]:
        print(f"{s.name[:56]:<56} {s.total_ms:>9.2f} "
              f"{100 * s.total_ms / max(total, 1e-9):>5.1f}% {s.count:>6}",
              file=file)
    print("\nby category:", file=file)
    for cat, ms in category_stats(stats).items():
        print(f"  {cat:<16} {ms:>9.2f} ms "
              f"{100 * ms / max(total, 1e-9):>5.1f}%", file=file)
