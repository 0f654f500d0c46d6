"""Logging + device-memory telemetry + debug toggles.

Capability parity with reference logger.py (byte-identical in both
subprojects, SURVEY §2.7): console+file logger, third-party silencing,
memory telemetry (log_gpu_memory_usage/debug_memory, logger.py:134-205),
and the TorchDebugger anomaly tooling (logger.py:223-394).

TPU equivalents:
  - memory: jax.local_devices()[i].memory_stats() instead of
    torch.cuda.memory_allocated.
  - anomaly detection: jax_debug_nans / jax_debug_infs config toggles
    instead of torch.autograd.set_detect_anomaly.
  - tensor introspection: debug_tensor() works on any jax.Array.
"""

from __future__ import annotations

import contextlib
import logging
import os
import sys
from typing import Optional

_LOGGER: Optional[logging.Logger] = None


def get_logger(name: str = "omnihuman_tpu",
               log_file: Optional[str] = "project.log",
               level: int = logging.INFO) -> logging.Logger:
    global _LOGGER
    if _LOGGER is not None:
        return _LOGGER
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s: %(message)s")
    sh = logging.StreamHandler(sys.stderr)
    sh.setLevel(level)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    # silence noisy third parties (reference logger.py:44-55)
    for noisy in ("jax._src.xla_bridge", "absl", "urllib3", "filelock"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
    _LOGGER = logger
    return logger


logger = get_logger()


def log_device_memory(tag: str = "") -> dict:
    """Per-device HBM stats (replaces log_gpu_memory_usage,
    logger.py:134-148)."""
    import jax
    stats = {}
    for d in jax.local_devices():
        ms = d.memory_stats() or {}
        used = ms.get("bytes_in_use", 0) / 2 ** 30
        limit = ms.get("bytes_limit", 0) / 2 ** 30
        stats[str(d)] = (used, limit)
        logger.info(f"{tag} {d}: {used:.2f}/{limit:.2f} GiB in use")
    return stats


def debug_tensor(x, name: str = "tensor") -> dict:
    """Shape/dtype/stats/nan report (replaces TorchDebugger.debug_tensor,
    logger.py:259-290)."""
    import jax.numpy as jnp
    import numpy as np
    xf = jnp.asarray(x, jnp.float32)
    info = {
        "name": name, "shape": tuple(x.shape), "dtype": str(x.dtype),
        "min": float(jnp.min(xf)), "max": float(jnp.max(xf)),
        "mean": float(jnp.mean(xf)), "std": float(jnp.std(xf)),
        "has_nan": bool(jnp.isnan(xf).any()),
        "has_inf": bool(jnp.isinf(xf).any()),
    }
    logger.debug(f"{name}: {info}")
    return info


@contextlib.contextmanager
def anomaly_detection():
    """NaN/Inf trap context (replaces TorchDebugger anomaly mode,
    logger.py:371-378)."""
    import jax
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context — stage timers replacement for the
    reference's wall-clock prints (wan_inference.py:94-178, SURVEY §5.1)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Training-metrics sink (SURVEY §5.5): wandb when available
    (reference logs G/D/R1/distill losses + LR via wandb/accelerator.log),
    falling back to an append-only JSONL file — same call surface either
    way."""

    def __init__(self, project: str = "omnihuman-tpu",
                 run_name: Optional[str] = None,
                 out_dir: str = ".", config: Optional[dict] = None):
        self._wandb = None
        self._file = None
        try:
            import wandb
            self._wandb = wandb
            wandb.init(project=project, name=run_name,
                       config=config or {})
        except Exception:
            import os
            os.makedirs(out_dir, exist_ok=True)
            path = f"{out_dir}/metrics_{run_name or 'run'}.jsonl"
            self._file = open(path, "a")
            logger.info(f"wandb unavailable; metrics → {path}")

    def log(self, metrics: dict, step: Optional[int] = None):
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        else:
            import json
            import time as _time
            rec = {"step": step, "ts": _time.time(),
                   **{k: float(v) for k, v in metrics.items()
                      if isinstance(v, (int, float))
                      or hasattr(v, "item")}}
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
        elif self._file is not None:
            self._file.close()
