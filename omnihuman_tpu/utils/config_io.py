"""Unified config system: YAML + argparse merge + interpolation.

The reference uses three overlapping systems (SURVEY §5.6): EasyDict
registries, OmegaConf YAML merged into unset argparse fields
(distilled_trainer.py:376-382), and hardcoded Python config classes.
Here one loader covers the YAML side:

  - `load_yaml(path)` → nested AttrDict with ${a.b} interpolation
    (the subset omni_config.yaml uses, ":67-70")
  - `merge_args(cfg, args)` → YAML fills argparse fields left at None
    (same precedence as the reference: CLI wins when explicitly set)
  - `save_snapshot(cfg, run_dir)` → config copy in the run directory
    (omnihuman_trainer.py:61)
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import re
from typing import Any, Dict, Optional


class AttrDict(dict):
    """dict with attribute access (EasyDict/OmegaConf-lite)."""

    def __getattr__(self, name):
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return v

    def __setattr__(self, name, value):
        self[name] = value

    def get_path(self, dotted: str, default=None):
        cur: Any = self
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur


def _wrap(obj):
    if isinstance(obj, dict):
        return AttrDict({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


_INTERP = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _interpolate(node, root):
    if isinstance(node, dict):
        return AttrDict({k: _interpolate(v, root) for k, v in node.items()})
    if isinstance(node, list):
        return [_interpolate(v, root) for v in node]
    if isinstance(node, str):
        def sub(m):
            val = root.get_path(m.group(1))
            return str(val) if val is not None else m.group(0)
        full = _INTERP.fullmatch(node)
        if full:
            val = root.get_path(full.group(1))
            return val if val is not None else node
        return _INTERP.sub(sub, node)
    return node


def load_yaml(path: str) -> AttrDict:
    import yaml
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = _wrap(raw)
    return _interpolate(cfg, cfg)


def merge_args(cfg: Dict[str, Any],
               args: argparse.Namespace) -> argparse.Namespace:
    """Fill argparse fields that are None from the (flat) config
    (reference distilled_trainer.py:376-382 semantics)."""
    for k, v in vars(args).items():
        if v is None and k in cfg:
            setattr(args, k, cfg[k])
    return args


def save_snapshot(cfg: Dict[str, Any], run_dir: str,
                  name: str = "config_snapshot.yaml") -> str:
    import yaml
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, name)

    def plain(o):
        if isinstance(o, dict):
            return {k: plain(v) for k, v in o.items()}
        if isinstance(o, list):
            return [plain(v) for v in o]
        return o

    with open(path, "w") as f:
        yaml.safe_dump(plain(dict(cfg)), f, sort_keys=False,
                       allow_unicode=True)
    return path
