"""Checkpoint IO — Orbax-backed save/restore of train-state PyTrees.

Capability parity with the reference's checkpoint streams (SURVEY §5.4):
  - raw state-dict files for students/EMA (distilled_trainer.py:176-178,
    219-231)
  - composite dicts {model, optimizer, scheduler, step, stage, config}
    (omnihuman_trainer.py:185-211)
  - dual raw+EMA streams (distilled_trainer.py:152-232)
  - resume returning (step, stage) (omnihuman_trainer.py:486-494)

TPU-native: one async Orbax checkpointer over the whole state PyTree;
sharded arrays are saved/restored in place over the mesh (no host
gather), replacing torch.save round-trips.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    """Thin wrapper: save(step, state, metadata) / restore(step?) → state."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if _HAS_ORBAX:
            options = ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=async_save)
            self._mgr = ocp.CheckpointManager(self.directory, options=options)
        else:
            self._mgr = None
            self.max_to_keep = max_to_keep

    # -- orbax path ---------------------------------------------------------

    def save(self, step: int, state: Any,
             metadata: Optional[Dict] = None) -> None:
        if self._mgr is not None:
            args = ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                **({"metadata": ocp.args.JsonSave(metadata)}
                   if metadata else {}))
            self._mgr.save(step, args=args)
        else:  # numpy fallback
            path = os.path.join(self.directory, f"step_{step:08d}")
            os.makedirs(path, exist_ok=True)
            flat, treedef = jax.tree.flatten(state)
            np.savez(os.path.join(path, "state.npz"),
                     **{str(i): np.asarray(x) for i, x in enumerate(flat)})
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump({"metadata": metadata or {}}, f)

    def restore(self, step: Optional[int] = None,
                target: Any = None) -> Any:
        if self._mgr is not None:
            step = step if step is not None else self._mgr.latest_step()
            if step is None:
                return None
            kwargs = {}
            if target is not None:
                kwargs["args"] = ocp.args.Composite(
                    state=ocp.args.StandardRestore(target))
            out = self._mgr.restore(step, **kwargs)
            return out["state"]
        # numpy fallback
        steps = self.all_steps()
        if not steps:
            return None
        step = step if step is not None else steps[-1]
        path = os.path.join(self.directory, f"step_{step:08d}")
        data = np.load(os.path.join(path, "state.npz"))
        flat = [data[str(i)] for i in range(len(data.files))]
        if target is None:
            raise ValueError("numpy fallback restore requires `target`")
        treedef = jax.tree.structure(target)
        return jax.tree.unflatten(treedef, flat)

    def restore_metadata(self, step: Optional[int] = None) -> Optional[Dict]:
        """Read back the JSON metadata saved alongside `step` (None if the
        step exists but was saved without metadata). Powers (step, stage)
        resume (reference omnihuman_trainer.py:486-494)."""
        if self._mgr is not None:
            step = step if step is not None else self._mgr.latest_step()
            if step is None:
                return None
            try:
                out = self._mgr.restore(
                    step, args=ocp.args.Composite(
                        metadata=ocp.args.JsonRestore()))
                return out.get("metadata")
            except Exception:
                return None
        steps = self.all_steps()
        if not steps:
            return None
        step = step if step is not None else steps[-1]
        path = os.path.join(self.directory, f"step_{step:08d}", "meta.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f).get("metadata")

    def all_steps(self):
        if self._mgr is not None:
            return sorted(self._mgr.all_steps())
        return sorted(int(d.split("_")[1])
                      for d in os.listdir(self.directory)
                      if d.startswith("step_"))

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def wait(self):
        if self._mgr is not None:
            self._mgr.wait_until_finished()

    def close(self):
        if self._mgr is not None:
            self._mgr.close()
