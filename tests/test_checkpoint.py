"""Checkpoint manager tests (orbax-backed save/restore/resume)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.apt.distill import (
    init_distill_state, make_optimizer)
from omnihuman_tpu.utils.checkpoint import CheckpointManager


def _tiny_state():
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros((3,))}
    opt = make_optimizer(lr=1e-3)
    return init_distill_state(params, opt), opt


def test_save_restore_roundtrip(tmp_path):
    state, _ = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ck"), async_save=False)
    mgr.save(10, state, metadata={"stage": 1})
    mgr.wait()
    assert mgr.latest_step() == 10

    blank, _ = _tiny_state()
    restored = mgr.restore(target=blank)
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(state.params["w"]))
    assert int(restored.step) == 0
    mgr.close()


def test_multiple_steps_and_latest(tmp_path):
    state, _ = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ck2"), max_to_keep=2,
                            async_save=False)
    for s in (1, 2, 3):
        mgr.save(s, state)
    mgr.wait()
    assert mgr.latest_step() == 3
    # retention: oldest dropped
    assert len(mgr.all_steps()) <= 2
    mgr.close()


def test_restore_empty_returns_none(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"), async_save=False)
    assert mgr.restore() is None
    assert mgr.latest_step() is None
    mgr.close()
