"""Runnable APT / f-distill training CLIs (reference apt_trainer.py:379-489,
f_distilled_trainer.py:353-444): phase sequencing, checkpoint cadence,
metrics on disk, resume."""

import json
import os
import shutil

import numpy as np
import pytest

from omnihuman_tpu.cli import train_apt, train_f_distill
from omnihuman_tpu.utils.checkpoint import CheckpointManager

N, Z, F, H, W = 4, 16, 1, 4, 4   # tiny-test latent geometry
TEXT_LEN, TEXT_DIM = 16, 32


@pytest.fixture(scope="module")
def teacher_npz(tmp_path_factory):
    """Teacher artifact with the exact keys generate.py:248-259 stores."""
    d = tmp_path_factory.mktemp("teacher")
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(N, Z, F, H, W)).astype(np.float32)
    v = (rng.normal(size=(N, Z, F, H, W)) * 0.1).astype(np.float32)
    ctx = (rng.normal(size=(N, TEXT_LEN, TEXT_DIM)) * 0.1).astype(np.float32)
    neg = (rng.normal(size=(TEXT_LEN, TEXT_DIM)) * 0.1).astype(np.float32)
    path = str(d / "teacher.npz")
    np.savez(path, dummy_data=noise, noise=noise,
             dummy_prompts=np.asarray(["p"] * N), positive_contexts=ctx,
             negative_context=neg, v_teacher=v)
    return path


def _metrics_records(out_dir):
    recs = []
    for f in os.listdir(out_dir):
        if f.startswith("metrics_") and f.endswith(".jsonl"):
            with open(os.path.join(out_dir, f)) as fh:
                recs += [json.loads(l) for l in fh if l.strip()]
    return recs


def test_train_apt_cli_phases_checkpoints_resume(teacher_npz, tmp_path):
    out = str(tmp_path / "apt")
    argv = ["--task", "tiny-test", "--data_path", teacher_npz,
            "--output_dir", out, "--batch_size", "2",
            "--image_updates", "3", "--video_updates", "2",
            "--save_interval", "2", "--seed", "0"]
    train_apt.main(argv)

    ckpt = CheckpointManager(out)
    # image cadence @2, image final @3, video final @5 (offset 3 + 2);
    # video cadence @2 is suppressed because it coincides with the final
    assert ckpt.all_steps() == [2, 3, 5]
    assert ckpt.restore_metadata(3) == {
        "phase": "image", "update": 3, "final": True}
    assert ckpt.restore_metadata(5)["phase"] == "video"
    recs = _metrics_records(out)
    assert len(recs) == 5  # one per update, both phases
    assert all(np.isfinite(r["g_loss"]) for r in recs)
    ckpt.close()

    # resume after completion → early exit, nothing new written
    train_apt.main(argv + ["--resume"])
    ckpt = CheckpointManager(out)
    assert ckpt.all_steps() == [2, 3, 5]
    ckpt.close()

    # crash simulation: drop the video-final checkpoint; latest is now the
    # image final → resume performs the EMA handoff and re-runs the video
    # phase to completion
    for name in os.listdir(out):
        full = os.path.join(out, name)
        if os.path.isdir(full) and name.lstrip("step_0") in ("5",):
            shutil.rmtree(full)
    ckpt = CheckpointManager(out)
    assert ckpt.latest_step() == 3
    ckpt.close()
    train_apt.main(argv + ["--resume"])
    ckpt = CheckpointManager(out)
    assert ckpt.latest_step() == 5
    assert ckpt.restore_metadata(5) == {
        "phase": "video", "update": 2, "final": True}
    ckpt.close()


def test_train_f_distill_cli(teacher_npz, tmp_path):
    out = str(tmp_path / "fd")
    argv = ["--task", "tiny-test", "--data_path", teacher_npz,
            "--output_dir", out, "--batch_size", "2", "--num_epochs", "2",
            "--save_interval", "2", "--learning_rate", "1e-4",
            "--f_divergence", "jensen-shannon"]
    train_f_distill.main(argv)

    ckpt = CheckpointManager(out)
    # 4 samples / bsz 2 → 2 steps per epoch → saves @2 and @4
    assert ckpt.all_steps() == [2, 4]
    assert ckpt.restore_metadata(4)["epoch"] == 1
    recs = _metrics_records(out)
    assert recs and all(np.isfinite(r["loss"]) for r in recs)
    assert all(np.isfinite(r["density_ratio_mean"]) for r in recs)
    ckpt.close()

    # resume: no further epochs pending → no new checkpoints
    train_f_distill.main(argv + ["--resume"])
    ckpt = CheckpointManager(out)
    assert ckpt.all_steps() == [2, 4]
    ckpt.close()


def test_train_f_distill_no_discriminator(teacher_npz, tmp_path):
    out = str(tmp_path / "fd_nod")
    train_f_distill.main(
        ["--task", "tiny-test", "--data_path", teacher_npz,
         "--output_dir", out, "--batch_size", "2", "--num_epochs", "1",
         "--save_interval", "10", "--use_discriminator", "false"])
    recs = _metrics_records(out)
    assert recs and all(r["d_loss"] == 0.0 for r in recs)
    assert all(r["density_ratio_mean"] == 1.0 for r in recs)
