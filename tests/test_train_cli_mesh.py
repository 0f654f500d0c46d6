"""Mesh-orchestrated training CLIs (VERDICT r2 missing #2): every trainer
CLI must be able to BUILD its mesh from --fsdp_size/--sp_size, shard
state + batches, and run its jitted step through the ring/shard_map
attention path — on the virtual 8-device CPU mesh here, matching the
reference's --ulysses_size/--ring_size surface
(seaweed_apt/distilled_trainer.py:370-371) + FSDP (fsdp.py:10-32)."""

import numpy as np
import pytest

import jax

from omnihuman_tpu.utils.checkpoint import CheckpointManager

N, Z, F, H, W = 4, 16, 1, 4, 4   # tiny-test latent geometry
TEXT_LEN, TEXT_DIM = 16, 32

needs_mesh = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 devices")


@pytest.fixture(scope="module")
def teacher_npz(tmp_path_factory):
    d = tmp_path_factory.mktemp("teacher_mesh")
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


MESH_ARGS = ["--fsdp_size", "2", "--sp_size", "2"]  # data absorbs → 2


@needs_mesh
def test_put_batch_shards_pose_spatially():
    """Pose heatmaps [B,K,F,H,W] must shard H over sp: replicated fp32
    pose is GiB-scale at 308 kp full-res (the omni-14B AOT OOM driver);
    every other leaf shards on data only."""
    from omnihuman_tpu.parallel.train_mesh import TrainMeshPlan

    plan = TrainMeshPlan.from_sizes(fsdp_size=2, sp_size=2)
    batch = {
        "frames": np.zeros((2, 4, 1, 4, 4), np.float32),
        "pose": np.zeros((2, 8, 1, 4, 4), np.float32),
    }
    out = plan.put_batch(batch)
    pose_spec = out["pose"].sharding.spec
    assert pose_spec[3] == "sp" and pose_spec[0] == "data"
    assert out["frames"].sharding.spec[0] == "data"
    # odd H (not divisible by sp) falls back to data-only sharding
    odd = plan.put_batch({"pose": np.zeros((2, 8, 1, 5, 4), np.float32)})
    assert "sp" not in str(odd["pose"].sharding.spec)


@needs_mesh
def test_train_distill_cli_mesh(teacher_npz, tmp_path):
    from omnihuman_tpu.cli import train_distill
    out = str(tmp_path / "distill_mesh")
    train_distill.main([
        "--task", "tiny-test", "--data_path", teacher_npz,
        "--output_dir", out, "--batch_size", "2", "--num_epochs", "1",
        "--save_interval", "2", "--remat_group", "2"] + MESH_ARGS)
    ckpt = CheckpointManager(out)
    assert ckpt.latest_step() == 2  # 4 samples / batch 2 = 2 steps
    ckpt.close()


@needs_mesh
def test_train_distill_cli_mesh_rejects_bad_batch(teacher_npz, tmp_path):
    from omnihuman_tpu.cli import train_distill
    with pytest.raises(ValueError, match="divisible by the data"):
        train_distill.main([
            "--task", "tiny-test", "--data_path", teacher_npz,
            "--output_dir", str(tmp_path / "x"), "--batch_size", "1",
            "--num_epochs", "1"] + MESH_ARGS)


@needs_mesh
def test_train_apt_cli_mesh(teacher_npz, tmp_path):
    from omnihuman_tpu.cli import train_apt
    out = str(tmp_path / "apt_mesh")
    train_apt.main([
        "--task", "tiny-test", "--data_path", teacher_npz,
        "--output_dir", out, "--batch_size", "2",
        "--image_updates", "1", "--video_updates", "1",
        "--grad_accumulation", "2"] + MESH_ARGS)
    ckpt = CheckpointManager(out)
    assert ckpt.all_steps() == [1, 2]  # image final @1, video final @2
    ckpt.close()


@needs_mesh
def test_train_f_distill_cli_mesh(teacher_npz, tmp_path):
    from omnihuman_tpu.cli import train_f_distill
    out = str(tmp_path / "fd_mesh")
    train_f_distill.main([
        "--task", "tiny-test", "--data_path", teacher_npz,
        "--output_dir", out, "--batch_size", "2", "--num_epochs", "1",
        "--save_interval", "2"] + MESH_ARGS)
    ckpt = CheckpointManager(out)
    assert ckpt.latest_step() == 2
    ckpt.close()
