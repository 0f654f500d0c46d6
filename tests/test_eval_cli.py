"""Eval CLI: directories of clips -> tagged metrics JSON.

The reference's evaluator module has no entry point and torch.randn
feature extractors (Omnihuman/omnihuman-eval.py:15-33); here the real
suite is CLI-runnable over cv2-decodable videos and raw .npy arrays."""

import json
import os

import numpy as np
import pytest

from omnihuman_tpu.cli import evaluate as eval_cli


def _write_mp4(path, seed, frames=6, hw=48):
    import cv2
    rng = np.random.default_rng(seed)
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                         16, (hw, hw))
    ok = vw.isOpened()
    for _ in range(frames):
        vw.write(rng.integers(0, 255, (hw, hw, 3)).astype(np.uint8))
    vw.release()
    if not ok or not os.path.exists(path):
        pytest.skip("cv2 VideoWriter unavailable in this environment")


def test_eval_cli_videos_and_npy(tmp_path):
    real_d, fake_d = tmp_path / "real", tmp_path / "fake"
    real_d.mkdir(), fake_d.mkdir()
    for i in range(2):
        _write_mp4(real_d / f"clip{i}.mp4", seed=i)
        _write_mp4(fake_d / f"clip{i}.mp4", seed=10 + i)
    # mixed formats: a raw [T,H,W,C] float array alongside the videos
    rng = np.random.default_rng(99)
    np.save(real_d / "extra.npy",
            rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32))
    np.save(fake_d / "extra.npy",
            rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32))

    out = eval_cli.main([
        "--real_dir", str(real_d), "--fake_dir", str(fake_d),
        "--num_frames", "4", "--size", "32*32",
        "--output_dir", str(tmp_path / "ev"), "--name", "smoke"])

    assert os.path.exists(out)
    metrics = json.load(open(out))
    assert np.isfinite(metrics["fid"])
    assert np.isfinite(metrics["fvd"])
    # proxy feature space must be tagged so numbers are never silently
    # compared with pretrained-feature numbers
    assert "feature_space" in metrics
    assert np.isnan(metrics["hkc"])    # no keypoint processor supplied


def test_load_clips_geometry(tmp_path):
    d = tmp_path / "clips"
    d.mkdir()
    # short clip repeat-pads, array resizes, both conform to [C,T,H,W]
    np.save(d / "a.npy",
            np.zeros((3, 2, 16, 16), np.float32))          # [C,T,H,W]
    np.save(d / "b.npy",
            np.zeros((5, 24, 24, 3), np.float32))          # [T,H,W,C]
    clips = eval_cli.load_clips(str(d), num_frames=4, size=(32, 32))
    assert clips.shape == (2, 3, 4, 32, 32)

    with pytest.raises(FileNotFoundError):
        eval_cli.load_clips(str(tmp_path / "empty_nonexistent"),
                            num_frames=4, size=(32, 32))
