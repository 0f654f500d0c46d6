"""Utility-layer tests: config IO, prompt extension, media, viz,
checkpointing, eval metrics, CLI parsers."""

import json
import os

import numpy as np
import pytest

from omnihuman_tpu.utils.config_io import (
    AttrDict, load_yaml, merge_args, save_snapshot)
from omnihuman_tpu.utils.media import cache_image, make_grid, str2bool
from omnihuman_tpu.utils.prompt_extend import (
    DashScopePromptExpander, PromptOutput, QwenPromptExpander,
    TemplatePromptExpander)
from omnihuman_tpu.utils.qwen_vl_utils import (
    round_by_factor, smart_nframes, smart_resize)
from omnihuman_tpu.apt.eval_ema import psnr, ssim


# ---------------------------------------------------------------------------
# config io


def test_yaml_load_and_interpolation(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "base_dir: /data\n"
        "paths:\n"
        "  videos: ${base_dir}/videos\n"
        "nested: {a: {b: 3}}\n"
        "stages:\n"
        "  - {name: s1, num_steps: 10}\n")
    cfg = load_yaml(str(p))
    assert cfg.paths.videos == "/data/videos"
    assert cfg.get_path("nested.a.b") == 3
    assert cfg.stages[0]["name"] == "s1"
    assert cfg.get_path("missing.key", "dflt") == "dflt"


def test_merge_args_fills_none_only():
    import argparse
    ns = argparse.Namespace(lr=None, steps=5)
    merge_args({"lr": 1e-4, "steps": 99}, ns)
    assert ns.lr == 1e-4
    assert ns.steps == 5    # explicitly set wins


def test_save_snapshot(tmp_path):
    path = save_snapshot(AttrDict({"a": 1, "b": {"c": [1, 2]}}),
                         str(tmp_path / "run"))
    assert os.path.exists(path)


# ---------------------------------------------------------------------------
# prompt extension


def test_template_expander_deterministic():
    e = TemplatePromptExpander()
    a = e("a cat", seed=5)
    b = e("a cat", seed=5)
    assert a.status and a.prompt == b.prompt
    assert "a cat" in a.prompt and len(a.prompt) > len("a cat") + 10


def test_dashscope_without_key_fails_cleanly(monkeypatch):
    monkeypatch.delenv("DASH_API_KEY", raising=False)
    out = DashScopePromptExpander()("a dog", seed=1)
    assert out.status is False
    assert out.prompt == "a dog"        # falls back to original
    assert "DASH_API_KEY" in out.message


def test_qwen_falls_back_to_template():
    out = QwenPromptExpander(model_name="nonexistent/model")("a fox", seed=2)
    assert out.status is True
    assert "Qwen weights unavailable" in out.message


def test_system_prompt_language():
    e = TemplatePromptExpander()
    assert "视频" in e.decide_system_prompt("zh")
    assert "prompt engineer" in e.decide_system_prompt("en")


def test_template_expander_zh_decorations():
    out = TemplatePromptExpander()("滑板上的狗", seed=3, tar_lang="zh")
    assert out.status
    # Chinese decorations + punctuation, not English clauses glued on
    assert out.prompt.startswith("滑板上的狗。")
    assert "，" in out.prompt and out.prompt.endswith("。")
    assert "light" not in out.prompt and "shot" not in out.prompt


# ---------------------------------------------------------------------------
# qwen_vl_utils


def test_smart_resize_factors():
    h, w = smart_resize(480, 832)
    assert h % 28 == 0 and w % 28 == 0
    with pytest.raises(ValueError):
        smart_resize(10000, 10)


def test_smart_nframes():
    assert smart_nframes({"nframes": 7}, 100, 30) == round_by_factor(7, 2)
    n = smart_nframes({"fps": 2}, 300, 30)
    assert n % 2 == 0 and 4 <= n <= 300


# ---------------------------------------------------------------------------
# media


def test_cache_video_creates_parent_dirs(tmp_path):
    from omnihuman_tpu.utils.media import cache_video
    vid = np.zeros((3, 2, 16, 16), np.float32)
    out = cache_video(vid, str(tmp_path / "deep" / "dir" / "v.mp4"), fps=4)
    assert os.path.exists(out)          # mp4 or gif fallback


def test_make_grid_and_cache_image(tmp_path):
    frames = np.random.default_rng(0).integers(
        0, 255, size=(3, 8, 8, 3)).astype(np.uint8)
    grid = make_grid(frames, nrow=2)
    assert grid.shape[0] > 16 and grid.shape[2] == 3
    out = cache_image(
        np.random.default_rng(1).uniform(-1, 1, (3, 16, 16)),
        str(tmp_path / "x.png"))
    assert os.path.exists(out)


def test_str2bool():
    assert str2bool("yes") and str2bool("1") and str2bool(True)
    assert not str2bool("no") and not str2bool("0")
    with pytest.raises(ValueError):
        str2bool("maybe")


# ---------------------------------------------------------------------------
# eval metrics


def test_psnr_ssim():
    a = np.random.default_rng(0).uniform(-1, 1, (3, 16, 16))
    assert psnr(a, a) == float("inf")
    assert abs(ssim(a, a) - 1.0) < 1e-9
    b = a + 0.1
    assert 20 < psnr(a, b) < 40
    assert 0 < ssim(a, b) < 1.0


# ---------------------------------------------------------------------------
# CLI parsers (no model execution)


def test_generate_cli_parser():
    from omnihuman_tpu.cli.generate import build_parser
    args = build_parser().parse_args(
        ["--task", "t2v-1.3B", "--size", "480*832", "--sp_size", "2"])
    assert args.task == "t2v-1.3B" and args.sp_size == 2


def test_generate_cli_rejects_bad_size():
    from omnihuman_tpu.cli.generate import main
    with pytest.raises(SystemExit):
        main(["--task", "t2v-1.3B", "--size", "totally*bogus*size"])


def test_generate_cli_prompt_extend_flags():
    from omnihuman_tpu.cli.generate import build_parser
    args = build_parser().parse_args(
        ["--use_prompt_extend", "--prompt_extend_target_lang", "zh"])
    assert args.use_prompt_extend and args.prompt_extend_target_lang == "zh"
    with pytest.raises(SystemExit):   # only en/zh are valid
        build_parser().parse_args(["--prompt_extend_target_lang", "fr"])
