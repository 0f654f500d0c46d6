"""End-to-end t2v pipeline smoke tests (tiny config, CPU)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.configs.wan import TINY_TEST
from omnihuman_tpu.pipelines.text2video import WanT2V


@pytest.fixture(scope="module")
def pipe():
    p = WanT2V(TINY_TEST, checkpoint_dir=None, param_dtype=jnp.float32)
    # the head is zero-initialised (v == 0 for any input) — randomise it so
    # the velocity actually depends on the conditioning
    rng = np.random.default_rng(42)
    p.params["head"]["w"] = jnp.asarray(
        rng.normal(size=p.params["head"]["w"].shape) * 0.1, jnp.float32)
    return p


def _ctx(pipe, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(size=(1, TINY_TEST.text_len, TINY_TEST.t5.dim)) * 0.1,
        jnp.float32)


def test_latent_shape_target_config(pipe):
    # reference target: 480x832, 81 frames → [16, 21, 60, 104]
    # (README.md:35-51; generate.py:151-161 uses 1 frame → [16,1,60,104])
    shape = pipe.latent_shape((832, 480), 81)
    assert shape == (TINY_TEST.vae.z_dim, 21, 60, 104)
    assert pipe.latent_shape((832, 480), 1)[1] == 1


def test_generate_end_to_end(pipe):
    video = pipe.generate(
        "a cat", size=(32, 32), frame_num=5, sampling_steps=3,
        guide_scale=4.0, seed=7,
        context=_ctx(pipe, 0), context_null=_ctx(pipe, 1))
    # 32x32 pixels, 5 frames
    assert video.shape == (3, 5, 32, 32)
    v = np.asarray(video)
    assert np.isfinite(v).all()
    assert v.min() >= -1.0 and v.max() <= 1.0


def test_generate_deterministic_with_seed(pipe):
    kw = dict(size=(32, 32), frame_num=1, sampling_steps=2, seed=3,
              context=_ctx(pipe, 0), context_null=_ctx(pipe, 1),
              return_latents=True)
    a = pipe.generate("x", **kw)
    b = pipe.generate("x", **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_solver_choice_dpm(pipe):
    lat = pipe.generate(
        "x", size=(32, 32), frame_num=1, sampling_steps=2,
        sample_solver="dpm++", seed=5,
        context=_ctx(pipe, 0), context_null=_ctx(pipe, 1),
        return_latents=True)
    assert lat.shape == (1, TINY_TEST.vae.z_dim, 1, 4, 4)
    assert np.isfinite(np.asarray(lat)).all()


def test_guide_scale_changes_output(pipe):
    kw = dict(size=(32, 32), frame_num=1, sampling_steps=2, seed=3,
              context=_ctx(pipe, 0), context_null=_ctx(pipe, 1),
              return_latents=True)
    a = pipe.generate("x", guide_scale=1.0, **kw)
    b = pipe.generate("x", guide_scale=9.0, **kw)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_context_lens_trim_is_exact(pipe):
    """Trimming the padded context to a 128-bucket of the true length +
    varlen masking must produce the same latents as the full padded
    context with the same mask (masked kv columns contribute nothing;
    reference model.py:530-531 computes context_lens the same way)."""
    rng = np.random.default_rng(9)
    text_len = TINY_TEST.text_len
    full = jnp.asarray(
        rng.normal(size=(1, text_len, TINY_TEST.t5.dim)) * 0.1,
        jnp.float32)
    full_null = jnp.asarray(
        rng.normal(size=(1, text_len, TINY_TEST.t5.dim)) * 0.1,
        jnp.float32)
    true_len = 5
    lens = jnp.asarray([true_len, true_len], jnp.int32)
    kw = dict(size=(32, 32), frame_num=1, sampling_steps=2, seed=11,
              return_latents=True)
    a = pipe.generate("x", context=full, context_null=full_null,
                      context_lens=lens, **kw)
    # hand-trimmed equivalent of what generate() does internally when it
    # encodes text itself (TINY text_len < 128 so the internal bucket is
    # a no-op; trim directly to prove masked columns contribute nothing)
    b = pipe.generate("x", context=full[:, :true_len + 3],
                      context_null=full_null[:, :true_len + 3],
                      context_lens=lens, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_generate_with_internal_text_encoding(pipe):
    """Full path: prompt → T5 encode (offline tokenizer fallback) →
    context_lens → bucket trim → sample. No precomputed context."""
    video = pipe.generate("a red fox", size=(32, 32), frame_num=1,
                          sampling_steps=2, seed=5)
    assert video.shape == (3, 1, 32, 32)
    assert np.isfinite(np.asarray(video)).all()


def test_precision_fast_mode(pipe):
    """precision='fast' (the documented serving default in the generate
    CLI) runs the bf16-residual policy: outputs stay finite and close to
    the fp32-residual reference (real-chip pixel gate: PSNR 39.8 dB /
    SSIM 0.989, REPORTS/perf_r4.md §6). Unknown names fail loudly."""
    import jax.numpy as jnp

    fast = WanT2V(TINY_TEST, checkpoint_dir=None,
                  param_dtype=jnp.float32, precision="fast")
    fast.params = pipe.params
    assert fast.policy.residual == jnp.bfloat16
    assert pipe.policy.residual == jnp.float32

    kw = dict(size=(32, 32), frame_num=1, sampling_steps=2, seed=3,
              context=_ctx(pipe, 0), context_null=_ctx(pipe, 1),
              return_latents=True)
    ref = np.asarray(pipe.generate("x", **kw))
    got = np.asarray(fast.generate("x", **kw))
    assert np.isfinite(got).all()
    rel = np.sqrt(np.mean((got - ref) ** 2) / np.maximum(
        np.mean(ref ** 2), 1e-12))
    assert 0 < rel < 0.15, rel    # differs (bf16), but stays close

    with pytest.raises(ValueError, match="unknown precision"):
        WanT2V(TINY_TEST, checkpoint_dir=None, precision="turbo")


def test_generate_cli_one_step(tmp_path):
    """`--one_step` is the reference's wan_inference.py CLI entry
    (seaweed_apt/wan_inference.py:217-230): one DiT forward at t=T, VAE
    decode, save — including loading a trained generator from a
    distill-state checkpoint's EMA stream (reference --model_path)."""
    import jax

    from omnihuman_tpu.apt.distill import init_distill_state, make_optimizer
    from omnihuman_tpu.cli.generate import main
    from omnihuman_tpu.models.wan_dit import init_wan_model
    from omnihuman_tpu.utils.checkpoint import CheckpointManager

    base = ["--task", "tiny-test", "--size", "32*32", "--frame_num", "1",
            "--one_step", "--base_seed", "7"]

    out = main(base + ["--save_file", str(tmp_path / "clip.mp4")])
    assert out is not None and os.path.exists(out)

    # EMA-stream restore path (distill/APT states restore as plain dicts
    # without a target; the CLI picks their `ema_params`)
    params = init_wan_model(jax.random.key(0), TINY_TEST.model)
    mgr = CheckpointManager(str(tmp_path / "gck"), async_save=False)
    mgr.save(3, init_distill_state(params, make_optimizer()))
    mgr.wait()
    mgr.close()
    out2 = main(base + ["--generator_ckpt", str(tmp_path / "gck"),
                        "--save_file", str(tmp_path / "clip2.mp4")])
    assert out2 is not None and os.path.exists(out2)

    # i2v has no one-step generator: fail loudly
    with pytest.raises(SystemExit):
        main(["--task", "i2v-14B", "--one_step", "--size", "480*832"])


def test_generate_cli_one_step_batched(tmp_path):
    """--prompts_file: one-step throughput serving — B prompts in ONE
    batched DiT forward + ONE batched decode, one clip per line."""
    from omnihuman_tpu.cli.generate import main

    pf = tmp_path / "prompts.txt"
    pf.write_text("a cat\n\na dog\n")   # blank line skipped
    outs = main(["--task", "tiny-test", "--size", "32*32",
                 "--frame_num", "1", "--one_step", "--base_seed", "7",
                 "--prompts_file", str(pf),
                 "--save_file", str(tmp_path / "clip.mp4")])
    assert len(outs) == 2
    for o in outs:
        assert os.path.exists(o)

    # throughput mode requires the one-step generator
    with pytest.raises(SystemExit):
        main(["--task", "tiny-test", "--size", "32*32",
              "--prompts_file", str(pf)])
    # empty prompt file fails loudly
    (tmp_path / "empty.txt").write_text("\n")
    with pytest.raises(SystemExit):
        main(["--task", "tiny-test", "--size", "32*32", "--frame_num",
              "1", "--one_step", "--prompts_file",
              str(tmp_path / "empty.txt")])


def test_t5_auto_unload_and_checkpoint_reload(monkeypatch):
    """Single-chip generate frees the T5 encoder after the prompt is
    embedded (the 11.4 GB umt5-xxl cannot coexist with the DiT through
    the denoise loop on one v5e — REPORTS/perf_r5.md §5), and a
    checkpoint-loaded encoder is RELOADED from its recorded path on next
    use, never silently re-randomised."""
    p = WanT2V(TINY_TEST, checkpoint_dir=None, param_dtype=jnp.float32)
    assert p.t5_auto_unload                  # mesh=None → on by default
    out = p.generate("a tiny test prompt", size=(32, 32), frame_num=5,
                     sampling_steps=1, seed=1)
    assert out.shape[0] == 3
    assert p._t5_params is None              # freed inside generate

    # reload route: a recorded checkpoint path wins over random re-init
    seen = {}
    from omnihuman_tpu.pipelines import text2video as t2v_mod
    monkeypatch.setattr(t2v_mod.convert, "load_torch_state_dict",
                        lambda path: seen.setdefault("path", path) and {})
    monkeypatch.setattr(t2v_mod.convert, "convert_t5",
                        lambda sd, cfg: {"w": jnp.full((3,), 7.0)})
    p._t5_ckpt_path = "/fake/models_t5.pth"
    assert p._t5_params is None
    reloaded = p.t5_params
    assert seen["path"] == "/fake/models_t5.pth"
    assert float(reloaded["w"][0]) == 7.0
