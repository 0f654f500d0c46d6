"""OmniHuman model + trainer tests: condition injection, masks, stages."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.configs.wan import DTypePolicy, WanModelConfig
from omnihuman_tpu.omni.model import (
    OmniModelConfig, init_omni_model, omni_model_forward, process_audio,
    process_pose)
from omnihuman_tpu.omni.trainer import (
    DEFAULT_STAGES, OmniHumanTrainer, OmniTrainState, StageConfig,
    make_lr_schedule, make_omni_optimizer, omni_flow_matching_loss,
    omni_train_step)

BASE = WanModelConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                      freq_dim=16, text_dim=24, text_len=8)
OCFG = OmniModelConfig(base=BASE, audio_dim=20, num_keypoints=8,
                       num_frames=8)
FP32 = DTypePolicy(compute=jnp.float32)
B, C, F, H, W = 2, 16, 2, 8, 8


@pytest.fixture(scope="module")
def omni():
    params = init_omni_model(jax.random.key(0), OCFG)
    rng = np.random.default_rng(0)
    params["base"]["head"]["w"] = jnp.asarray(
        rng.normal(size=params["base"]["head"]["w"].shape) * 0.05,
        jnp.float32)
    batch = {
        "frames": jnp.asarray(rng.normal(size=(B, C, F, H, W)), jnp.float32),
        "context": jnp.asarray(rng.normal(size=(B, 8, 24)), jnp.float32),
        "audio": jnp.asarray(rng.normal(size=(B, 4, 20)), jnp.float32),
        # heatmaps at 2x latent resolution (guider downsamples 4x to
        # one cell per (1,2,2) patch)
        "pose": jnp.asarray(rng.normal(size=(B, 8, F, H * 2, W * 2)) * 0.1,
                            jnp.float32),
        "reference": jnp.asarray(rng.normal(size=(B, C, 1, H, W)),
                                 jnp.float32),
    }
    return params, batch


def test_forward_text_only(omni):
    params, batch = omni
    v = omni_model_forward(params, batch["frames"], jnp.asarray([500., 100.]),
                           batch["context"], cfg=OCFG, policy=FP32,
                           remat=False)
    assert v.shape == (B, 16, F, H, W)
    assert np.isfinite(np.asarray(v)).all()


def test_forward_all_conditions(omni):
    params, batch = omni
    v = omni_model_forward(
        params, batch["frames"], jnp.asarray([500., 100.]), batch["context"],
        cfg=OCFG, audio=batch["audio"], pose=batch["pose"],
        ref_latent=batch["reference"], policy=FP32, remat=False)
    assert v.shape == (B, 16, F, H, W)
    assert np.isfinite(np.asarray(v)).all()


def test_forward_bf16_residual_all_conditions(omni):
    """Serving fast mode (bf16 residual) through every condition branch.

    Regression: the audio-adapter residual add promoted the bf16 scan
    carry to f32 (gate math in fp32 without a cast back), breaking
    lax.scan carry typing the first time the omni model ran under
    --precision fast."""
    params, batch = omni
    fast = dataclasses.replace(FP32, residual=jnp.bfloat16)
    v = omni_model_forward(
        params, batch["frames"], jnp.asarray([500., 100.]), batch["context"],
        cfg=OCFG, audio=batch["audio"], pose=batch["pose"],
        ref_latent=batch["reference"], policy=fast, remat=False)
    assert v.shape == (B, 16, F, H, W)
    assert np.isfinite(np.asarray(v)).all()


def test_zero_init_adapters_noop(omni):
    """Audio adapter (zero o-proj) and pose proj (zero) must be exact
    no-ops at init: output with/without those conditions identical."""
    params, batch = omni
    t = jnp.asarray([500.0, 100.0])
    kw = dict(cfg=OCFG, policy=FP32, remat=False)
    v0 = omni_model_forward(params, batch["frames"], t, batch["context"],
                            **kw)
    v1 = omni_model_forward(params, batch["frames"], t, batch["context"],
                            audio=batch["audio"], pose=batch["pose"], **kw)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               atol=1e-5, rtol=1e-5)


def test_reference_packing_changes_output(omni):
    """Reference tokens participate in self-attention → output moves."""
    params, batch = omni
    # make attention actually see the reference: bump temporal embed path
    t = jnp.asarray([500.0, 100.0])
    kw = dict(cfg=OCFG, policy=FP32, remat=False)
    v0 = omni_model_forward(params, batch["frames"], t, batch["context"],
                            **kw)
    v1 = omni_model_forward(params, batch["frames"], t, batch["context"],
                            ref_latent=batch["reference"], **kw)
    assert not np.allclose(np.asarray(v0), np.asarray(v1), atol=1e-6)


def test_condition_masks_zero_out(omni):
    """mask=0 must equal not passing the condition at all (for ref)."""
    params, batch = omni
    t = jnp.asarray([500.0, 100.0])
    kw = dict(cfg=OCFG, policy=FP32, remat=False)
    masks = {"reference": jnp.zeros((B,)), "audio": jnp.zeros((B,)),
             "pose": jnp.zeros((B,))}
    v_masked = omni_model_forward(
        params, batch["frames"], t, batch["context"],
        audio=batch["audio"], pose=batch["pose"],
        ref_latent=batch["reference"], cond_mask=masks, **kw)
    assert np.isfinite(np.asarray(v_masked)).all()


def test_process_audio_shapes(omni):
    params, _ = omni
    a = jnp.ones((B, 4, 20))
    tok = process_audio(params["cond"], a)
    assert tok.shape == (B, 4, 32)


def test_process_pose_shapes(omni):
    params, _ = omni
    p = jnp.ones((B, 8, F, H * 2, W * 2))
    tok = process_pose(params["cond"], p, BASE.patch_size)
    # one token per patch: F * (H/2) * (W/2)
    assert tok.shape == (B, F * (H // 2) * (W // 2), 32)
    np.testing.assert_allclose(np.asarray(tok), 0.0)  # zero-init proj


def test_default_stages_match_reference_schedule():
    """omni_config.yaml:76-102."""
    assert [s.num_steps for s in DEFAULT_STAGES] == [50_000, 30_000, 20_000]
    assert DEFAULT_STAGES[1].condition_ratios["audio"] == 0.5
    assert DEFAULT_STAGES[2].condition_ratios["pose"] == 0.13


def test_train_step_and_loss(omni):
    params, batch = omni
    import optax
    sched = make_lr_schedule("cosine", 1e-3, 100)
    opt = make_omni_optimizer(sched)
    state = OmniTrainState(params=params, opt_state=opt.init(params),
                           step=jnp.asarray(0, jnp.int32))
    ratios = {"text": 1.0, "reference": 1.0, "audio": 0.5, "pose": 0.13}
    state, m = omni_train_step(state, batch, ratios, jax.random.key(0),
                               optimizer=opt, cfg=OCFG, policy=FP32,
                               remat=False)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_trainer_stage_loop(tmp_path, omni):
    params, batch = omni
    stages = (StageConfig("s1", 3, {"text": 1.0, "reference": 1.0,
                                    "audio": 0.0, "pose": 0.0}),
              StageConfig("s2", 2, {"text": 1.0, "reference": 1.0,
                                    "audio": 0.5, "pose": 0.13}))
    seen = []
    # the trainer's jitted step donates its state — hand it a copy so the
    # module-scoped fixture params survive for later tests
    params = jax.tree.map(jnp.copy, params)
    trainer = OmniHumanTrainer(
        params, OCFG, stages=stages, learning_rate=1e-4,
        checkpoint_dir=str(tmp_path / "ck"), checkpoint_interval=100,
        log_interval=1, policy=FP32,
        metric_writer=lambda m, s: seen.append((s, m)))

    def factory(stage_idx):
        def it():
            while True:
                yield batch
        return it()

    trainer.train(factory, seed=0)
    assert int(trainer.state.step) == 5
    assert len(seen) >= 4
    # resume restores step
    step, _ = trainer.load_checkpoint()
    assert step == 5


def test_trainer_stage_aware_resume(tmp_path, omni):
    """Kill mid-stage-2 → a fresh trainer resumes in stage 2 at step k+1
    (reference omnihuman_trainer.py:486-494 restores (step, stage))."""
    params, batch = omni
    stages = (StageConfig("s1", 3, {"text": 1.0, "reference": 1.0,
                                    "audio": 0.0, "pose": 0.0}),
              StageConfig("s2", 4, {"text": 1.0, "reference": 1.0,
                                    "audio": 0.5, "pose": 0.0}))

    def make_trainer(writer):
        return OmniHumanTrainer(
            jax.tree.map(jnp.copy, params), OCFG, stages=stages,
            learning_rate=1e-4, checkpoint_dir=str(tmp_path / "ck"),
            checkpoint_interval=2, log_interval=1, policy=FP32,
            metric_writer=writer)

    # run 1: stage 1 completes; stage 2 "crashes" after 2 steps (its
    # iterator runs dry → StopIteration, like a killed job)
    def crashing_factory(stage_idx):
        n = 100 if stage_idx == 0 else 2
        return iter([batch] * n)

    t1 = make_trainer(lambda m, s: None)
    with pytest.raises(StopIteration):
        t1.train(crashing_factory, seed=0)
    t1.ckpt.wait()
    assert int(t1.state.step) == 5  # 3 (s1) + 2 (s2, checkpointed at 5)

    # run 2: fresh process resumes — must land in stage 2 at step 2/4
    seen_stages = []
    t2 = make_trainer(lambda m, s: seen_stages.append(m["stage"]))
    t2.train(lambda si: iter([batch] * 100), seed=0, resume=True)
    assert int(t2.state.step) == 7          # 3 + 4, not re-run from 0
    assert set(seen_stages) == {1}          # stage 1 never re-entered
    step, stage = t2.load_checkpoint()
    assert (step, stage) == (7, 1)

    # run 3: resume after full completion is a no-op
    t3 = make_trainer(lambda m, s: None)
    t3.train(lambda si: iter([]), seed=0, resume=True)
    assert int(t3.state.step) == 7


def test_lr_schedules():
    for kind in ("cosine", "linear", "constant", "bogus"):
        s = make_lr_schedule(kind, 1e-3, 10)
        assert np.isfinite(float(s(0))) and np.isfinite(float(s(9)))


def test_motion_frames_long_video(omni):
    """Previous-clip latents packed at past temporal indices
    (README.md:154 'motion frames for long video generation')."""
    params, batch = omni
    rng = np.random.default_rng(11)
    motion = jnp.asarray(rng.normal(size=(B, C, 2, H, W)), jnp.float32)
    t = jnp.asarray([500.0, 100.0])
    kw = dict(cfg=OCFG, policy=FP32, remat=False)
    v0 = omni_model_forward(params, batch["frames"], t, batch["context"],
                            ref_latent=batch["reference"], **kw)
    v1 = omni_model_forward(params, batch["frames"], t, batch["context"],
                            ref_latent=batch["reference"],
                            motion_latent=motion, **kw)
    assert v1.shape == (B, 16, F, H, W)
    assert np.isfinite(np.asarray(v1)).all()
    # motion context participates in attention → output moves
    assert not np.allclose(np.asarray(v0), np.asarray(v1), atol=1e-6)
