"""End-to-end Seaweed-APT workflow on the tiny config:
teacher data → consistency distillation → APT GAN phase → EMA eval.

This is the chained integration the reference splits across
generate.sh / train.sh / apt_trainer / eval_ema.sh.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.apt.apt_trainer import (
    SeaweedAPTConfig, apt_d_step, apt_g_step, init_apt_state,
    make_d_optimizer, make_rmsprop, start_video_phase)
from omnihuman_tpu.apt.distill import (
    distill_train_step, init_distill_state, make_optimizer)
from omnihuman_tpu.apt.eval_ema import evaluate_ema
from omnihuman_tpu.apt.generate import create_dataloader, generate_batch
from omnihuman_tpu.apt.model import init_apt_discriminator
from omnihuman_tpu.configs.wan import TINY_TEST
from omnihuman_tpu.ops.rope import rope_angles_3d
from omnihuman_tpu.pipelines.text2video import WanT2V


@pytest.fixture(scope="module")
def pipe():
    p = WanT2V(TINY_TEST, checkpoint_dir=None, param_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    p.params["head"]["w"] = jnp.asarray(
        rng.normal(size=p.params["head"]["w"].shape) * 0.1, jnp.float32)

    def fake_encode(prompts):
        r = np.random.default_rng(abs(hash(tuple(prompts))) % 2 ** 31)
        return (jnp.asarray(r.normal(size=(
            len(prompts), TINY_TEST.text_len, TINY_TEST.t5.dim)) * 0.1,
            jnp.float32),
            jnp.full((len(prompts),), TINY_TEST.text_len, jnp.int32))

    p.encode_text = fake_encode
    return p


def test_full_apt_workflow(pipe, tmp_path):
    cfg = TINY_TEST
    # ---- phase A: teacher data (generate.sh)
    data = generate_batch(pipe, num_samples=4, size=(32, 32), batch=2,
                          out_dir=str(tmp_path))
    data_path = str(tmp_path / "dummy_data_32x32.npz")

    grid = (1, 4 // 2, 4 // 2)
    seq_len = 4
    sin, cos = rope_angles_3d(grid, cfg.model.head_dim, seq_len=seq_len)

    # ---- phase B: stage-1 consistency distillation (train.sh)
    opt = make_optimizer(lr=1e-3)
    student = jax.tree.map(jnp.copy, pipe.params)
    state = init_distill_state(student, opt)
    dl = create_dataloader(data, batch_size=2, shuffle=False)
    step = functools.partial(
        distill_train_step, optimizer=opt, cfg=cfg.model, seq_len=seq_len,
        rope_sin=sin, rope_cos=cos, policy=cfg.policy, remat=False)
    losses = []
    for _ in range(3):
        for batch in dl():
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
    # student starts as a teacher copy → near-converged from step 0
    # (CFG-combined targets keep it nonzero); learning-curve behaviour is
    # covered by test_apt.test_distill_step_reduces_loss
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < 0.1, losses

    # ---- phase C: APT GAN (stage 2, image phase then video boot)
    apt_cfg = SeaweedAPTConfig(lambda_r1=1.0)
    d_params = init_apt_discriminator(jax.random.key(1), pipe.params,
                                      cfg.model)
    apt_state = init_apt_state(state.ema_params, d_params, 1e-4, 1e-4)
    g_opt, d_opt = make_rmsprop(1e-4), make_d_optimizer(1e-4, d_params)
    rng = np.random.default_rng(3)
    gan_batch = {
        "real": jnp.asarray(data["dummy_data"][:2] * 0.1, jnp.float32),
        "noise": jnp.asarray(rng.normal(size=(2, 16, 1, 4, 4)), jnp.float32),
        "context": jnp.asarray(data["positive_contexts"][:2], jnp.float32),
    }
    kw = dict(cfg=cfg.model, apt_cfg=apt_cfg, video=False, seq_len=seq_len,
              rope_sin=sin, rope_cos=cos, policy=cfg.policy)
    apt_state, dm = apt_d_step(apt_state, gan_batch, jax.random.key(4),
                               d_optimizer=d_opt, **kw)
    apt_state, gm = apt_g_step(apt_state, gan_batch, jax.random.key(5),
                               g_optimizer=g_opt, **kw)
    assert np.isfinite(float(dm["d_loss"])) and np.isfinite(
        float(gm["g_loss"]))
    # video phase boots from the image EMA
    d2 = init_apt_discriminator(jax.random.key(7), pipe.params, cfg.model)
    vstate = start_video_phase(apt_state, d2, apt_cfg)
    vkw = dict(kw, video=True)
    vstate, dm2 = apt_d_step(vstate, gan_batch, jax.random.key(8),
                             d_optimizer=make_d_optimizer(
                                 apt_cfg.d_lr_video, d2),
                             **vkw)
    assert np.isfinite(float(dm2["d_loss"]))

    # ---- phase D: EMA evaluation (eval_ema.sh)
    eval_pipe = WanT2V(cfg, checkpoint_dir=None, param_dtype=jnp.float32)
    eval_pipe.params = state.ema_params
    eval_pipe.vae_params = pipe.vae_params
    metrics = evaluate_ema(eval_pipe, data_path, num_samples=2,
                           out_dir=str(tmp_path / "eval_images"))
    assert np.isfinite(metrics["latent_mse_vs_teacher_x0"])
    assert metrics["num_samples"] == 2
    import os
    assert os.path.exists(tmp_path / "eval_images" / "eval_image_0.png")
