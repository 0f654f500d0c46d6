"""f-distill trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.apt.distill import make_optimizer
from omnihuman_tpu.apt.f_distill import (
    default_feature_fn, f_distill_train_step, get_f_divergence_fn,
    init_f_distill_state, init_mlp_discriminator, mlp_discriminator_forward)
from omnihuman_tpu.configs.wan import DTypePolicy, WanModelConfig
from omnihuman_tpu.models.wan_dit import init_wan_model
from omnihuman_tpu.ops.rope import rope_angles_3d

CFG = WanModelConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                     freq_dim=16, text_dim=24, text_len=8)
FP32 = DTypePolicy(compute=jnp.float32)


def test_f_divergence_weights():
    r = jnp.asarray([0.5, 1.0, 2.0])
    np.testing.assert_allclose(get_f_divergence_fn("reverse-kl")(r),
                               [1, 1, 1])
    np.testing.assert_allclose(get_f_divergence_fn("forward-kl")(r),
                               [0.5, 1, 2])
    np.testing.assert_allclose(get_f_divergence_fn("jensen-shannon")(r),
                               [1 / 3, 0.5, 2 / 3])
    np.testing.assert_allclose(
        get_f_divergence_fn("softened-rkl")(r), [2 / 3, 0.5, 1 / 3])
    hs = get_f_divergence_fn("squared-hellinger")(r)
    np.testing.assert_allclose(hs[1], 0.25, rtol=1e-4)
    with pytest.raises(ValueError):
        get_f_divergence_fn("nope")


def test_mlp_discriminator_shapes():
    d = init_mlp_discriminator(jax.random.key(0), 512)
    x = jnp.ones((3, 512))
    out = mlp_discriminator_forward(d, x)
    assert out.shape == (3, 1)


def test_feature_fn():
    v = jnp.arange(2 * 16 * 2 * 4 * 4, dtype=jnp.float32).reshape(
        2, 16, 2, 4, 4)
    f = default_feature_fn(v, dim=100)
    assert f.shape == (2, 100)
    np.testing.assert_allclose(np.asarray(f[0, :3]), [0, 1, 2])


def test_f_distill_step_runs_and_learns():
    teacher = init_wan_model(jax.random.key(0), CFG)
    teacher["head"]["w"] = jax.random.normal(
        jax.random.key(1), teacher["head"]["w"].shape) * 0.05
    student = jax.tree.map(jnp.copy, teacher)
    # perturb the student so there is something to learn
    student["head"]["w"] = student["head"]["w"] + 0.05

    opt = make_optimizer(lr=1e-3)
    d_opt = make_optimizer(lr=1e-3)
    d = init_mlp_discriminator(jax.random.key(2), 64)
    state = init_f_distill_state(student, d, opt, d_opt)

    rng = np.random.default_rng(0)
    batch = {
        "noise": jnp.asarray(rng.normal(size=(2, 16, 2, 4, 4)), jnp.float32),
        "context": jnp.asarray(rng.normal(size=(2, 8, 24)), jnp.float32),
        "context_null": jnp.zeros((2, 8, 24), jnp.float32),
    }
    sin, cos = rope_angles_3d((2, 2, 2), CFG.head_dim, seq_len=8)

    kw = dict(optimizer=opt, d_optimizer=d_opt, cfg=CFG, seq_len=8,
              rope_sin=sin, rope_cos=cos, policy=FP32,
              feature_fn=lambda v: default_feature_fn(v, 64))
    losses = []
    for i in range(4):
        state, m = f_distill_train_step(state, teacher, batch, **kw)
        losses.append(float(m["f_div_loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4


def test_f_distill_no_discriminator():
    teacher = init_wan_model(jax.random.key(0), CFG)
    student = jax.tree.map(jnp.copy, teacher)
    opt = make_optimizer(lr=1e-4)
    d_opt = make_optimizer(lr=1e-4)
    d = init_mlp_discriminator(jax.random.key(2), 64)
    state = init_f_distill_state(student, d, opt, d_opt)
    rng = np.random.default_rng(1)
    batch = {
        "noise": jnp.asarray(rng.normal(size=(1, 16, 2, 4, 4)), jnp.float32),
        "context": jnp.asarray(rng.normal(size=(1, 8, 24)), jnp.float32),
        "context_null": jnp.zeros((1, 8, 24), jnp.float32),
    }
    sin, cos = rope_angles_3d((2, 2, 2), CFG.head_dim, seq_len=8)
    state, m = f_distill_train_step(
        state, teacher, batch, optimizer=opt, d_optimizer=d_opt, cfg=CFG,
        seq_len=8, rope_sin=sin, rope_cos=cos, policy=FP32,
        use_discriminator=False,
        feature_fn=lambda v: default_feature_fn(v, 64))
    assert float(m["d_loss"]) == 0.0
    assert float(m["density_ratio_mean"]) == 1.0
