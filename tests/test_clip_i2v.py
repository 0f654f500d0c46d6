"""CLIP encoder + i2v pipeline tests (tiny configs)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.configs.wan import (
    CLIPConfig, TINY_TEST, VAEConfig, WanConfig, WanModelConfig)
from omnihuman_tpu.models.clip import (
    CLIPModel, clip_textual_forward, clip_visual_forward, init_clip,
    preprocess_images)
from omnihuman_tpu.pipelines.image2video import WanI2V

TINY_CLIP = CLIPConfig(
    embed_dim=16, image_size=28, patch_size=14, vision_dim=24,
    vision_heads=4, vision_layers=3, vocab_size=64, text_dim=16,
    text_heads=4, text_layers=2, max_text_len=20)


@pytest.fixture(scope="module")
def clip_params():
    return init_clip(jax.random.key(0), TINY_CLIP)


def test_visual_tokens_31block(clip_params):
    """use_31_block returns ALL tokens (cls + patches) with trunk
    truncated by one layer (clip.py:295-297)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 28, 28)),
                    jnp.float32)
    out = clip_visual_forward(clip_params, x, TINY_CLIP, use_31_block=True)
    # 28/14 = 2 → 4 patches + 1 cls = 5 tokens
    assert out.shape == (2, 5, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_visual_pooled(clip_params):
    x = jnp.zeros((1, 3, 28, 28), jnp.float32)
    out = clip_visual_forward(clip_params, x, TINY_CLIP, use_31_block=False)
    assert out.shape == (1, 16)


def test_textual_forward_and_padding(clip_params):
    ids = jnp.asarray([[5, 6, 7, 1, 1, 1]], jnp.int32)   # pad_id = 1
    out = clip_textual_forward(clip_params, ids, TINY_CLIP)
    assert out.shape == (1, 16)
    # padded ids must not change the embedding
    ids2 = jnp.asarray([[5, 6, 7, 1, 1, 1]], jnp.int32).at[0, 4].set(1)
    out2 = clip_textual_forward(clip_params, ids2, TINY_CLIP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_preprocess_images_range():
    img = np.zeros((1, 3, 32, 40), np.float32)  # mid-gray in [-1,1]
    out = np.asarray(preprocess_images(img, 28))
    assert out.shape == (1, 3, 28, 28)
    # (0.5 - mean)/std per channel
    np.testing.assert_allclose(out[0, 0, 0, 0], (0.5 - 0.48145466) / 0.26862954,
                               atol=1e-4)


def test_clip_model_visual_wrapper():
    m = CLIPModel(TINY_CLIP)
    img = jnp.zeros((1, 3, 64, 48), jnp.float32)
    out = m.visual(img)
    assert out.shape == (1, 5, 24)


# ---------------------------------------------------------------------------
# i2v pipeline


TINY_I2V = dataclasses.replace(
    TINY_TEST,
    name="tiny-i2v",
    model=dataclasses.replace(TINY_TEST.model, model_type="i2v", in_dim=36,
                              clip_embed_dim=24, clip_tokens=5),
    clip=TINY_CLIP,
    sample_steps=2,
)


@pytest.fixture(scope="module")
def i2v_pipe():
    p = WanI2V(TINY_I2V, checkpoint_dir=None, param_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    p.params["head"]["w"] = jnp.asarray(
        rng.normal(size=p.params["head"]["w"].shape) * 0.1, jnp.float32)
    return p


def _ctx(seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(1, TINY_I2V.text_len,
                                        TINY_I2V.t5.dim)) * 0.1, jnp.float32)


def test_first_frame_mask():
    msk = WanI2V.first_frame_mask(9, 4, 4)
    assert msk.shape == (4, 3, 4, 4)   # 9 frames -> (4+8)/4 = 3 latent
    m = np.asarray(msk)
    np.testing.assert_allclose(m[:, 0], 1.0)   # first latent frame: all 4
    np.testing.assert_allclose(m[:, 1:], 0.0)


def test_latent_size_snaps_to_patches(i2v_pipe):
    lat_h, lat_w = i2v_pipe.latent_size_for((480, 832), 480 * 832)
    assert lat_h % 2 == 0 and lat_w % 2 == 0
    assert abs(lat_h * lat_w - 480 * 832 / 64) / (480 * 832 / 64) < 0.1


def test_i2v_generate_end_to_end(i2v_pipe):
    img = np.random.default_rng(2).normal(size=(3, 40, 40)).astype(
        np.float32).clip(-1, 1)
    video = i2v_pipe.generate(
        "a person", img, max_area=32 * 32, frame_num=5, sampling_steps=2,
        seed=3, context=_ctx(0), context_null=_ctx(1))
    assert video.shape[0] == 3 and video.shape[1] == 5
    assert np.isfinite(np.asarray(video)).all()
