"""Teacher-data generation + one-step inference tests (tiny config)."""

import jax.numpy as jnp
import numpy as np
import pytest

from omnihuman_tpu.apt.generate import (
    RANDOM_PROMPTS, create_dataloader, generate_batch, load_teacher_data)
from omnihuman_tpu.configs.wan import TINY_TEST
from omnihuman_tpu.pipelines.text2video import WanT2V
from omnihuman_tpu.pipelines.wan_inference import SeaweedWanAPTGenerator


@pytest.fixture(scope="module")
def pipe():
    p = WanT2V(TINY_TEST, checkpoint_dir=None, param_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    p.params["head"]["w"] = jnp.asarray(
        rng.normal(size=p.params["head"]["w"].shape) * 0.1, jnp.float32)

    # stub the text encoder (no HF tokenizer download in tests)
    def fake_encode(prompts):
        r = np.random.default_rng(abs(hash(tuple(prompts))) % 2 ** 31)
        ctx = r.normal(size=(len(prompts), TINY_TEST.text_len,
                             TINY_TEST.t5.dim)).astype(np.float32) * 0.1
        return jnp.asarray(ctx), jnp.full((len(prompts),),
                                          TINY_TEST.text_len, jnp.int32)

    p.encode_text = fake_encode
    return p


def test_random_prompts_count():
    assert len(RANDOM_PROMPTS) == 100


def test_generate_batch_artifact(pipe, tmp_path):
    data = generate_batch(pipe, num_samples=4, size=(32, 32), batch=2,
                          out_dir=str(tmp_path))
    # same keys as the reference artifact (generate.py:248-259)
    assert set(data) == {"dummy_data", "noise", "dummy_prompts",
                         "positive_contexts", "negative_context",
                         "v_teacher"}
    z = TINY_TEST.vae.z_dim
    assert data["noise"].shape == (4, z, 1, 4, 4)
    assert data["v_teacher"].shape == (4, z, 1, 4, 4)
    assert data["positive_contexts"].shape == (
        4, TINY_TEST.text_len, TINY_TEST.t5.dim)
    assert np.isfinite(data["v_teacher"]).all()
    # persisted + reloadable
    loaded = load_teacher_data(str(tmp_path / "dummy_data_32x32.npz"))
    np.testing.assert_allclose(loaded["v_teacher"], data["v_teacher"])


def test_teacher_noise_seeded_per_sample(pipe, tmp_path):
    d1 = generate_batch(pipe, num_samples=2, size=(32, 32), base_seed=7,
                        save=False)
    d2 = generate_batch(pipe, num_samples=2, size=(32, 32), base_seed=7,
                        save=False)
    np.testing.assert_allclose(d1["noise"], d2["noise"])
    assert not np.allclose(d1["noise"][0], d1["noise"][1])


def test_dataloader(pipe):
    data = generate_batch(pipe, num_samples=4, size=(32, 32), save=False)
    dl = create_dataloader(data, batch_size=2, shuffle=True)
    batches = list(dl())
    assert len(batches) == 2
    assert batches[0]["noise"].shape[0] == 2
    assert set(batches[0]) == {"noise", "context", "v_teacher"}


def test_one_step_inference(pipe):
    gen = SeaweedWanAPTGenerator(pipe)
    video = gen.generate("a cat", size=(32, 32), frame_num=5, seed=1)
    assert video.shape == (3, 5, 32, 32)
    assert np.isfinite(np.asarray(video)).all()
    assert set(gen.timings) == {"text_encode_s", "dit_s", "vae_decode_s",
                                "frames_per_sec"}


def test_one_step_generate_batch(pipe):
    """Throughput mode: B prompts, ONE forward; per-clip noise is
    fold_in(seed, i), so a clip does not depend on the batch it rode in
    with — batch[0] must reproduce the single-clip result bit-for-bit
    when fed the same context slice."""
    gen = SeaweedWanAPTGenerator(pipe)
    ctx, lens = pipe.encode_text(["a cat", "a dog"])
    videos = gen.generate_batch(["a cat", "a dog"], size=(32, 32),
                                frame_num=5, seed=3,
                                context=ctx, context_lens=lens)
    assert videos.shape == (2, 3, 5, 32, 32)
    assert np.isfinite(np.asarray(videos)).all()
    assert not np.allclose(np.asarray(videos[0]), np.asarray(videos[1]))

    solo = gen.generate("a cat", size=(32, 32), frame_num=5, seed=3,
                        context=ctx[:1], context_lens=lens[:1])
    np.testing.assert_allclose(np.asarray(solo), np.asarray(videos[0]),
                               atol=2e-5, rtol=1e-5)


def test_teacher_data_visualization(pipe, tmp_path):
    from omnihuman_tpu.apt.generate import visualize_and_save_batch_with_vae
    data = generate_batch(pipe, num_samples=2, size=(32, 32), save=False)
    out = visualize_and_save_batch_with_vae(
        data, pipe, out_path=str(tmp_path / "viz.png"), num_samples=2)
    import os
    assert os.path.exists(out)
