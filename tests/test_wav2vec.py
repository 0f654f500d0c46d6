"""JAX Wav2Vec2: parity vs HuggingFace Wav2Vec2Model (the graph the
released checkpoints were trained with — same golden strategy as the
T5/UMT5 parity test), plus the dataset/CLI feature-hook contract.

Reference intent: audio features were meant to be wav2vec tokens
(README.md:124-128) but shipped as torch.randn placeholders
(Omnihuman/omnihuman_dataset.py:813-816)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omnihuman_tpu.omni.wav2vec import (
    WAV2VEC2_PRESETS, Wav2Vec2AudioFeatures, Wav2Vec2Config,
    convert_wav2vec, infer_wav2vec_config, init_wav2vec, wav2vec_forward)


def _hf_cfg(cfg: Wav2Vec2Config):
    from transformers import Wav2Vec2Config as HFConfig
    return HFConfig(
        conv_dim=list(cfg.conv_dim), conv_stride=list(cfg.conv_stride),
        conv_kernel=list(cfg.conv_kernel), conv_bias=cfg.conv_bias,
        feat_extract_norm=cfg.feat_extract_norm,
        hidden_size=cfg.hidden, num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads, intermediate_size=cfg.ffn,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, mask_time_prob=0.0)


@pytest.mark.parametrize("preset", ["tiny-test", "tiny-test-stable"])
def test_parity_vs_hf(preset):
    import torch
    from transformers import Wav2Vec2Model

    cfg = WAV2VEC2_PRESETS[preset]
    torch.manual_seed(0)
    model = Wav2Vec2Model(_hf_cfg(cfg)).eval()

    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 800)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(wav)).last_hidden_state.numpy()

    params = convert_wav2vec(model.state_dict(), cfg)
    got = np.asarray(wav2vec_forward(params, jnp.asarray(wav), cfg))
    assert got.shape == want.shape
    err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-6)
    assert err <= 1e-4, f"relative err {err}"


def test_infer_config_roundtrip():
    import torch
    from transformers import Wav2Vec2Model

    cfg = WAV2VEC2_PRESETS["tiny-test-stable"]
    torch.manual_seed(1)
    sd = Wav2Vec2Model(_hf_cfg(cfg)).state_dict()
    inferred = infer_wav2vec_config(sd)
    assert inferred.conv_dim == cfg.conv_dim
    assert inferred.conv_kernel == cfg.conv_kernel
    assert inferred.conv_bias == cfg.conv_bias
    assert inferred.feat_extract_norm == "layer"
    assert inferred.do_stable_layer_norm
    assert (inferred.hidden, inferred.layers, inferred.ffn) == (
        cfg.hidden, cfg.layers, cfg.ffn)


def test_num_tokens_matches_forward():
    cfg = WAV2VEC2_PRESETS["tiny-test"]
    params = init_wav2vec(jax.random.key(0), cfg)
    wav = jnp.zeros((1, 1234))
    out = wav2vec_forward(params, wav, cfg)
    assert out.shape == (1, cfg.num_tokens(1234), cfg.hidden)


def test_audio_feature_hook_contract():
    """Same (waveform, sr, num_frames) -> [num_frames, dim] contract as
    the log-mel AudioFeatureExtractor, so omni/dataset.py and the omni
    CLI can swap backends."""
    feat = Wav2Vec2AudioFeatures(preset="tiny-test", dim=48, fps=16.0)
    rng = np.random.default_rng(0)
    wav = rng.normal(size=22050).astype(np.float32)   # 1 s @ 22.05 kHz
    out = feat(wav, 22050, num_frames=21)
    assert out.shape == (21, 48)
    assert np.all(np.isfinite(out))
    # frames must differ (real features, not a constant placeholder)
    assert np.std(out, axis=0).max() > 0


def test_audio_feature_short_audio_padded():
    feat = Wav2Vec2AudioFeatures(preset="tiny-test", dim=16, fps=16.0)
    out = feat(np.zeros(10, np.float32), 16000, num_frames=4)
    assert out.shape == (4, 16)
    assert np.all(np.isfinite(out))
