"""JAX InceptionV3 FID/IS extractor (reference used torchmetrics'
InceptionV3 + InceptionScore, omnihuman-eval.py:20-28,160-170)."""

import numpy as np
import pytest

from omnihuman_tpu.omni.evaluate import (
    FrechetInceptionDistance, inception_score)
from omnihuman_tpu.omni.inception import (
    InceptionFeatures, convert_inception_torch, inception_forward,
    init_inception)


@pytest.fixture(scope="module")
def extractor():
    return InceptionFeatures(weights_path=None, seed=0, batch_size=4)


def _images(seed, n=3, offset=0.0):
    rng = np.random.default_rng(seed)
    return np.clip(rng.normal(offset, 0.4, (n, 3, 64, 64)), -1, 1
                   ).astype(np.float32)


def test_feature_shape_and_determinism(extractor):
    f1 = extractor(_images(0))
    f2 = extractor(_images(0))
    assert f1.shape == (3, 2048)
    assert np.isfinite(f1).all()
    np.testing.assert_allclose(f1, f2)


def test_fid_identical_zero_distinct_large(extractor):
    a = _images(1, n=4)
    b = _images(2, n=4, offset=0.5)   # shifted distribution

    fid = FrechetInceptionDistance(extractor)
    fid.update(a, real=True)
    fid.update(a, real=False)
    assert abs(fid.compute()) < 1e-3          # identical sets → ~0

    fid.reset()
    fid.update(a, real=True)
    fid.update(b, real=False)
    assert fid.compute() > 1.0                 # distinct sets → >> 0


def test_inception_score_from_logits(extractor):
    logits = extractor.logits(_images(3, n=4))
    assert logits.shape == (4, 1008)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    s = inception_score(probs)
    assert np.isfinite(s) and s >= 1.0 - 1e-6


def test_video_features(extractor):
    vids = np.clip(np.random.default_rng(4).normal(
        0, 0.4, (2, 3, 3, 32, 32)), -1, 1).astype(np.float32)
    f = extractor.video_features(vids)
    assert f.shape == (2, 4096)
    assert np.isfinite(f).all()


def test_torch_state_dict_conversion_roundtrip():
    """Serialize our random params into a torchvision-named state dict,
    convert back, and require identical forwards — validates the mapping
    the standard pt_inception checkpoint will flow through."""
    import jax

    params = init_inception(jax.random.key(7))

    a_map = {"b1x1": "branch1x1", "b5x5_1": "branch5x5_1",
             "b5x5_2": "branch5x5_2", "b3x3dbl_1": "branch3x3dbl_1",
             "b3x3dbl_2": "branch3x3dbl_2", "b3x3dbl_3": "branch3x3dbl_3",
             "bpool": "branch_pool"}
    b_map = {"b3x3": "branch3x3", "b3x3dbl_1": "branch3x3dbl_1",
             "b3x3dbl_2": "branch3x3dbl_2", "b3x3dbl_3": "branch3x3dbl_3"}
    c_map = {"b1x1": "branch1x1", "b7x7_1": "branch7x7_1",
             "b7x7_2": "branch7x7_2", "b7x7_3": "branch7x7_3",
             "b7x7dbl_1": "branch7x7dbl_1", "b7x7dbl_2": "branch7x7dbl_2",
             "b7x7dbl_3": "branch7x7dbl_3", "b7x7dbl_4": "branch7x7dbl_4",
             "b7x7dbl_5": "branch7x7dbl_5", "bpool": "branch_pool"}
    d_map = {"b3x3_1": "branch3x3_1", "b3x3_2": "branch3x3_2",
             "b7x7x3_1": "branch7x7x3_1", "b7x7x3_2": "branch7x7x3_2",
             "b7x7x3_3": "branch7x7x3_3", "b7x7x3_4": "branch7x7x3_4"}
    e_map = {"b1x1": "branch1x1", "b3x3_1": "branch3x3_1",
             "b3x3_2a": "branch3x3_2a", "b3x3_2b": "branch3x3_2b",
             "b3x3dbl_1": "branch3x3dbl_1", "b3x3dbl_2": "branch3x3dbl_2",
             "b3x3dbl_3a": "branch3x3dbl_3a",
             "b3x3dbl_3b": "branch3x3dbl_3b", "bpool": "branch_pool"}
    maps = {"Mixed_5b": a_map, "Mixed_5c": a_map, "Mixed_5d": a_map,
            "Mixed_6a": b_map, "Mixed_6b": c_map, "Mixed_6c": c_map,
            "Mixed_6d": c_map, "Mixed_6e": c_map, "Mixed_7a": d_map,
            "Mixed_7b": e_map, "Mixed_7c": e_map}

    sd = {}

    def emit(prefix, cp):
        sd[f"{prefix}.conv.weight"] = np.asarray(cp["w"]).transpose(
            3, 2, 0, 1)                            # HWIO → OIHW
        sd[f"{prefix}.bn.weight"] = np.asarray(cp["bn_scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(cp["bn_bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(cp["bn_mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(cp["bn_var"])

    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        emit(stem, params[stem])
    for blk, m in maps.items():
        for ours, theirs in m.items():
            emit(f"{blk}.{theirs}", params[blk][ours])
    sd["fc.weight"] = np.asarray(params["fc"]["w"]).T
    sd["fc.bias"] = np.asarray(params["fc"]["b"])

    converted = convert_inception_torch(sd)
    x = _images(8, n=2)
    f_orig = np.asarray(inception_forward(params, x))
    f_conv = np.asarray(inception_forward(converted, x))
    np.testing.assert_allclose(f_orig, f_conv, atol=1e-5, rtol=1e-5)