"""InceptionV3 feature extractor for FID / IS — JAX, TPU-native.

The reference evaluation used torchmetrics' FrechetInceptionDistance /
InceptionScore (Omnihuman/omnihuman-eval.py:20-28, 160-170), i.e. the
standard InceptionV3 pool3 (2048-d) features + class logits. Neither
torchvision nor torchmetrics is available in this image, so this is a
from-scratch functional InceptionV3:

  - architecture matches torchvision `inception_v3` (and therefore the
    pytorch-fid `pt_inception` checkpoint layout): BasicConv2d (conv +
    frozen BatchNorm, eps 1e-3) stem, Mixed_5b..7c inception blocks,
    global average pool → 2048 features → fc logits.
  - `convert_inception_torch` maps a torchvision/pytorch-fid state dict
    (the standard `pt_inception-2015-12-05` weights) onto the PyTree, so
    real FID is available the moment a weights file is supplied.
  - without weights, parameters are deterministically random-initialised:
    random-CNN Fréchet features are a documented, content-sensitive proxy
    (and strictly stronger than the previous downsampled-pixel stand-in);
    tests pin FID(identical)≈0 and FID(distinct)≫0.
  - avg-pools inside inception blocks use count_include_pad=False
    semantics like torch's AvgPool2d(count_include_pad=False) in the FID
    variant.

Input convention matches pytorch-fid: NCHW float in [-1, 1], bilinearly
resized to 299x299.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# init


def _conv_init(key, cin, cout, kh, kw):
    fan_in = cin * kh * kw
    std = math.sqrt(2.0 / fan_in)
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout)) * std,
        # frozen inference BatchNorm, folded at apply time
        "bn_scale": jnp.ones((cout,)), "bn_bias": jnp.zeros((cout,)),
        "bn_mean": jnp.zeros((cout,)), "bn_var": jnp.ones((cout,)),
    }


def _inception_a_init(key, cin, pool_features):
    ks = jax.random.split(key, 7)
    return {
        "b1x1": _conv_init(ks[0], cin, 64, 1, 1),
        "b5x5_1": _conv_init(ks[1], cin, 48, 1, 1),
        "b5x5_2": _conv_init(ks[2], 48, 64, 5, 5),
        "b3x3dbl_1": _conv_init(ks[3], cin, 64, 1, 1),
        "b3x3dbl_2": _conv_init(ks[4], 64, 96, 3, 3),
        "b3x3dbl_3": _conv_init(ks[5], 96, 96, 3, 3),
        "bpool": _conv_init(ks[6], cin, pool_features, 1, 1),
    }


def _inception_b_init(key, cin):
    ks = jax.random.split(key, 4)
    return {
        "b3x3": _conv_init(ks[0], cin, 384, 3, 3),
        "b3x3dbl_1": _conv_init(ks[1], cin, 64, 1, 1),
        "b3x3dbl_2": _conv_init(ks[2], 64, 96, 3, 3),
        "b3x3dbl_3": _conv_init(ks[3], 96, 96, 3, 3),
    }


def _inception_c_init(key, cin, c7):
    ks = jax.random.split(key, 10)
    return {
        "b1x1": _conv_init(ks[0], cin, 192, 1, 1),
        "b7x7_1": _conv_init(ks[1], cin, c7, 1, 1),
        "b7x7_2": _conv_init(ks[2], c7, c7, 1, 7),
        "b7x7_3": _conv_init(ks[3], c7, 192, 7, 1),
        "b7x7dbl_1": _conv_init(ks[4], cin, c7, 1, 1),
        "b7x7dbl_2": _conv_init(ks[5], c7, c7, 7, 1),
        "b7x7dbl_3": _conv_init(ks[6], c7, c7, 1, 7),
        "b7x7dbl_4": _conv_init(ks[7], c7, c7, 7, 1),
        "b7x7dbl_5": _conv_init(ks[8], c7, 192, 1, 7),
        "bpool": _conv_init(ks[9], cin, 192, 1, 1),
    }


def _inception_d_init(key, cin):
    ks = jax.random.split(key, 6)
    return {
        "b3x3_1": _conv_init(ks[0], cin, 192, 1, 1),
        "b3x3_2": _conv_init(ks[1], 192, 320, 3, 3),
        "b7x7x3_1": _conv_init(ks[2], cin, 192, 1, 1),
        "b7x7x3_2": _conv_init(ks[3], 192, 192, 1, 7),
        "b7x7x3_3": _conv_init(ks[4], 192, 192, 7, 1),
        "b7x7x3_4": _conv_init(ks[5], 192, 192, 3, 3),
    }


def _inception_e_init(key, cin):
    ks = jax.random.split(key, 9)
    return {
        "b1x1": _conv_init(ks[0], cin, 320, 1, 1),
        "b3x3_1": _conv_init(ks[1], cin, 384, 1, 1),
        "b3x3_2a": _conv_init(ks[2], 384, 384, 1, 3),
        "b3x3_2b": _conv_init(ks[3], 384, 384, 3, 1),
        "b3x3dbl_1": _conv_init(ks[4], cin, 448, 1, 1),
        "b3x3dbl_2": _conv_init(ks[5], 448, 384, 3, 3),
        "b3x3dbl_3a": _conv_init(ks[6], 384, 384, 1, 3),
        "b3x3dbl_3b": _conv_init(ks[7], 384, 384, 3, 1),
        "bpool": _conv_init(ks[8], cin, 192, 1, 1),
    }


def init_inception(key: jax.Array, num_classes: int = 1008) -> Params:
    """Full FID InceptionV3 PyTree (pt_inception has 1008 classes)."""
    ks = jax.random.split(key, 20)
    p: Params = {
        "Conv2d_1a_3x3": _conv_init(ks[0], 3, 32, 3, 3),
        "Conv2d_2a_3x3": _conv_init(ks[1], 32, 32, 3, 3),
        "Conv2d_2b_3x3": _conv_init(ks[2], 32, 64, 3, 3),
        "Conv2d_3b_1x1": _conv_init(ks[3], 64, 80, 1, 1),
        "Conv2d_4a_3x3": _conv_init(ks[4], 80, 192, 3, 3),
        "Mixed_5b": _inception_a_init(ks[5], 192, 32),
        "Mixed_5c": _inception_a_init(ks[6], 256, 64),
        "Mixed_5d": _inception_a_init(ks[7], 288, 64),
        "Mixed_6a": _inception_b_init(ks[8], 288),
        "Mixed_6b": _inception_c_init(ks[9], 768, 128),
        "Mixed_6c": _inception_c_init(ks[10], 768, 160),
        "Mixed_6d": _inception_c_init(ks[11], 768, 160),
        "Mixed_6e": _inception_c_init(ks[12], 768, 192),
        "Mixed_7a": _inception_d_init(ks[13], 768),
        "Mixed_7b": _inception_e_init(ks[14], 1280),
        "Mixed_7c": _inception_e_init(ks[15], 2048),
        "fc": {"w": jax.random.normal(ks[16], (2048, num_classes)) * 0.02,
               "b": jnp.zeros((num_classes,))},
    }
    return p


# ---------------------------------------------------------------------------
# apply


def _conv_bn(p, x, stride=1, padding="VALID"):
    """BasicConv2d: conv (no bias) + frozen BN + ReLU. x: NHWC."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    inv = jax.lax.rsqrt(p["bn_var"].astype(jnp.float32) + _BN_EPS)
    scale = (p["bn_scale"] * inv).astype(y.dtype)
    bias = (p["bn_bias"] - p["bn_mean"] * p["bn_scale"] * inv).astype(y.dtype)
    return jax.nn.relu(y * scale + bias)


def _pad_for(k):
    ph, pw = (k[0] - 1) // 2, (k[1] - 1) // 2
    return [(ph, ph), (pw, pw)]


def _max_pool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _avg_pool_same(x, k=3):
    """3x3 stride-1 SAME avg pool with count_include_pad=False (torch
    AvgPool2d semantics inside the FID inception blocks)."""
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1),
        [(lo, hi) for lo, hi in pad])
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1),
        [(lo, hi) for lo, hi in pad])
    return summed / counts


def _inception_a(p, x):
    b1 = _conv_bn(p["b1x1"], x)
    b5 = _conv_bn(p["b5x5_2"], _conv_bn(p["b5x5_1"], x),
                  padding=_pad_for((5, 5)))
    bd = _conv_bn(p["b3x3dbl_1"], x)
    bd = _conv_bn(p["b3x3dbl_2"], bd, padding=_pad_for((3, 3)))
    bd = _conv_bn(p["b3x3dbl_3"], bd, padding=_pad_for((3, 3)))
    bp = _conv_bn(p["bpool"], _avg_pool_same(x))
    return jnp.concatenate([b1, b5, bd, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv_bn(p["b3x3"], x, stride=2)
    bd = _conv_bn(p["b3x3dbl_1"], x)
    bd = _conv_bn(p["b3x3dbl_2"], bd, padding=_pad_for((3, 3)))
    bd = _conv_bn(p["b3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x):
    b1 = _conv_bn(p["b1x1"], x)
    b7 = _conv_bn(p["b7x7_1"], x)
    b7 = _conv_bn(p["b7x7_2"], b7, padding=_pad_for((1, 7)))
    b7 = _conv_bn(p["b7x7_3"], b7, padding=_pad_for((7, 1)))
    bd = _conv_bn(p["b7x7dbl_1"], x)
    bd = _conv_bn(p["b7x7dbl_2"], bd, padding=_pad_for((7, 1)))
    bd = _conv_bn(p["b7x7dbl_3"], bd, padding=_pad_for((1, 7)))
    bd = _conv_bn(p["b7x7dbl_4"], bd, padding=_pad_for((7, 1)))
    bd = _conv_bn(p["b7x7dbl_5"], bd, padding=_pad_for((1, 7)))
    bp = _conv_bn(p["bpool"], _avg_pool_same(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv_bn(p["b3x3_2"], _conv_bn(p["b3x3_1"], x), stride=2)
    b7 = _conv_bn(p["b7x7x3_1"], x)
    b7 = _conv_bn(p["b7x7x3_2"], b7, padding=_pad_for((1, 7)))
    b7 = _conv_bn(p["b7x7x3_3"], b7, padding=_pad_for((7, 1)))
    b7 = _conv_bn(p["b7x7x3_4"], b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x):
    b1 = _conv_bn(p["b1x1"], x)
    b3 = _conv_bn(p["b3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["b3x3_2a"], b3, padding=_pad_for((1, 3))),
        _conv_bn(p["b3x3_2b"], b3, padding=_pad_for((3, 1)))], axis=-1)
    bd = _conv_bn(p["b3x3dbl_1"], x)
    bd = _conv_bn(p["b3x3dbl_2"], bd, padding=_pad_for((3, 3)))
    bd = jnp.concatenate([
        _conv_bn(p["b3x3dbl_3a"], bd, padding=_pad_for((1, 3))),
        _conv_bn(p["b3x3dbl_3b"], bd, padding=_pad_for((3, 1)))], axis=-1)
    bp = _conv_bn(p["bpool"], _avg_pool_same(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


@functools.partial(jax.jit, static_argnames=("with_logits",))
def inception_forward(params: Params, images: jnp.ndarray,
                      with_logits: bool = False):
    """images: [N, 3, H, W] in [-1, 1] → pool3 features [N, 2048]
    (+ logits [N, num_classes] when with_logits)."""
    x = jnp.transpose(images.astype(jnp.float32), (0, 2, 3, 1))  # NHWC
    if x.shape[1:3] != (299, 299):
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                             "bilinear")
    x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv_bn(params["Conv2d_2a_3x3"], x)
    x = _conv_bn(params["Conv2d_2b_3x3"], x, padding=_pad_for((3, 3)))
    x = _max_pool(x)
    x = _conv_bn(params["Conv2d_3b_1x1"], x)
    x = _conv_bn(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x)
    x = _inception_e(params["Mixed_7c"], x)
    feats = jnp.mean(x, axis=(1, 2))                       # [N, 2048]
    if with_logits:
        logits = feats @ params["fc"]["w"] + params["fc"]["b"]
        return feats, logits
    return feats


# ---------------------------------------------------------------------------
# torch checkpoint conversion


def convert_inception_torch(sd: Dict[str, np.ndarray],
                            num_classes: Optional[int] = None) -> Params:
    """Map a torchvision/pytorch-fid InceptionV3 state dict onto the
    PyTree (weights like `Mixed_5b.branch1x1.conv.weight`). Accepts both
    torchvision (1000-class) and pt_inception-2015-12-05 (1008) heads."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def conv(prefix):
        return {
            "w": jnp.asarray(sd[f"{prefix}.conv.weight"]).transpose(
                2, 3, 1, 0),                      # OIHW → HWIO
            "bn_scale": jnp.asarray(sd[f"{prefix}.bn.weight"]),
            "bn_bias": jnp.asarray(sd[f"{prefix}.bn.bias"]),
            "bn_mean": jnp.asarray(sd[f"{prefix}.bn.running_mean"]),
            "bn_var": jnp.asarray(sd[f"{prefix}.bn.running_var"]),
        }

    def block(name, mapping):
        return {ours: conv(f"{name}.{theirs}")
                for ours, theirs in mapping.items()}

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

    p: Params = {}
    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        p[stem] = conv(stem)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        p[n] = block(n, a_map)
    p["Mixed_6a"] = block("Mixed_6a", b_map)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        p[n] = block(n, c_map)
    p["Mixed_7a"] = block("Mixed_7a", d_map)
    for n in ("Mixed_7b", "Mixed_7c"):
        p[n] = block(n, e_map)
    p["fc"] = {"w": jnp.asarray(sd["fc.weight"]).T,
               "b": jnp.asarray(sd["fc.bias"])}
    return p


# ---------------------------------------------------------------------------
# evaluator-facing feature fns


class InceptionFeatures:
    """Batched pool3-feature / IS-logit extractor for the eval suite.

    weights_path: a torch state dict (.pth) with torchvision naming; None
    → deterministic random init (content-sensitive Fréchet proxy,
    documented in the module docstring).
    """

    _param_cache: Dict[tuple, Params] = {}

    def __init__(self, weights_path: Optional[str] = None, seed: int = 0,
                 batch_size: int = 16):
        # params memoized per (path, seed): evaluators are constructed
        # per-run/per-test and the ~24M-param init/convert is pure
        key = (weights_path, seed)
        cached = self._param_cache.get(key)
        if cached is not None:
            self.params = cached
            self.pretrained = bool(weights_path)
        elif weights_path:
            from omnihuman_tpu.utils.convert import load_torch_state_dict
            self.params = convert_inception_torch(
                load_torch_state_dict(weights_path))
            self.pretrained = True
        else:
            self.params = init_inception(jax.random.key(seed))
            self.pretrained = False
        self._param_cache[key] = self.params
        self.batch_size = batch_size

    def _batched(self, frames: np.ndarray, with_logits: bool):
        outs = []
        for i in range(0, frames.shape[0], self.batch_size):
            chunk = jnp.asarray(frames[i:i + self.batch_size])
            outs.append(inception_forward(self.params, chunk,
                                          with_logits=with_logits))
        if with_logits:
            return (np.concatenate([np.asarray(o[0]) for o in outs]),
                    np.concatenate([np.asarray(o[1]) for o in outs]))
        return np.concatenate([np.asarray(o) for o in outs])

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        """[N, 3, H, W] in [-1, 1] → [N, 2048] pool3 features."""
        return self._batched(np.asarray(frames, np.float32), False)

    def logits(self, frames: np.ndarray) -> np.ndarray:
        """[N, 3, H, W] → [N, num_classes] class logits (for IS)."""
        return self._batched(np.asarray(frames, np.float32), True)[1]

    def video_features(self, videos: np.ndarray) -> np.ndarray:
        """[N, C, T, H, W] → [N, 4096]: temporal mean ++ std of per-frame
        pool3 features — an Inception-based FVD stand-in until a real
        I3D/VideoMAE checkpoint is supplied (the reference's I3D was a
        torch.randn placeholder, omnihuman-eval.py:30-33)."""
        n, c, t = videos.shape[:3]
        flat = np.asarray(videos, np.float32).transpose(
            0, 2, 1, 3, 4).reshape(n * t, c, *videos.shape[3:])
        feats = self(flat).reshape(n, t, -1)
        return np.concatenate([feats.mean(1), feats.std(1)], axis=-1)