"""I3D (Inflated Inception-V1) video backbone natively in JAX — the
real temporal feature extractor for FVD.

The reference's FVD "I3D" is a `torch.randn` placeholder
(Omnihuman/omnihuman-eval.py:30-33). This module implements the actual
Kinetics I3D graph as an init/apply pair over a params PyTree, plus a
converter from the standard public torch checkpoint naming
(piergiaj/pytorch-i3d ``rgb_imagenet.pt`` / ``rgb_charades.pt``:
``Conv3d_1a_7x7.conv3d.weight``, ``Mixed_3b.b1a.bn.running_mean``,
``logits.conv3d.weight`` ...), following the same
implementation+converter+parity strategy as `omni/sapiens.py` and
`omni/inception.py`.

TPU-first choices: NDHWC layout end-to-end (`lax.conv_general_dilated`
with ("NDHWC", "DHWIO", "NDHWC")), TF-style SAME padding (what the
original TF graph and the torch port's hand-rolled pad emulate),
folded-BN at conversion time is deliberately NOT done (running stats
kept explicit so converted checkpoints remain inspectable); the whole
[B, T, H, W, 3] -> features forward is one jittable function.

FVD features: the 1024-d global-average of the Mixed_5c map (the common
choice in public FVD ports; the 400-d Kinetics logits are also exposed
— logits are a 1x1x1 conv, i.e. linear, so they commute with the global
mean and match the official avg-pool+conv+time-mean head exactly for
any input the pool fully covers).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, object]

# InceptionModule channel plan: name -> (b0, b1a, b1b, b2a, b2b, b3b)
_MIXED = (
    ("Mixed_3b", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", (128, 128, 192, 32, 96, 64)),
    ("Mixed_4b", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5b", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", (384, 192, 384, 48, 128, 128)),
)


@dataclass(frozen=True)
class I3DConfig:
    num_classes: int = 400
    width_mult: float = 1.0     # tiny-test shrink factor
    bn_eps: float = 1e-3        # piergiaj Unit3D BatchNorm3d eps

    def ch(self, c: int) -> int:
        return max(4, int(round(c * self.width_mult)))


I3D_PRESETS = {
    "kinetics-400": I3DConfig(),
    "tiny-test": I3DConfig(num_classes=11, width_mult=0.125),
}


# ---------------------------------------------------------------------------
# init


def _unit_init(key, cin, cout, k: Tuple[int, int, int], bn=True, bias=False):
    fan_in = cin * k[0] * k[1] * k[2]
    u = {"w": jax.random.normal(key, (*k, cin, cout), jnp.float32)
         * np.sqrt(2.0 / fan_in)}
    if bias:
        u["b"] = jnp.zeros((cout,), jnp.float32)
    if bn:
        u["bn"] = {"g": jnp.ones((cout,), jnp.float32),
                   "b": jnp.zeros((cout,), jnp.float32),
                   "m": jnp.zeros((cout,), jnp.float32),
                   "v": jnp.ones((cout,), jnp.float32)}
    return u


def _mixed_init(key, cfg: I3DConfig, cin, plan):
    b0, b1a, b1b, b2a, b2b, b3b = (cfg.ch(c) for c in plan)
    ks = jax.random.split(key, 6)
    one, three = (1, 1, 1), (3, 3, 3)
    return {"b0": _unit_init(ks[0], cin, b0, one),
            "b1a": _unit_init(ks[1], cin, b1a, one),
            "b1b": _unit_init(ks[2], b1a, b1b, three),
            "b2a": _unit_init(ks[3], cin, b2a, one),
            "b2b": _unit_init(ks[4], b2a, b2b, three),
            "b3b": _unit_init(ks[5], cin, b3b, one)}


def mixed_out(cfg: I3DConfig, plan) -> int:
    b0, _, b1b, _, b2b, b3b = (cfg.ch(c) for c in plan)
    return b0 + b1b + b2b + b3b


def init_i3d(key: jax.Array, cfg: I3DConfig) -> Params:
    keys = iter(jax.random.split(key, 16))
    p: Params = {}
    c64, c192 = cfg.ch(64), cfg.ch(192)
    p["Conv3d_1a_7x7"] = _unit_init(next(keys), 3, c64, (7, 7, 7))
    p["Conv3d_2b_1x1"] = _unit_init(next(keys), c64, c64, (1, 1, 1))
    p["Conv3d_2c_3x3"] = _unit_init(next(keys), c64, c192, (3, 3, 3))
    cin = c192
    for name, plan in _MIXED:
        p[name] = _mixed_init(next(keys), cfg, cin, plan)
        cin = mixed_out(cfg, plan)
    p["logits"] = _unit_init(next(keys), cin, cfg.num_classes, (1, 1, 1),
                             bn=False, bias=True)
    return p


# ---------------------------------------------------------------------------
# apply


def _unit(p, x, cfg: I3DConfig, stride=(1, 1, 1), relu=True):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if "b" in p:
        y = y + p["b"]
    if "bn" in p:
        bn = p["bn"]
        y = (y - bn["m"]) * jax.lax.rsqrt(bn["v"] + cfg.bn_eps)
        y = y * bn["g"] + bn["b"]
    return jax.nn.relu(y) if relu else y


def _max_pool(x, k, s):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, *k, 1), (1, *s, 1), "SAME")


def _mixed(p, x, cfg: I3DConfig):
    b0 = _unit(p["b0"], x, cfg)
    b1 = _unit(p["b1b"], _unit(p["b1a"], x, cfg), cfg)
    b2 = _unit(p["b2b"], _unit(p["b2a"], x, cfg), cfg)
    b3 = _unit(p["b3b"], _max_pool(x, (3, 3, 3), (1, 1, 1)), cfg)
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_forward(params: Params, video: jnp.ndarray, cfg: I3DConfig,
                with_logits: bool = False):
    """video [B, T, H, W, 3] in [-1, 1] -> [B, 1024] pooled features
    (and [B, num_classes] logits when `with_logits`)."""
    x = _unit(params["Conv3d_1a_7x7"], video, cfg, stride=(2, 2, 2))
    x = _max_pool(x, (1, 3, 3), (1, 2, 2))
    x = _unit(params["Conv3d_2b_1x1"], x, cfg)
    x = _unit(params["Conv3d_2c_3x3"], x, cfg)
    x = _max_pool(x, (1, 3, 3), (1, 2, 2))
    for name, _ in _MIXED:
        if name == "Mixed_4b":
            x = _max_pool(x, (3, 3, 3), (2, 2, 2))
        elif name == "Mixed_5b":
            x = _max_pool(x, (2, 2, 2), (2, 2, 2))
        x = _mixed(params[name], x, cfg)
    feats = jnp.mean(x, axis=(1, 2, 3))                    # [B, 1024]
    if not with_logits:
        return feats
    lp = params["logits"]
    logits = feats @ lp["w"][0, 0, 0] + lp["b"]
    return feats, logits


# ---------------------------------------------------------------------------
# torch conversion (piergiaj/pytorch-i3d naming)


def _t(a) -> np.ndarray:
    try:
        return a.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(a)


def convert_i3d(state_dict, cfg: I3DConfig) -> Params:
    """piergiaj/pytorch-i3d ``InceptionI3d.state_dict()`` -> params.

    torch conv3d weight [out, in, kT, kH, kW] -> ours [kT, kH, kW, in,
    out]; BN running stats kept explicit."""
    sd = dict(state_dict)

    def unit(prefix, bn=True, bias=False):
        u = {"w": jnp.asarray(_t(sd[prefix + ".conv3d.weight"]),
                              jnp.float32).transpose(2, 3, 4, 1, 0)}
        if bias or prefix + ".conv3d.bias" in sd:
            u["b"] = jnp.asarray(_t(sd[prefix + ".conv3d.bias"]),
                                 jnp.float32)
        if bn:
            u["bn"] = {
                "g": jnp.asarray(_t(sd[prefix + ".bn.weight"]), jnp.float32),
                "b": jnp.asarray(_t(sd[prefix + ".bn.bias"]), jnp.float32),
                "m": jnp.asarray(_t(sd[prefix + ".bn.running_mean"]),
                                 jnp.float32),
                "v": jnp.asarray(_t(sd[prefix + ".bn.running_var"]),
                                 jnp.float32)}
        return u

    p: Params = {
        "Conv3d_1a_7x7": unit("Conv3d_1a_7x7"),
        "Conv3d_2b_1x1": unit("Conv3d_2b_1x1"),
        "Conv3d_2c_3x3": unit("Conv3d_2c_3x3"),
    }
    for name, _ in _MIXED:
        p[name] = {b: unit(f"{name}.{b}")
                   for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")}
    p["logits"] = unit("logits", bn=False, bias=True)
    return p


# ---------------------------------------------------------------------------
# FVD feature hook


class I3DVideoFeatures:
    """Temporal FVD feature extractor for `omni/evaluate.py`.

    Contract matches `InceptionFeatures.video_features`:
    [N, C, T, H, W] in [-1, 1] -> [N, 1024]. Unlike the per-frame
    Inception mean++std stand-in (inception.py:397-406), these features
    see joint space-time patterns — frame-shuffled videos score far
    from their ordered originals (tests/test_i3d.py)."""

    def __init__(self, weights_path: Optional[str] = None,
                 preset: str = "kinetics-400", seed: int = 0,
                 batch_size: int = 4,
                 params: Optional[Params] = None,
                 cfg: Optional[I3DConfig] = None):
        self.cfg = cfg if cfg is not None else I3D_PRESETS[preset]
        self.batch_size = batch_size
        if params is not None:
            self.params = params
            self.random_init = False
        elif weights_path:
            import torch
            sd = torch.load(weights_path, map_location="cpu",
                            weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            self.params = convert_i3d(sd, self.cfg)
            self.random_init = False
        else:
            self.params = init_i3d(jax.random.key(seed), self.cfg)
            self.random_init = True
        self._fwd = jax.jit(lambda p, v: i3d_forward(p, v, self.cfg))

    def __call__(self, videos: np.ndarray) -> np.ndarray:
        v = np.asarray(videos, np.float32)
        if v.ndim != 5:
            raise ValueError(f"expected [N, C, T, H, W], got {v.shape}")
        v = v.transpose(0, 2, 3, 4, 1)                    # NDHWC
        outs = []
        for i in range(0, v.shape[0], self.batch_size):
            outs.append(np.asarray(
                self._fwd(self.params, jnp.asarray(v[i:i + self.batch_size]))
            ))
        return np.concatenate(outs)
