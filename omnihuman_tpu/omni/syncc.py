"""Sync-C audio-visual embedders (SyncNet-style) natively in JAX.

The reference's Sync-C lip-sync metric ran on `torch.randn` placeholder
features (Omnihuman/omnihuman-eval.py:97-109). This module provides the
real structure: a two-tower contrastive embedder — an audio tower over
per-frame audio features (log-mel or wav2vec tokens, `omni/wav2vec.py`)
and a visual tower over 5-frame mouth-crop windows — whose cosine
agreement is the Sync-C confidence. Init/apply pairs over a params
PyTree plus a torch-state-dict converter with a parity test
(`tests/test_syncc.py`), the same strategy as Sapiens/Inception/I3D.

Without trained weights the score is a deterministic random-init proxy
and is tagged as such by the evaluator (`feature_space`-style honesty);
with converted weights the same graph produces the real metric.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, object]


@dataclass(frozen=True)
class SyncCConfig:
    embed_dim: int = 256
    window: int = 5                    # frames per sync window
    crop_size: int = 48                # mouth crop resized to S x S
    visual_channels: Tuple[int, ...] = (32, 64, 128)
    audio_hidden: int = 256
    # mouth region as fractions of (H, W): lower-center of the frame
    crop_rows: Tuple[float, float] = (0.55, 0.95)
    crop_cols: Tuple[float, float] = (0.30, 0.70)


SYNCC_PRESETS = {
    "default": SyncCConfig(),
    "tiny-test": SyncCConfig(embed_dim=16, crop_size=16,
                             visual_channels=(4, 8), audio_hidden=16),
}


def _lin(key, din, dout):
    k1, k2 = jax.random.split(key)
    lim = 1.0 / np.sqrt(din)
    return {"w": jax.random.uniform(k1, (din, dout), jnp.float32, -lim, lim),
            "b": jax.random.uniform(k2, (dout,), jnp.float32, -lim, lim)}


def _conv(key, cin, cout, k=3):
    lim = 1.0 / np.sqrt(cin * k * k * k)
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (k, k, k, cin, cout), jnp.float32,
                                    -lim, lim),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -lim, lim)}


def init_syncc(key: jax.Array, cfg: SyncCConfig,
               audio_dim: int = 1024) -> Params:
    ks = iter(jax.random.split(key, 8))
    p: Params = {
        "audio_fc1": _lin(next(ks), audio_dim, cfg.audio_hidden),
        "audio_fc2": _lin(next(ks), cfg.audio_hidden, cfg.embed_dim),
    }
    cin = 3
    for i, cout in enumerate(cfg.visual_channels):
        p[f"visual_conv{i}"] = _conv(next(ks), cin, cout)
        cin = cout
    p["visual_fc"] = _lin(next(ks), cin, cfg.embed_dim)
    return p


def _l2norm(x, axis=-1, eps=1e-8):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def syncc_audio_embed(params: Params, feats: jnp.ndarray,
                      cfg: SyncCConfig) -> jnp.ndarray:
    """[N, window, D_audio] per-window audio features -> [N, embed_dim]
    L2-normalized embeddings."""
    h = feats @ params["audio_fc1"]["w"] + params["audio_fc1"]["b"]
    h = jax.nn.relu(h).mean(axis=1)                     # pool the window
    h = h @ params["audio_fc2"]["w"] + params["audio_fc2"]["b"]
    return _l2norm(h)


def syncc_visual_embed(params: Params, crops: jnp.ndarray,
                       cfg: SyncCConfig) -> jnp.ndarray:
    """[N, window, S, S, 3] mouth-crop windows -> [N, embed_dim]."""
    h = crops
    for i in range(len(cfg.visual_channels)):
        c = params[f"visual_conv{i}"]
        # symmetric pad=1 (torch Conv3d(padding=1) convention — the
        # checkpoint contract; TF-SAME would pad (0,1) at stride 2)
        h = jax.lax.conv_general_dilated(
            h, c["w"], window_strides=(1, 2, 2),
            padding=[(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + c["b"]
        h = jax.nn.relu(h)
    h = h.mean(axis=(1, 2, 3))                          # global avg pool
    h = h @ params["visual_fc"]["w"] + params["visual_fc"]["b"]
    return _l2norm(h)


# ---------------------------------------------------------------------------
# torch conversion


def _t(a) -> np.ndarray:
    try:
        return a.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(a)


def convert_syncc(state_dict, cfg: SyncCConfig) -> Params:
    """Torch two-tower state dict (``audio_fc1.weight``,
    ``visual_conv0.weight`` [out, in, kT, kH, kW], ...) -> params."""
    sd = dict(state_dict)

    def lin(name):
        return {"w": jnp.asarray(_t(sd[name + ".weight"]), jnp.float32).T,
                "b": jnp.asarray(_t(sd[name + ".bias"]), jnp.float32)}

    p: Params = {"audio_fc1": lin("audio_fc1"),
                 "audio_fc2": lin("audio_fc2"),
                 "visual_fc": lin("visual_fc")}
    for i in range(len(cfg.visual_channels)):
        n = f"visual_conv{i}"
        p[n] = {"w": jnp.asarray(_t(sd[n + ".weight"]), jnp.float32
                                 ).transpose(2, 3, 4, 1, 0),
                "b": jnp.asarray(_t(sd[n + ".bias"]), jnp.float32)}
    return p


# ---------------------------------------------------------------------------
# evaluator hook


class SyncCEmbedders:
    """Builds the (audio_embed_fn, visual_embed_fn) pair for
    `LipSyncEvaluator` / `OmniHumanEvaluator`.

    audio_embed_fn: [T, D_audio] per-frame features -> [N, D] window
    embeddings (stride-1 windows of cfg.window frames).
    visual_embed_fn: [C, T, H, W] video in [-1, 1] -> [N, D] mouth-crop
    window embeddings. Both towers share the window count, so the
    evaluator's cosine pairing lines up 1:1."""

    def __init__(self, weights_path: Optional[str] = None,
                 preset: str = "default", audio_dim: int = 1024,
                 seed: int = 0, params: Optional[Params] = None,
                 cfg: Optional[SyncCConfig] = None):
        self.cfg = cfg if cfg is not None else SYNCC_PRESETS[preset]
        self.audio_dim = audio_dim
        if params is not None:
            self.params = params
            self.random_init = False
        elif weights_path:
            import torch
            sd = torch.load(weights_path, map_location="cpu",
                            weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            self.params = convert_syncc(sd, self.cfg)
            self.random_init = False
        else:
            self.params = init_syncc(jax.random.key(seed), self.cfg,
                                     audio_dim)
            self.random_init = True
        self._aud = jax.jit(lambda p, f: syncc_audio_embed(p, f, self.cfg))
        self._vis = jax.jit(lambda p, c: syncc_visual_embed(p, c, self.cfg))

    def _windows(self, n_frames: int):
        w = self.cfg.window
        return range(max(n_frames - w + 1, 1))

    def audio_embed_fn(self, audio: np.ndarray) -> np.ndarray:
        a = np.asarray(audio, np.float32)
        if a.ndim == 1:                       # raw scalar envelope etc.
            a = np.tile(a[:, None], (1, self.audio_dim))
        if a.shape[1] != self.audio_dim:      # tile/trim to tower width
            reps = int(np.ceil(self.audio_dim / a.shape[1]))
            a = np.tile(a, (1, reps))[:, :self.audio_dim]
        w = self.cfg.window
        if len(a) < w:
            a = np.pad(a, ((0, w - len(a)), (0, 0)))
        wins = np.stack([a[i:i + w] for i in self._windows(len(a))])
        return np.asarray(self._aud(self.params, jnp.asarray(wins)))

    def visual_embed_fn(self, video: np.ndarray) -> np.ndarray:
        v = np.asarray(video, np.float32)     # [C, T, H, W]
        c, t, h, wd = v.shape
        r0, r1 = (int(f * h) for f in self.cfg.crop_rows)
        c0, c1 = (int(f * wd) for f in self.cfg.crop_cols)
        crop = v[:, :, max(r0, 0):max(r1, r0 + 1),
                 max(c0, 0):max(c1, c0 + 1)]
        crop = crop.transpose(1, 2, 3, 0)     # [T, Hc, Wc, C]
        if c == 1:
            crop = np.repeat(crop, 3, axis=-1)
        s = self.cfg.crop_size
        crop = np.asarray(jax.image.resize(
            jnp.asarray(crop), (t, s, s, crop.shape[-1]), "linear"))
        w = self.cfg.window
        if t < w:
            crop = np.concatenate(
                [crop, np.repeat(crop[-1:], w - t, axis=0)])
        wins = np.stack([crop[i:i + w] for i in self._windows(len(crop))])
        return np.asarray(self._vis(self.params, jnp.asarray(wins)))
