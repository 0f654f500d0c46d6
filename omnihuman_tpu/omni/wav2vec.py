"""Wav2Vec2 audio encoder natively in JAX.

The reference *intended* wav2vec audio features for the omni-conditions
audio branch (README.md:124-128: "audio features (wav2vec tokens) via
cross-attention") but shipped `torch.randn` placeholders
(Omnihuman/omnihuman_dataset.py:813-816) and a librosa log-mel stand-in
in the CLI (Omnihuman/inference.py:29-56). This module completes that
intent: the HF Wav2Vec2 encoder graph as an init/apply pair over a
params PyTree, plus a converter from the released torch state-dict
naming (``feature_extractor.conv_layers.N.conv.weight`` etc.) — the
same implementation+converter+parity strategy as `omni/sapiens.py` and
`omni/inception.py`.

TPU-first choices:
  - encoder blocks' params stacked on a leading layer axis and scanned
    (one compiled block body regardless of depth);
  - convs via `lax.conv_general_dilated` in NTC layout;
  - the whole waveform->tokens forward is one jittable function with
    static config (frozen dataclass).

Parity: `tests/test_wav2vec.py` converts a randomly initialized HF
`transformers.Wav2Vec2Model` (the graph the released base/large
checkpoints were trained with) and matches its `last_hidden_state`
to <=1e-4 for both the base (group-norm, post-LN) and large
(layer-norm convs, stable pre-LN) topologies.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, object]


@dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"      # "group" (base) | "layer" (large)
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    ffn: int = 3072
    do_stable_layer_norm: bool = False    # False: post-LN (base)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    ln_eps: float = 1e-5

    @property
    def stride_total(self) -> int:
        out = 1
        for s in self.conv_stride:
            out *= s
        return out

    def num_tokens(self, num_samples: int) -> int:
        t = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            t = (t - k) // s + 1
        return t


WAV2VEC2_PRESETS = {
    "base": Wav2Vec2Config(),
    "large": Wav2Vec2Config(hidden=1024, layers=24, heads=16, ffn=4096,
                            feat_extract_norm="layer", conv_bias=True,
                            do_stable_layer_norm=True),
    "tiny-test": Wav2Vec2Config(conv_dim=(32, 32),
                                conv_stride=(5, 2), conv_kernel=(10, 3),
                                hidden=32, layers=2, heads=2, ffn=64,
                                num_conv_pos_embeddings=16,
                                num_conv_pos_embedding_groups=2),
    "tiny-test-stable": Wav2Vec2Config(conv_dim=(32, 32),
                                       conv_stride=(5, 2),
                                       conv_kernel=(10, 3), conv_bias=True,
                                       feat_extract_norm="layer",
                                       hidden=32, layers=2, heads=2, ffn=64,
                                       num_conv_pos_embeddings=16,
                                       num_conv_pos_embedding_groups=2,
                                       do_stable_layer_norm=True),
}

SAMPLE_RATE = 16000


# ---------------------------------------------------------------------------
# init


def _lin(key, din, dout):
    k1, k2 = jax.random.split(key)
    lim = 1.0 / np.sqrt(din)
    return {"w": jax.random.uniform(k1, (din, dout), jnp.float32, -lim, lim),
            "b": jax.random.uniform(k2, (dout,), jnp.float32, -lim, lim)}


def _ln(dim):
    return {"g": jnp.ones((dim,), jnp.float32),
            "b": jnp.zeros((dim,), jnp.float32)}


def init_wav2vec(key: jax.Array, cfg: Wav2Vec2Config) -> Params:
    keys = iter(jax.random.split(key, 64))
    p: Params = {}

    convs = []
    cin = 1
    for i, (cout, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        lim = 1.0 / np.sqrt(cin * k)
        c = {"w": jax.random.uniform(next(keys), (k, cin, cout), jnp.float32,
                                     -lim, lim)}
        if cfg.conv_bias:
            c["b"] = jnp.zeros((cout,), jnp.float32)
        if cfg.feat_extract_norm == "layer" or i == 0:
            c["norm"] = _ln(cout)
        convs.append(c)
        cin = cout
    p["convs"] = convs

    p["proj_ln"] = _ln(cfg.conv_dim[-1])
    p["proj"] = _lin(next(keys), cfg.conv_dim[-1], cfg.hidden)

    kpos = cfg.num_conv_pos_embeddings
    gin = cfg.hidden // cfg.num_conv_pos_embedding_groups
    lim = 1.0 / np.sqrt(gin * kpos)
    wv = jax.random.uniform(next(keys), (kpos, gin, cfg.hidden), jnp.float32,
                            -lim, lim)
    # g is per-kernel-position (torch weight_norm dim=2 on
    # [out, in/groups, K]); our v layout is [K, in/groups, out] so g is
    # [K, 1, 1]
    p["pos_conv"] = {"v": wv,
                     "g": jnp.linalg.norm(wv.reshape(kpos, -1),
                                          axis=1).reshape(kpos, 1, 1),
                     "b": jnp.zeros((cfg.hidden,), jnp.float32)}

    p["enc_ln"] = _ln(cfg.hidden)

    def block(key):
        ks = jax.random.split(key, 6)
        d, f = cfg.hidden, cfg.ffn
        return {"q": _lin(ks[0], d, d), "k": _lin(ks[1], d, d),
                "v": _lin(ks[2], d, d), "o": _lin(ks[3], d, d),
                "ln1": _ln(d), "fc1": _lin(ks[4], d, f),
                "fc2": _lin(ks[5], f, d), "ln2": _ln(d)}

    bkeys = jax.random.split(next(keys), cfg.layers)
    p["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[block(k) for k in bkeys])
    return p


# ---------------------------------------------------------------------------
# apply


def _layer_norm(x, p, eps):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["g"] + p["b"]


def _conv1d(x, w, stride, padding=0, groups=1, bias=None):
    """x [B, T, C], w [K, Cin/groups, Cout] -> [B, T', Cout]."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=groups)
    if bias is not None:
        y = y + bias
    return y


def _feature_encoder(params, x, cfg: Wav2Vec2Config):
    """x [B, samples] -> [B, T, conv_dim[-1]]."""
    h = x[:, :, None]
    for i, (c, k, s) in enumerate(zip(params["convs"], cfg.conv_kernel,
                                      cfg.conv_stride)):
        h = _conv1d(h, c["w"], s, bias=c.get("b"))
        if cfg.feat_extract_norm == "layer":
            h = _layer_norm(h, c["norm"], cfg.ln_eps)
        elif i == 0:
            # GroupNorm(groups == channels): per-channel stats over time
            m = jnp.mean(h, 1, keepdims=True)
            v = jnp.var(h, 1, keepdims=True)
            h = (h - m) * jax.lax.rsqrt(v + 1e-5)
            h = h * c["norm"]["g"] + c["norm"]["b"]
        h = jax.nn.gelu(h, approximate=False)
    return h


def _pos_conv_embed(params, h, cfg: Wav2Vec2Config):
    pc = params["pos_conv"]
    v = pc["v"]
    # weight-norm (torch dim=2 == our kernel axis 0): w = g * v/||v||
    norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(1, 2),
                            keepdims=True))
    w = pc["g"] * v / jnp.maximum(norm, 1e-12)
    pad = cfg.num_conv_pos_embeddings // 2
    e = _conv1d(h, w, 1, padding=pad,
                groups=cfg.num_conv_pos_embedding_groups, bias=pc["b"])
    if cfg.num_conv_pos_embeddings % 2 == 0:
        e = e[:, :-1]
    return jax.nn.gelu(e, approximate=False)


def _attention(p, x, heads):
    b, t, d = x.shape
    hd = d // heads
    q = (x @ p["q"]["w"] + p["q"]["b"]) * (hd ** -0.5)
    k = x @ p["k"]["w"] + p["k"]["b"]
    v = x @ p["v"]["w"] + p["v"]["b"]
    q, k, v = (a.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
               for a in (q, k, v))
    a = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2), axis=-1)
    o = (a @ v).transpose(0, 2, 1, 3).reshape(b, t, d)
    return o @ p["o"]["w"] + p["o"]["b"]


def wav2vec_forward(params: Params, waveform: jnp.ndarray,
                    cfg: Wav2Vec2Config) -> jnp.ndarray:
    """[B, samples] float32 (pre-normalized) -> [B, T, hidden] tokens.

    Mirrors HF `Wav2Vec2Model.forward` at eval (no masking/dropout,
    `last_hidden_state`)."""
    feats = _feature_encoder(params, waveform, cfg)
    h = _layer_norm(feats, params["proj_ln"], cfg.ln_eps)
    h = h @ params["proj"]["w"] + params["proj"]["b"]

    h = h + _pos_conv_embed(params, h, cfg)
    if not cfg.do_stable_layer_norm:
        h = _layer_norm(h, params["enc_ln"], cfg.ln_eps)

    def body(h, bp):
        if cfg.do_stable_layer_norm:       # pre-LN (large)
            h = h + _attention(bp, _layer_norm(h, bp["ln1"], cfg.ln_eps),
                               cfg.heads)
            hn = _layer_norm(h, bp["ln2"], cfg.ln_eps)
            ff = jax.nn.gelu(hn @ bp["fc1"]["w"] + bp["fc1"]["b"],
                             approximate=False)
            h = h + (ff @ bp["fc2"]["w"] + bp["fc2"]["b"])
        else:                              # post-LN (base)
            h = h + _attention(bp, h, cfg.heads)
            h = _layer_norm(h, bp["ln1"], cfg.ln_eps)
            ff = jax.nn.gelu(h @ bp["fc1"]["w"] + bp["fc1"]["b"],
                             approximate=False)
            h = h + (ff @ bp["fc2"]["w"] + bp["fc2"]["b"])
            h = _layer_norm(h, bp["ln2"], cfg.ln_eps)
        return h, None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    if cfg.do_stable_layer_norm:
        h = _layer_norm(h, params["enc_ln"], cfg.ln_eps)
    return h


# ---------------------------------------------------------------------------
# torch state-dict conversion (HF Wav2Vec2Model naming)


def _t(a) -> np.ndarray:
    try:
        return a.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(a)


def convert_wav2vec(state_dict, cfg: Wav2Vec2Config) -> Params:
    """HF `Wav2Vec2Model.state_dict()` -> our params PyTree.

    Handles both classic weight-norm keys (``weight_g``/``weight_v``)
    and torch>=2 parametrization keys
    (``parametrizations.weight.original0/1``). Keys may carry a
    ``wav2vec2.`` prefix (e.g. from a ForCTC checkpoint)."""
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("wav2vec2."):] if k.startswith("wav2vec2.") else k] = v

    def get(name):
        return jnp.asarray(_t(sd[name]), jnp.float32)

    def lin(name):
        return {"w": get(name + ".weight").T, "b": get(name + ".bias")}

    def ln(name):
        return {"g": get(name + ".weight"), "b": get(name + ".bias")}

    p: Params = {}
    convs = []
    for i in range(len(cfg.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        # torch conv1d weight [out, in, K] -> ours [K, in, out]
        c = {"w": get(base + ".conv.weight").transpose(2, 1, 0)}
        if base + ".conv.bias" in sd:
            c["b"] = get(base + ".conv.bias")
        if base + ".layer_norm.weight" in sd:
            c["norm"] = ln(base + ".layer_norm")
        convs.append(c)
    p["convs"] = convs

    p["proj_ln"] = ln("feature_projection.layer_norm")
    p["proj"] = lin("feature_projection.projection")

    pc = "encoder.pos_conv_embed.conv"
    if pc + ".weight_v" in sd:
        wv, wg = get(pc + ".weight_v"), get(pc + ".weight_g")
    else:
        wg = get(pc + ".parametrizations.weight.original0")
        wv = get(pc + ".parametrizations.weight.original1")
    # torch [out, in/groups, K] (weight-norm dim=2: g is [1, 1, K])
    p["pos_conv"] = {"v": wv.transpose(2, 1, 0),
                     "g": wg.transpose(2, 1, 0),
                     "b": get(pc + ".bias")}

    p["enc_ln"] = ln("encoder.layer_norm")

    blocks = []
    for i in range(cfg.layers):
        b = f"encoder.layers.{i}"
        blocks.append({
            "q": lin(b + ".attention.q_proj"),
            "k": lin(b + ".attention.k_proj"),
            "v": lin(b + ".attention.v_proj"),
            "o": lin(b + ".attention.out_proj"),
            "ln1": ln(b + ".layer_norm"),
            "fc1": lin(b + ".feed_forward.intermediate_dense"),
            "fc2": lin(b + ".feed_forward.output_dense"),
            "ln2": ln(b + ".final_layer_norm")})
    p["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return p


def infer_wav2vec_config(state_dict) -> Wav2Vec2Config:
    """Recover the topology from an HF state dict (base vs large etc.)."""
    sd = {k[len("wav2vec2."):] if k.startswith("wav2vec2.") else k: v
          for k, v in state_dict.items()}
    n_convs = 1 + max(int(k.split(".")[2])
                      for k in sd if k.startswith("feature_extractor."))
    conv_dim, conv_kernel = [], []
    for i in range(n_convs):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
        conv_dim.append(w.shape[0])
        conv_kernel.append(w.shape[2])
    layered = "feature_extractor.conv_layers.1.layer_norm.weight" in sd
    n_layers = 1 + max(int(k.split(".")[2])
                       for k in sd if k.startswith("encoder.layers."))
    hidden = sd["feature_projection.projection.weight"].shape[0]
    ffn = sd["encoder.layers.0.feed_forward.intermediate_dense.weight"
             ].shape[0]
    base = WAV2VEC2_PRESETS["base"]
    return Wav2Vec2Config(
        conv_dim=tuple(conv_dim), conv_kernel=tuple(conv_kernel),
        conv_stride=base.conv_stride[:n_convs],
        conv_bias="feature_extractor.conv_layers.0.conv.bias" in sd,
        feat_extract_norm="layer" if layered else "group",
        hidden=hidden, layers=n_layers, ffn=ffn,
        heads={768: 12, 1024: 16}.get(hidden, max(1, hidden // 64)),
        do_stable_layer_norm=layered)


# ---------------------------------------------------------------------------
# dataset / CLI hook: waveform -> per-video-frame features


class Wav2Vec2AudioFeatures:
    """Drop-in for `AudioFeatureExtractor` (same `__call__` contract:
    (waveform, sr, num_frames) -> [num_frames, dim]) backed by the JAX
    Wav2Vec2 encoder. Completes the reference's declared wav2vec intent
    (README.md:124-128) that omnihuman_dataset.py:813-816 stubbed with
    torch.randn.

    Tokens arrive at ~50 Hz (stride 320 @ 16 kHz); each video frame's
    feature is the mean over its token span, tiled/truncated to `dim`
    (matching the log-mel extractor's output contract so the omni audio
    MLP sees the same shape either way)."""

    def __init__(self, checkpoint_path: Optional[str] = None,
                 preset: str = "base", dim: int = 1024, fps: float = 16.0,
                 params: Optional[Params] = None,
                 cfg: Optional[Wav2Vec2Config] = None):
        self.dim = dim
        self.fps = fps
        if params is not None:
            self.cfg = cfg if cfg is not None else WAV2VEC2_PRESETS[preset]
            self.params = params
        elif checkpoint_path:
            sd = _load_state_dict(checkpoint_path)
            self.cfg = infer_wav2vec_config(sd)
            self.params = convert_wav2vec(sd, self.cfg)
        else:
            self.cfg = WAV2VEC2_PRESETS[preset]
            self.params = init_wav2vec(jax.random.key(0), self.cfg)
        self._fwd = jax.jit(
            lambda p, w: wav2vec_forward(p, w, self.cfg))

    def __call__(self, waveform: np.ndarray, sr: int,
                 num_frames: int) -> np.ndarray:
        wav = np.asarray(waveform, np.float32)
        if sr != SAMPLE_RATE:
            n = int(round(len(wav) * SAMPLE_RATE / max(sr, 1)))
            wav = np.interp(np.linspace(0, len(wav) - 1, max(n, 1)),
                            np.arange(len(wav)), wav).astype(np.float32)
        need = int(np.ceil(num_frames / self.fps * SAMPLE_RATE))
        need = max(need, 2 * self.cfg.stride_total + 400)
        if len(wav) < need:
            wav = np.pad(wav, (0, need - len(wav)))
        # HF Wav2Vec2FeatureExtractor do_normalize: zero-mean unit-var
        wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
        tok = np.asarray(self._fwd(self.params, jnp.asarray(wav)[None])[0],
                         np.float32)                        # [T, hidden]
        tps = SAMPLE_RATE / self.cfg.stride_total / self.fps  # tokens/frame
        out = np.zeros((num_frames, self.dim), np.float32)
        reps = int(np.ceil(self.dim / tok.shape[1]))
        for t in range(num_frames):
            lo, hi = int(t * tps), max(int((t + 1) * tps), int(t * tps) + 1)
            seg = tok[lo:min(hi, len(tok))]
            row = seg.mean(0) if len(seg) else np.zeros(tok.shape[1])
            out[t] = np.tile(row, reps)[:self.dim]
        return out


def _load_state_dict(path: str):
    """torch .pt/.bin state dict, an HF save dir, or an .npz fallback."""
    import os
    if os.path.isdir(path):
        for name in ("pytorch_model.bin", "model.pt"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd
