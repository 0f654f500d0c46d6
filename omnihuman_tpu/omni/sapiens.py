"""Sapiens pose backbone (ViT + heatmap head) natively in JAX.

The reference loads an opaque TorchScript export
(`Omnihuman/keypoint_processor.py:53-66`:
``sapiens_{1b,2b}_goliath_best_goliath_AP_640_torchscript.pt2``) and runs
it at 1024x768 (`keypoint_processor.py:43-49`). That artifact is not
shippable here, so this module implements the underlying architecture —
a plain ViT (patch 16, no cls token, final LN) with an mmpose-style
heatmap head (2x deconv4x4/s2 + BN + ReLU, 2x conv1x1 + BN + ReLU,
final 1x1 -> 308 channels) — as an init/apply pair over a params PyTree,
plus a converter from the released torch/mmpose state-dict naming
(``backbone.layers.N.attn.qkv.weight`` etc.). With converted weights the
JAX forward replaces the .pt2 byte-for-byte in the keypoint pipeline;
with random weights it still exercises every downstream stage
(crop -> heatmaps -> UDP decode), which the .pt2 path cannot.

Batched by design: the torch reference runs one crop at a time; here a
[B, H, W, 3] batch is a single jit'd call (MXU-friendly: 3072 tokens,
embed dims >= 1024).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, object]

# normalization used by the reference transform (keypoint_processor.py:46-49)
SAPIENS_MEAN = (123.5, 116.5, 103.5)
SAPIENS_STD = (58.5, 57.0, 57.5)


@dataclass(frozen=True)
class SapiensConfig:
    img_size: Tuple[int, int] = (1024, 768)     # (H, W) model input
    patch_size: int = 16
    embed_dim: int = 1536
    depth: int = 40
    num_heads: int = 24
    mlp_ratio: float = 4.0
    num_keypoints: int = 308
    deconv_channels: Tuple[int, ...] = (768, 768)
    conv_channels: Tuple[int, ...] = (768, 768)
    ln_eps: float = 1e-6

    @property
    def grid(self) -> Tuple[int, int]:
        return (self.img_size[0] // self.patch_size,
                self.img_size[1] // self.patch_size)

    @property
    def heatmap_size(self) -> Tuple[int, int]:
        """(H, W) of the head output: grid upsampled 2x per deconv."""
        s = 2 ** len(self.deconv_channels)
        return (self.grid[0] * s, self.grid[1] * s)


# released sapiens-pose sizes (embed_dim, depth, num_heads)
SAPIENS_PRESETS = {
    "0.3b": SapiensConfig(embed_dim=1024, depth=24, num_heads=16),
    "0.6b": SapiensConfig(embed_dim=1280, depth=32, num_heads=16),
    "1b": SapiensConfig(embed_dim=1536, depth=40, num_heads=24),
    "2b": SapiensConfig(embed_dim=1920, depth=48, num_heads=32),
    "tiny-test": SapiensConfig(img_size=(64, 48), embed_dim=32, depth=2,
                               num_heads=2, num_keypoints=7,
                               deconv_channels=(16, 16),
                               conv_channels=(16, 16)),
}


# ---------------------------------------------------------------------------
# init


def _linear_init(key, din, dout):
    lim = 1.0 / math.sqrt(din)
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (din, dout), minval=-lim, maxval=lim),
            "b": jax.random.uniform(kb, (dout,), minval=-lim, maxval=lim)}


def _ln_init(dim):
    return {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def _bn_init(dim):
    return {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,)),
            "mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}


def _conv_init(key, kh, kw, cin, cout, bias=True):
    lim = 1.0 / math.sqrt(cin * kh * kw)
    p = {"w": jax.random.uniform(key, (kh, kw, cin, cout),
                                 minval=-lim, maxval=lim)}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def _block_init(key, cfg: SapiensConfig):
    ks = jax.random.split(key, 4)
    d, h = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
    return {
        "ln1": _ln_init(d),
        "qkv": _linear_init(ks[0], d, 3 * d),
        "proj": _linear_init(ks[1], d, d),
        "ln2": _ln_init(d),
        "fc1": _linear_init(ks[2], d, h),
        "fc2": _linear_init(ks[3], h, d),
    }


def init_sapiens(key: jax.Array, cfg: SapiensConfig) -> Params:
    ks = jax.random.split(key, 8)
    gh, gw = cfg.grid
    d = cfg.embed_dim
    params: Params = {
        "patch_embed": _conv_init(ks[0], cfg.patch_size, cfg.patch_size,
                                  3, d),
        "pos_embed": jax.random.normal(ks[1], (1, gh * gw, d)) * 0.02,
        "final_norm": _ln_init(d),
    }
    blocks = [_block_init(k, cfg)
              for k in jax.random.split(ks[2], cfg.depth)]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    head = {"deconvs": [], "convs": []}
    cin = d
    dks = jax.random.split(ks[3], max(1, len(cfg.deconv_channels)))
    for i, c in enumerate(cfg.deconv_channels):
        head["deconvs"].append(
            {**_conv_init(dks[i], 4, 4, cin, c, bias=False),
             "bn": _bn_init(c)})
        cin = c
    cks = jax.random.split(ks[4], max(1, len(cfg.conv_channels)))
    for i, c in enumerate(cfg.conv_channels):
        head["convs"].append(
            {**_conv_init(cks[i], 1, 1, cin, c, bias=False),
             "bn": _bn_init(c)})
        cin = c
    head["final"] = _conv_init(ks[5], 1, 1, cin, cfg.num_keypoints)
    params["head"] = head
    return params


# ---------------------------------------------------------------------------
# forward


def _layer_norm(x, p, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["w"] + p["b"]


def _bn_apply(x, p, eps=1e-5):
    scale = p["w"] * jax.lax.rsqrt(p["var"] + eps)
    return x * scale + (p["b"] - p["mean"] * scale)


def _vit_block(p, x, cfg: SapiensConfig):
    b, s, d = x.shape
    n = cfg.num_heads
    hd = d // n
    y = _layer_norm(x, p["ln1"], cfg.ln_eps)
    qkv = y @ p["qkv"]["w"] + p["qkv"]["b"]
    q, k, v = [t.reshape(b, s, n, hd)
               for t in jnp.split(qkv, 3, axis=-1)]
    # dense attention: 3k tokens, trivially XLA-tileable on the MXU
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k) / math.sqrt(hd)
    att = jax.nn.softmax(logits, axis=-1)
    y = jnp.einsum("bnqk,bknd->bqnd", att, v).reshape(b, s, d)
    x = x + (y @ p["proj"]["w"] + p["proj"]["b"])
    y = _layer_norm(x, p["ln2"], cfg.ln_eps)
    y = jax.nn.gelu(y @ p["fc1"]["w"] + p["fc1"]["b"], approximate=False)
    return x + (y @ p["fc2"]["w"] + p["fc2"]["b"])


def _deconv4x4s2(x, p):
    """torch ConvTranspose2d(k=4, s=2, p=1, bias=False): H,W -> 2H,2W.

    Implemented as an lhs-dilated conv with padding k-1-p = 2; the
    converter pre-flips the torch kernel spatially so this single
    conv_general_dilated is exact.
    """
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1, 1),
        padding=[(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _bn_apply(y, jax.tree.map(lambda t: t.astype(x.dtype), p["bn"]))


def sapiens_forward(params: Params, x: jnp.ndarray,
                    cfg: SapiensConfig) -> jnp.ndarray:
    """[B, H, W, 3] (normalized) -> [B, K, Hm, Wm] heatmaps."""
    gh, gw = cfg.grid
    ps = cfg.patch_size
    pe = params["patch_embed"]
    x = jax.lax.conv_general_dilated(
        x, pe["w"].astype(x.dtype), window_strides=(ps, ps),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + pe["b"].astype(x.dtype)
    b = x.shape[0]
    x = x.reshape(b, gh * gw, cfg.embed_dim)
    x = x + params["pos_embed"].astype(x.dtype)

    def step(h, bp):
        return _vit_block(bp, h, cfg), None
    x, _ = jax.lax.scan(step, x, params["blocks"])
    x = _layer_norm(x, params["final_norm"], cfg.ln_eps)

    y = x.reshape(b, gh, gw, cfg.embed_dim)
    for dp in params["head"]["deconvs"]:
        y = jax.nn.relu(_deconv4x4s2(y, dp))
    for cp in params["head"]["convs"]:
        y = y @ cp["w"].astype(y.dtype)[0, 0]
        y = jax.nn.relu(_bn_apply(
            y, jax.tree.map(lambda t: t.astype(y.dtype), cp["bn"])))
    fin = params["head"]["final"]
    y = y @ fin["w"].astype(y.dtype)[0, 0] + fin["b"].astype(y.dtype)
    return y.transpose(0, 3, 1, 2)                      # [B, K, Hm, Wm]


# ---------------------------------------------------------------------------
# torch-checkpoint conversion


def _t(a) -> np.ndarray:
    try:  # torch tensor
        return a.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(a)


def convert_sapiens(state_dict, cfg: SapiensConfig) -> Params:
    """Map an mmpose/sapiens torch state dict onto init_sapiens's PyTree.

    Expected naming (the released sapiens-pose `TopdownPoseEstimator`;
    also what `torch.jit.load(...).state_dict()` yields for the .pt2):
    ``backbone.patch_embed.projection.*``, ``backbone.pos_embed``,
    ``backbone.layers.N.{ln1,ln2}.*``, ``backbone.layers.N.attn.qkv.*``,
    ``backbone.layers.N.attn.proj.*``,
    ``backbone.layers.N.ffn.layers.0.0.*`` / ``...ffn.layers.1.*``,
    ``backbone.ln1.*`` (final norm), ``head.deconv_layers.{3i,3i+1}.*``,
    ``head.conv_layers.{3i,3i+1}.*``, ``head.final_layer.*``.
    Raises KeyError naming the first missing entry.
    """
    sd = {k: v for k, v in state_dict.items()}

    def get(name):
        if name not in sd:
            raise KeyError(
                f"convert_sapiens: missing '{name}' "
                f"(have e.g. {sorted(sd)[:5]}...)")
        return _t(sd[name])

    def lin(name):
        return {"w": jnp.asarray(get(f"{name}.weight").T),
                "b": jnp.asarray(get(f"{name}.bias"))}

    def ln(name):
        return {"w": jnp.asarray(get(f"{name}.weight")),
                "b": jnp.asarray(get(f"{name}.bias"))}

    def bn(name):
        return {"w": jnp.asarray(get(f"{name}.weight")),
                "b": jnp.asarray(get(f"{name}.bias")),
                "mean": jnp.asarray(get(f"{name}.running_mean")),
                "var": jnp.asarray(get(f"{name}.running_var"))}

    pw = get("backbone.patch_embed.projection.weight")  # [C, 3, P, P]
    params: Params = {
        "patch_embed": {"w": jnp.asarray(pw.transpose(2, 3, 1, 0)),
                        "b": jnp.asarray(
                            get("backbone.patch_embed.projection.bias"))},
        "final_norm": ln("backbone.ln1"),
    }
    pos = get("backbone.pos_embed")                     # [1, N(+1), C]
    n_tok = cfg.grid[0] * cfg.grid[1]
    if pos.shape[1] == n_tok + 1:                       # drop a cls slot
        pos = pos[:, 1:]
    if pos.shape[1] != n_tok:
        raise ValueError(f"pos_embed has {pos.shape[1]} tokens, "
                         f"config grid wants {n_tok}")
    params["pos_embed"] = jnp.asarray(pos)

    blocks = []
    for i in range(cfg.depth):
        p = f"backbone.layers.{i}"
        blocks.append({
            "ln1": ln(f"{p}.ln1"),
            "qkv": lin(f"{p}.attn.qkv"),
            "proj": lin(f"{p}.attn.proj"),
            "ln2": ln(f"{p}.ln2"),
            "fc1": lin(f"{p}.ffn.layers.0.0"),
            "fc2": lin(f"{p}.ffn.layers.1"),
        })
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    head = {"deconvs": [], "convs": []}
    for i in range(len(cfg.deconv_channels)):
        w = get(f"head.deconv_layers.{3 * i}.weight")   # [Cin, Cout, 4, 4]
        # pre-flip spatially for the lhs-dilated formulation (_deconv4x4s2)
        w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)   # [4, 4, Cin, Cout]
        head["deconvs"].append(
            {"w": jnp.asarray(np.ascontiguousarray(w)),
             "bn": bn(f"head.deconv_layers.{3 * i + 1}")})
    for i in range(len(cfg.conv_channels)):
        w = get(f"head.conv_layers.{3 * i}.weight")     # [Cout, Cin, 1, 1]
        head["convs"].append(
            {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
             "bn": bn(f"head.conv_layers.{3 * i + 1}")})
    fw = get("head.final_layer.weight")
    head["final"] = {"w": jnp.asarray(fw.transpose(2, 3, 1, 0)),
                     "b": jnp.asarray(get("head.final_layer.bias"))}
    params["head"] = head
    return params


def infer_sapiens_config(state_dict) -> SapiensConfig:
    """Derive (embed_dim, depth, num_heads, head channels, keypoints)
    from a checkpoint so users need not know which preset a file holds.
    num_heads comes from the matching preset when the embed_dim is a
    known size (attention head count is not recoverable from shapes)."""
    sd = state_dict
    d = int(_t(sd["backbone.ln1.weight"]).shape[0])
    depth = 1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith("backbone.layers."))
    kps = int(_t(sd["head.final_layer.weight"]).shape[0])
    deconvs = sorted(int(k.split(".")[2]) // 3 for k in sd
                     if k.startswith("head.deconv_layers.")
                     and k.endswith(".running_mean"))
    convs = sorted(int(k.split(".")[2]) // 3 for k in sd
                   if k.startswith("head.conv_layers.")
                   and k.endswith(".running_mean"))
    dch = tuple(int(_t(sd[f"head.deconv_layers.{3*i+1}.weight"]).shape[0])
                for i in deconvs)
    cch = tuple(int(_t(sd[f"head.conv_layers.{3*i+1}.weight"]).shape[0])
                for i in convs)
    heads = next((c.num_heads for c in SAPIENS_PRESETS.values()
                  if c.embed_dim == d), max(1, d // 64))
    # grid from pos_embed token count at the standard 4:3 aspect
    n_tok = int(_t(sd["backbone.pos_embed"]).shape[1])
    base = SAPIENS_PRESETS["1b"]
    img = base.img_size
    gh = int(round((n_tok * 4 // 3) ** 0.5))
    if gh * (gh * 3 // 4) in (n_tok, n_tok - 1):
        img = (gh * base.patch_size, (gh * 3 // 4) * base.patch_size)
    return SapiensConfig(img_size=img, embed_dim=d, depth=depth,
                         num_heads=heads, num_keypoints=kps,
                         deconv_channels=dch, conv_channels=cch)


# ---------------------------------------------------------------------------
# pipeline adapter


class JaxSapiensBackbone:
    """Drop-in for TorchScriptPoseBackbone: [H, W, 3] uint8 crop ->
    [K, h, w] heatmaps, with the reference's normalization
    (keypoint_processor.py:43-49). Accepts a torch checkpoint path
    (state dict or TorchScript — converted on load), a ready params
    PyTree, or random init for structural runs."""

    def __init__(self, checkpoint_path: Optional[str] = None,
                 preset: str = "1b",
                 cfg: Optional[SapiensConfig] = None,
                 params: Optional[Params] = None,
                 dtype=jnp.float32):
        self.cfg = cfg or SAPIENS_PRESETS[preset]
        if params is None:
            if checkpoint_path:
                import torch
                try:
                    obj = torch.jit.load(checkpoint_path,
                                         map_location="cpu").state_dict()
                except Exception:
                    obj = torch.load(checkpoint_path, map_location="cpu",
                                     weights_only=False)
                    obj = obj.get("state_dict", obj)
                if cfg is None:   # size the model from the file itself
                    self.cfg = infer_sapiens_config(obj)
                params = convert_sapiens(obj, self.cfg)
            else:
                from omnihuman_tpu.utils.logging import logger
                logger.warning("JaxSapiensBackbone: random init (no "
                               "checkpoint) — heatmaps are structural only")
                params = init_sapiens(jax.random.key(0), self.cfg)
        self.params = jax.tree.map(lambda t: jnp.asarray(t, dtype), params)
        self._fwd = jax.jit(
            lambda p, x: sapiens_forward(p, x, self.cfg))

    def normalize(self, crop: np.ndarray) -> np.ndarray:
        x = crop.astype(np.float32)
        return (x - np.array(SAPIENS_MEAN, np.float32)) / np.array(
            SAPIENS_STD, np.float32)

    def __call__(self, crop: np.ndarray) -> np.ndarray:
        x = jnp.asarray(self.normalize(crop))[None]
        return np.asarray(self._fwd(self.params, x)[0], np.float32)

    def batch(self, crops: np.ndarray) -> np.ndarray:
        """[B, H, W, 3] uint8 -> [B, K, h, w] in one jit'd call."""
        x = jnp.asarray(np.stack([self.normalize(c) for c in crops]))
        return np.asarray(self._fwd(self.params, x), np.float32)
