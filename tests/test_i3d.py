"""JAX I3D: torch-conversion parity + the temporal-FVD property the
per-frame Inception stand-in cannot provide.

The torch replica reproduces the public pytorch-i3d checkpoint naming
(``Conv3d_1a_7x7.conv3d.weight``, ``Mixed_3b.b1a.bn.running_mean``, …)
including its TF-style SAME padding, so `convert_i3d` is proven against
a real torch forward — the same strategy as the Sapiens/Inception
parity suites. Reference FVD extractor was a torch.randn placeholder
(Omnihuman/omnihuman-eval.py:30-33)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omnihuman_tpu.omni.i3d import (
    _MIXED, I3D_PRESETS, I3DConfig, I3DVideoFeatures, convert_i3d,
    init_i3d, i3d_forward, mixed_out)

TINY = I3D_PRESETS["tiny-test"]


def test_forward_shapes():
    params = init_i3d(jax.random.key(0), TINY)
    v = jnp.zeros((2, 16, 32, 32, 3))
    feats, logits = i3d_forward(params, v, TINY, with_logits=True)
    assert feats.shape == (2, mixed_out(TINY, _MIXED[-1][1]))
    assert logits.shape == (2, TINY.num_classes)
    assert bool(jnp.all(jnp.isfinite(feats)))


def _torch_replica(cfg: I3DConfig):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    def pad_same(x, k, s):
        # TF-SAME (what piergiaj's compute_pad emulates)
        pads = []
        for d, (dim, kk, ss) in enumerate(zip(x.shape[2:], k, s)):
            if dim % ss == 0:
                p = max(kk - ss, 0)
            else:
                p = max(kk - dim % ss, 0)
            pads.append((p // 2, p - p // 2))
        (tl, tr), (hl, hr), (wl, wr) = pads
        return F.pad(x, (wl, wr, hl, hr, tl, tr))

    class Unit3D(nn.Module):
        def __init__(self, cin, cout, k=(1, 1, 1), stride=(1, 1, 1),
                     bn=True, bias=False, relu=True):
            super().__init__()
            self.k, self.s, self.relu_on = k, stride, relu
            self.conv3d = nn.Conv3d(cin, cout, k, stride, 0, bias=bias)
            self.bn = nn.BatchNorm3d(cout, eps=cfg.bn_eps,
                                     momentum=0.01) if bn else None

        def forward(self, x):
            x = self.conv3d(pad_same(x, self.k, self.s))
            if self.bn is not None:
                x = self.bn(x)
            return F.relu(x) if self.relu_on else x

    class MaxPoolSame(nn.Module):
        def __init__(self, k, s):
            super().__init__()
            self.k, self.s = k, s

        def forward(self, x):
            return F.max_pool1d(
                x.flatten(), 1) if False else F.max_pool3d(
                pad_same(x, self.k, self.s), self.k, self.s)

    class Mixed(nn.Module):
        def __init__(self, cin, plan):
            super().__init__()
            b0, b1a, b1b, b2a, b2b, b3b = (cfg.ch(c) for c in plan)
            three = (3, 3, 3)
            self.b0 = Unit3D(cin, b0)
            self.b1a, self.b1b = Unit3D(cin, b1a), Unit3D(b1a, b1b, three)
            self.b2a, self.b2b = Unit3D(cin, b2a), Unit3D(b2a, b2b, three)
            self.b3b = Unit3D(cin, b3b)
            self.pool = MaxPoolSame((3, 3, 3), (1, 1, 1))

        def forward(self, x):
            return torch.cat([
                self.b0(x), self.b1b(self.b1a(x)), self.b2b(self.b2a(x)),
                self.b3b(self.pool(x))], dim=1)

    class I3D(nn.Module):
        def __init__(self):
            super().__init__()
            c64, c192 = cfg.ch(64), cfg.ch(192)
            self.Conv3d_1a_7x7 = Unit3D(3, c64, (7, 7, 7), (2, 2, 2))
            self.Conv3d_2b_1x1 = Unit3D(c64, c64)
            self.Conv3d_2c_3x3 = Unit3D(c64, c192, (3, 3, 3))
            self.pool2 = MaxPoolSame((1, 3, 3), (1, 2, 2))
            self.pool3 = MaxPoolSame((1, 3, 3), (1, 2, 2))
            self.pool4 = MaxPoolSame((3, 3, 3), (2, 2, 2))
            self.pool5 = MaxPoolSame((2, 2, 2), (2, 2, 2))
            cin = c192
            for name, plan in _MIXED:
                setattr(self, name, Mixed(cin, plan))
                cin = mixed_out(cfg, plan)
            self.logits = Unit3D(cin, cfg.num_classes, bn=False, bias=True,
                                 relu=False)

        def forward(self, x):
            x = self.pool2(self.Conv3d_1a_7x7(x))
            x = self.pool3(self.Conv3d_2c_3x3(self.Conv3d_2b_1x1(x)))
            for name, _ in _MIXED:
                if name == "Mixed_4b":
                    x = self.pool4(x)
                elif name == "Mixed_5b":
                    x = self.pool5(x)
                x = getattr(self, name)(x)
            feats = x.mean(dim=(2, 3, 4))
            logits = self.logits.conv3d(
                feats[:, :, None, None, None]).flatten(1)
            return feats, logits

    return I3D()


def test_torch_conversion_parity():
    import torch

    torch.manual_seed(0)
    model = _torch_replica(TINY).eval()
    # randomize BN running stats so the parity exercises them
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(0)
    v = rng.normal(size=(2, 3, 16, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want_f, want_l = (t.numpy() for t in model(torch.from_numpy(v)))

    params = convert_i3d(model.state_dict(), TINY)
    got_f, got_l = i3d_forward(
        params, jnp.asarray(v.transpose(0, 2, 3, 4, 1)), TINY,
        with_logits=True)
    for got, want in ((got_f, want_f), (got_l, want_l)):
        err = np.max(np.abs(np.asarray(got) - want))
        err /= max(np.max(np.abs(want)), 1e-6)
        assert err <= 1e-4, f"relative err {err}"


def _moving_dot_videos(n, t=16, hw=32, seed=0):
    """Videos with strong temporal structure: a dot sweeping across."""
    rng = np.random.default_rng(seed)
    vids = np.zeros((n, 3, t, hw, hw), np.float32)
    for i in range(n):
        y = rng.integers(4, hw - 4)
        for f in range(t):
            x = int((f / t) * (hw - 8)) + 4
            vids[i, :, f, y - 2:y + 2, x - 2:x + 2] = 1.0
    return vids * 2 - 1


def test_fvd_temporal_sensitivity():
    """FVD(identical) ~ 0 and FVD(frame-shuffled) >> 0 under I3D
    features, while the per-frame mean++std features are blind to the
    shuffle (VERDICT r3 item 5's done-criterion)."""
    from omnihuman_tpu.omni.evaluate import frechet_distance

    # n=6/t=12 (vs n=12/t=16 + a redundant third i3d pass) keeps the
    # temporal signal but cuts the XLA:CPU conv3d cost ~4x — this test
    # once cost 24 min of the suite's 58-min wall; hw must stay 32 (the
    # tiny backbone loses the shuffle signal at 16x16)
    real = _moving_dot_videos(6, t=12, seed=0)
    rng = np.random.default_rng(1)
    shuffled = real.copy()
    for i in range(len(shuffled)):
        shuffled[i] = shuffled[i][:, rng.permutation(shuffled.shape[2])]

    i3d = I3DVideoFeatures(preset="tiny-test", seed=0)
    fr = i3d(real)
    # N << dim(features): the eps-stabilized sqrtm makes identical
    # sets score |FVD| ~ 2*d*eps instead of NaN
    fvd_same = abs(frechet_distance(fr, fr.copy()))
    fvd_shuf = frechet_distance(fr, i3d(shuffled))
    assert fvd_same < 0.05, fvd_same
    assert fvd_shuf > 100 * max(fvd_same, 1e-3), (fvd_shuf, fvd_same)

    # the per-frame stand-in cannot tell them apart: mean++std over
    # frames is permutation-invariant by construction
    def perframe(videos):
        n, c, t = videos.shape[:3]
        flat = videos.transpose(0, 2, 1, 3, 4).reshape(n, t, -1)
        return np.concatenate([flat.mean(1), flat.std(1)], -1)

    pf_shuf = abs(frechet_distance(perframe(real), perframe(shuffled)))
    assert pf_shuf < 0.05   # temporally blind (same eps floor as above)


def test_evaluator_wires_i3d_weights(tmp_path):
    """Passing `i3d_weights=<ckpt>` makes the evaluator's FVD use the
    converted I3D (VERDICT r3 item 5: video_features uses the real
    backbone when weights are supplied) and tags the metrics JSON."""
    import torch

    from omnihuman_tpu.omni.evaluate import OmniHumanEvaluator

    torch.manual_seed(0)
    ckpt = str(tmp_path / "rgb_tiny.pt")
    torch.save(_torch_replica(TINY).state_dict(), ckpt)

    ev = OmniHumanEvaluator(i3d_weights=ckpt, use_inception=False,
                            output_dir=str(tmp_path / "ev"))
    assert ev.fvd_feature_space == "i3d_kinetics"
    real = _moving_dot_videos(4, t=8, hw=32, seed=0)
    fake = _moving_dot_videos(4, t=8, hw=32, seed=5)
    out = ev.evaluate_batch(real, fake)
    assert np.isfinite(out["fvd"])
    assert out["fvd_feature_space"] == "i3d_kinetics"


def test_evaluator_accepts_i3d(tmp_path):
    """I3DVideoFeatures plugs into the eval suite's fvd_feature_fn."""
    from omnihuman_tpu.omni.evaluate import OmniHumanEvaluator

    i3d = I3DVideoFeatures(preset="tiny-test", seed=0, batch_size=2)
    ev = OmniHumanEvaluator(fvd_feature_fn=i3d,
                            output_dir=str(tmp_path))
    real = _moving_dot_videos(4, t=8, hw=32, seed=0)
    fake = _moving_dot_videos(4, t=8, hw=32, seed=5)
    out = ev.evaluate_batch(real, fake)
    assert np.isfinite(out["fvd"])
