"""End-to-end test of the weights-day parity gate (_parity_gate.py /
scripts/parity_gate.sh): synthesize a released-format checkpoint dir
(reference-named state dict in *.safetensors, the layout
convert.load_torch_state_dict expects) at tiny dims, run the gate, and
require ALL PASS — so the day real weights appear the gate is proven
machinery, not untested script (VERDICT r3 item 10)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gate():
    spec = importlib.util.spec_from_file_location(
        "_parity_gate", os.path.join(REPO, "_parity_gate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_skips_without_weights(tmp_path, capsys):
    gate = _load_gate()
    assert gate.main([str(tmp_path)]) == 0
    assert "SKIP" in capsys.readouterr().out


def test_gate_passes_on_reference_checkpoint(tmp_path, capsys):
    import torch
    from safetensors.torch import save_file

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from ref_compat import load_reference

    from omnihuman_tpu.configs import WAN_CONFIGS

    mc = WAN_CONFIGS["tiny-test"].model
    _, ref_model, _ = load_reference()
    torch.manual_seed(0)
    ref = ref_model.WanModel(
        model_type="t2v", dim=mc.dim, ffn_dim=mc.ffn_dim,
        num_heads=mc.num_heads, num_layers=mc.num_layers,
        freq_dim=mc.freq_dim, text_dim=mc.text_dim, text_len=mc.text_len,
        in_dim=16, out_dim=16, patch_size=tuple(mc.patch_size),
        use_checkpoint=False).eval()
    with torch.no_grad():   # xavier zeroes the head — randomize like tests
        ref.head.head.weight.normal_(std=0.02)
    save_file({k: v.contiguous() for k, v in ref.state_dict().items()},
              str(tmp_path / "model-00001-of-00001.safetensors"))

    gate = _load_gate()
    rc = gate.main([str(tmp_path), "--task", "tiny-test",
                    "--latent_hw", "8*8", "--frames", "1"])
    out = capsys.readouterr().out
    assert "ALL PASS" in out, out
    assert rc == 0
