#!/bin/bash
# One-command weights-day parity gate (VERDICT r3 item 10).
#
#   scripts/parity_gate.sh <checkpoint_dir> [task]
#
# Given a directory with the released Wan torch checkpoints
# (*.safetensors DiT shards, optionally Wan2.1_VAE.pth), runs
# conversion + the <=1e-2 per-frame latent-MSE comparison against the
# actual PyTorch reference modules end-to-end (_parity_gate.py).
# Skips gracefully (exit 0) when no weights are present, so it can run
# unconditionally in CI until weights appear.
set -euo pipefail
cd "$(dirname "$0")/.."
CKPT="${1:-models/Wan2.1-T2V-1.3B}"
TASK="${2:-t2v-1.3B}"
exec python _parity_gate.py "$CKPT" --task "$TASK"
