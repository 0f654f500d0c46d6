#!/usr/bin/env bash
# reference seaweed_apt/train.sh equivalent
rm -f project.log
python -m omnihuman_tpu.cli.train_distill --output_dir . --checkpoint_dir "${1:-models/Wan2.1-T2V-1.3B}" "$@"
