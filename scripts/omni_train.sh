#!/usr/bin/env bash
# reference Omnihuman/train.sh equivalent
rm -f project.log
python -m omnihuman_tpu.cli.train_omni "$@"
