#!/usr/bin/env bash
# reference seaweed_apt/eval_ema.sh equivalent
rm -f project.log
python -m omnihuman_tpu.cli.eval_ema "$@"
