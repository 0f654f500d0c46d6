#!/usr/bin/env bash
# reference seaweed_apt/f_distilled_trainer.py __main__ equivalent
python -m omnihuman_tpu.cli.train_f_distill --checkpoint_dir "${1:-models/Wan2.1-T2V-1.3B}" "${@:2}"
