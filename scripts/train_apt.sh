#!/usr/bin/env bash
# reference seaweed_apt/apt_trainer.py __main__ equivalent (stage-2 GAN)
python -m omnihuman_tpu.cli.train_apt --checkpoint_dir "${1:-models/Wan2.1-T2V-1.3B}" "${@:2}"
