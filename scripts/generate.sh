#!/usr/bin/env bash
# reference seaweed_apt/generate.sh equivalent: teacher-data extraction
rm -f project.log
python -m omnihuman_tpu.cli.teacher_data --checkpoint_dir "${1:-models/Wan2.1-T2V-1.3B}" "$@"
