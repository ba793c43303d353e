#!/usr/bin/env bash
# Weakly-supervised ConvLSTM training over stage-1 artifacts, mirroring the
# reference's train.sh.
set -euo pipefail

INPUT="${INPUT:-output/static_resnet50}"
python -m cp360_tpu.cli.train_temporal --input "$INPUT" "$@"
