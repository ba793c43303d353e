#!/usr/bin/env bash
# Two-stage inference, mirroring the reference's inference.sh:
#   stage 1: CAM cube / flow / image extraction from the test split
#   stage 2: ConvLSTM temporal inference + Wild-360 evaluation
# Pass backbone/CLSTM weights via env: RESNET_NPZ, CLSTM_NPZ.
set -euo pipefail

RESNET_NPZ="${RESNET_NPZ:-resnet50.npz}"
CLSTM_NPZ="${CLSTM_NPZ:-clstm.npz}"
OUT="${OUT:-static}"

python -m cp360_tpu.cli.extract_features --out "$OUT" -om -of -oi \
    ${RESNET_NPZ:+--weights "$RESNET_NPZ"}

python -m cp360_tpu.cli.test_temporal --model "$CLSTM_NPZ" \
    --dir "output/${OUT}_resnet50" --overlay
