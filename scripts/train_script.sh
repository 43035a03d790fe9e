#!/usr/bin/env bash
# Train launcher (reference scripts/train_script.sh convention:
# OUTPUT_DIR = output/<config path>_<timestamp>). On TPU there is one process
# per host; data parallelism comes from the device mesh.
set -e
CFG=${1:?usage: train_script.sh <config.yaml> [extra opts...]}
shift || true
STAMP=$(date +%Y%m%d_%H%M%S)
OUT="output/$(dirname "$CFG" | xargs basename)/$(basename "$CFG" .yaml)_${STAMP}"
python tools/train_net.py --config-file "$CFG" OUTPUT_DIR "$OUT" "$@"
