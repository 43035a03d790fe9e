#!/usr/bin/env bash
# Offline SAM proposal generation (reference scripts/generate_sam_proposals_cuda.sh).
# Multi-host TPU slices shard automatically via jax.process_index.
set -e
DATASET=${1:-coco_2017_val}
CKPT=${2:?path to sam_vit_h checkpoint}
OUT=${3:-datasets/proposals/sam_${DATASET}_d2.pkl}
python tools/generate_sam_proposals.py \
  --dataset "$DATASET" --checkpoint "$CKPT" --model-type vit_h \
  --points-per-side 32 --pred-iou-thresh 0.86 --stability-thresh 0.92 \
  --crop-n-layers 1 --min-box-area 20 --output "$OUT"
