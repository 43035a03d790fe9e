#!/usr/bin/env bash
# ILSVRC-2012 preparation (reference scripts/prepare_ilsvrc.sh):
# folder scan -> info json -> COCO-format json -> readable class names.
set -e
ROOT=${WSOVOD_DATASETS:-./datasets}/ILSVRC2012
for SPLIT in train val; do
  python tools/ilsvrc_tools.py info \
    --image-root "$ROOT/ILSVRC2012_img_${SPLIT}" \
    --output "$ROOT/ILSVRC2012_img_${SPLIT}_info.json"
  python tools/ilsvrc_tools.py folder \
    --info "$ROOT/ILSVRC2012_img_${SPLIT}_info.json" \
    --output "$ROOT/ILSVRC2012_img_${SPLIT}.json"
  if [ -f "$ROOT/words.txt" ]; then
    python tools/ilsvrc_tools.py names \
      --json "$ROOT/ILSVRC2012_img_${SPLIT}.json" \
      --words "$ROOT/words.txt" \
      --output "$ROOT/ILSVRC2012_img_${SPLIT}.json"
  fi
done
