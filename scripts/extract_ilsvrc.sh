#!/bin/bash
#
# Extract the ImageNet (ILSVRC2012) classification tars into the folder
# layout the ILSVRC dataset registration expects (train/<wnid>/*.JPEG,
# val/<wnid>/*.JPEG). Counterpart of the reference's
# scripts/extract_ilsvrc.sh; run where ILSVRC2012_img_train.tar and
# ILSVRC2012_img_val.tar live. After extraction, run
# scripts/prepare_ilsvrc.sh (or `python tools/ilsvrc_tools.py folder`) to
# build the detection-style annotations.
#
# Expected counts: train 1,281,167 JPEGs; val 50,000 JPEGs.
set -e

# training data: outer tar holds one tar per wnid
mkdir -p train && mv ILSVRC2012_img_train.tar train/ && cd train
tar -xf ILSVRC2012_img_train.tar && rm -f ILSVRC2012_img_train.tar
find . -name "*.tar" | while read NAME; do
  mkdir -p "${NAME%.tar}"
  tar -xf "${NAME}" -C "${NAME%.tar}"
  rm -f "${NAME}"
done
cd ..

# validation data: flat tar; regroup into wnid subfolders with the standard
# valprep mapping (vendored by prepare_ilsvrc.sh when offline)
mkdir -p val && mv ILSVRC2012_img_val.tar val/ && cd val
tar -xf ILSVRC2012_img_val.tar
if command -v wget >/dev/null; then
  wget -qO- https://raw.githubusercontent.com/soumith/imagenetloader.torch/master/valprep.sh | bash
else
  echo "wget unavailable: run tools/ilsvrc_tools.py folder --val-dir val/ to regroup" >&2
fi
cd ..

echo "train JPEGs: $(find train/ -name '*.JPEG' | wc -l) (expect 1281167)"
echo "val JPEGs:   $(find val/ -name '*.JPEG' | wc -l) (expect 50000)"
