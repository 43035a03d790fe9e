"""Built-in dataset registration (reference ``wsovod/data/datasets/builtin.py:35-83``).

Registers COCO 2017, VOC 2007/2012 splits, and ILSVRC-2012 COCO-json sets at
``$WSOVOD_DATASETS`` (default ``./datasets``). Registration is lazy — loaders
only touch disk when a dataset is actually requested.
"""

from __future__ import annotations

import os

from ..catalog import DatasetCatalog, MetadataCatalog
from .builtin_meta import coco_meta
from .coco import register_coco_instances
from .pascal_voc import register_pascal_voc

_REGISTERED = False


def register_all(root: str | None = None):
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True
    root = root or os.environ.get("WSOVOD_DATASETS", "./datasets")

    # COCO
    coco_splits = {
        "coco_2017_train": ("coco/annotations/instances_train2017.json", "coco/train2017"),
        "coco_2017_val": ("coco/annotations/instances_val2017.json", "coco/val2017"),
    }
    for name, (json_file, image_root) in coco_splits.items():
        if name not in DatasetCatalog.list():
            register_coco_instances(
                name, os.path.join(root, json_file), os.path.join(root, image_root)
            )
            meta = coco_meta()
            MetadataCatalog.get(name).set(
                thing_classes=meta["thing_classes"],
                thing_dataset_id_to_contiguous_id=meta["thing_dataset_id_to_contiguous_id"],
                in_voc=meta["in_voc"],
                base_classes=meta["base_classes"],
                novel_classes=meta["novel_classes"],
            )

    # Pascal VOC
    voc_splits = [
        ("voc_2007_trainval", "VOC2007", "trainval", 2007),
        ("voc_2007_train", "VOC2007", "train", 2007),
        ("voc_2007_val", "VOC2007", "val", 2007),
        ("voc_2007_test", "VOC2007", "test", 2007),
        ("voc_2012_trainval", "VOC2012", "trainval", 2012),
        ("voc_2012_train", "VOC2012", "train", 2012),
        ("voc_2012_val", "VOC2012", "val", 2012),
    ]
    for name, dirname, split, year in voc_splits:
        if name not in DatasetCatalog.list():
            register_pascal_voc(name, os.path.join(root, dirname), split, year)

    # ILSVRC 2012 (COCO-format jsons produced by tools/ilsvrc_*.py)
    ilsvrc_splits = {
        "ilsvrc_2012_train": (
            "ILSVRC2012/ILSVRC2012_img_train.json",
            "ILSVRC2012/ILSVRC2012_img_train",
        ),
        "ilsvrc_2012_val": (
            "ILSVRC2012/ILSVRC2012_img_val.json",
            "ILSVRC2012/ILSVRC2012_img_val",
        ),
    }
    for name, (json_file, image_root) in ilsvrc_splits.items():
        if name not in DatasetCatalog.list():
            register_coco_instances(
                name, os.path.join(root, json_file), os.path.join(root, image_root)
            )
