"""COCO-json dataset loader (no pycocotools dependency).

Minimal, evaluator-compatible port of d2's ``load_coco_json``: reads a COCO
instances json, maps category ids to contiguous ids, skips crowd annotations
on request, converts XYWH -> XYXY.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from ..catalog import DatasetCatalog, MetadataCatalog


def load_coco_json(
    json_file: str,
    image_root: str,
    dataset_name: Optional[str] = None,
) -> List[dict]:
    with open(json_file) as f:
        coco = json.load(f)

    cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
    cat_ids = [c["id"] for c in cats]
    id_map = {cid: i for i, cid in enumerate(cat_ids)}
    thing_classes = [c["name"] for c in cats]

    if dataset_name is not None:
        MetadataCatalog.get(dataset_name).set(
            thing_classes=thing_classes,
            thing_dataset_id_to_contiguous_id=id_map,
            json_file=json_file,
            image_root=image_root,
            evaluator_type="coco",
        )

    anns_by_image: Dict[int, List[dict]] = {}
    for ann in coco.get("annotations", []):
        anns_by_image.setdefault(ann["image_id"], []).append(ann)

    dicts = []
    for img in coco["images"]:
        record = {
            "file_name": os.path.join(image_root, img["file_name"]),
            "image_id": img["id"],
            "height": img["height"],
            "width": img["width"],
        }
        instances = []
        for ann in anns_by_image.get(img["id"], []):
            if ann.get("ignore", 0):
                continue
            x, y, w, h = ann["bbox"]
            obj = {
                "category_id": id_map[ann["category_id"]],
                "bbox": [x, y, x + w, y + h],
                "bbox_mode": "xyxy",
                "iscrowd": ann.get("iscrowd", 0),
            }
            instances.append(obj)
        record["annotations"] = instances
        dicts.append(record)
    return dicts


def register_coco_instances(name: str, json_file: str, image_root: str):
    DatasetCatalog.register(name, lambda: load_coco_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco"
    )
