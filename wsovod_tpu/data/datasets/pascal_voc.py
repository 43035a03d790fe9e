"""Pascal VOC loader: annotation XMLs -> standard dataset dicts.

Reference ``wsovod/data/datasets/pascal_voc.py:26-94``: skips objects marked
difficult; tolerates missing annotation files (image-only records — needed
for weakly supervised splits where only image lists exist).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List

from ..catalog import DatasetCatalog, MetadataCatalog
from .builtin_meta import VOC_CLASS_NAMES


def load_voc_instances(dirname: str, split: str, class_names=VOC_CLASS_NAMES) -> List[dict]:
    with open(os.path.join(dirname, "ImageSets", "Main", split + ".txt")) as f:
        fileids = [line.strip() for line in f if line.strip()]

    name_to_id = {c: i for i, c in enumerate(class_names)}
    dicts = []
    for fileid in fileids:
        jpeg = os.path.join(dirname, "JPEGImages", fileid + ".jpg")
        anno = os.path.join(dirname, "Annotations", fileid + ".xml")
        record = {"file_name": jpeg, "image_id": fileid}

        if not os.path.isfile(anno):
            dicts.append(record)
            continue

        tree = ET.parse(anno)
        size = tree.find("size")
        if size is not None:
            record["height"] = int(float(size.find("height").text))
            record["width"] = int(float(size.find("width").text))

        instances = []
        for obj in tree.findall("object"):
            cls = obj.find("name").text
            difficult = obj.find("difficult")
            if difficult is not None and int(difficult.text) == 1:
                continue  # reference skips difficult objects
            if cls not in name_to_id:
                continue
            bb = obj.find("bndbox")
            # VOC is 1-indexed inclusive; convert to 0-indexed XYXY
            bbox = [
                float(bb.find("xmin").text) - 1.0,
                float(bb.find("ymin").text) - 1.0,
                float(bb.find("xmax").text),
                float(bb.find("ymax").text),
            ]
            instances.append(
                {"category_id": name_to_id[cls], "bbox": bbox, "bbox_mode": "xyxy"}
            )
        record["annotations"] = instances
        dicts.append(record)
    return dicts


def register_pascal_voc(name: str, dirname: str, split: str, year: int):
    DatasetCatalog.register(name, lambda: load_voc_instances(dirname, split))
    MetadataCatalog.get(name).set(
        thing_classes=list(VOC_CLASS_NAMES),
        dirname=dirname,
        year=year,
        split=split,
        evaluator_type="pascal_voc",
    )
