#!/usr/bin/env python
"""ILSVRC-2012 dataset preparation: folder scan -> COCO-format json.

Consolidates the reference's ``tools/ilsvrc_info.py`` / ``ilsvrc_folder.py`` /
``convert_ilsvrc_classes_name.py`` into one CLI with subcommands:

  info     scan ImageNet train/val folders, write an info json (file list,
           synset per image)
  folder   build a COCO-format instances json from the info json (image-level
           labels only: one full-image annotation per image, as the weakly
           supervised pipeline needs only image-level classes)
  names    map synset ids (n01440764) to human-readable class names using a
           words mapping file
"""

import argparse
import json
import os
import sys


def cmd_info(args):
    from PIL import Image

    records = []
    synsets = sorted(
        d for d in os.listdir(args.image_root)
        if os.path.isdir(os.path.join(args.image_root, d))
    )
    for syn in synsets:
        folder = os.path.join(args.image_root, syn)
        for fn in sorted(os.listdir(folder)):
            if not fn.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            path = os.path.join(folder, fn)
            try:
                with Image.open(path) as im:
                    w, h = im.size
            except OSError:
                continue
            records.append(
                {"file_name": os.path.join(syn, fn), "synset": syn,
                 "width": w, "height": h}
            )
    with open(args.output, "w") as f:
        json.dump({"synsets": synsets, "images": records}, f)
    print(f"wrote {len(records)} images, {len(synsets)} synsets -> {args.output}")


def cmd_folder(args):
    with open(args.info) as f:
        info = json.load(f)
    synsets = info["synsets"]
    syn_to_id = {s: i + 1 for i, s in enumerate(synsets)}
    images, annotations = [], []
    for i, rec in enumerate(info["images"]):
        img_id = i + 1
        images.append(
            {"id": img_id, "file_name": rec["file_name"],
             "width": rec["width"], "height": rec["height"]}
        )
        annotations.append(
            {
                "id": img_id,
                "image_id": img_id,
                "category_id": syn_to_id[rec["synset"]],
                # full-image box: only the image-level class matters for WSOVOD
                "bbox": [0, 0, rec["width"], rec["height"]],
                "area": rec["width"] * rec["height"],
                "iscrowd": 0,
            }
        )
    categories = [{"id": syn_to_id[s], "name": s} for s in synsets]
    with open(args.output, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations, "categories": categories}, f
        )
    print(f"wrote COCO json with {len(images)} images -> {args.output}")


def cmd_names(args):
    """words file lines: '<synset>: <name1, name2, ...>' (the format of the
    bundled ``ilsvrc2012_classes_name.txt``, public ImageNet-1k metadata,
    reference ``tools/convert_ilsvrc_classes_name.py:12-16``) or the
    tab-separated WordNet ``words.txt`` form."""
    mapping = {}
    with open(args.words) as f:
        for line in f:
            parts = (
                line.split(":", 1) if ":" in line else line.strip().split("\t")
            )
            if len(parts) == 2:
                mapping[parts[0].strip()] = parts[1].split(",")[0].strip()
    with open(args.json) as f:
        coco = json.load(f)
    for cat in coco["categories"]:
        cat["name"] = mapping.get(cat["name"], cat["name"])
    with open(args.output, "w") as f:
        json.dump(coco, f)
    print(f"renamed {len(coco['categories'])} categories -> {args.output}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("info")
    pi.add_argument("--image-root", required=True)
    pi.add_argument("--output", required=True)
    pf = sub.add_parser("folder")
    pf.add_argument("--info", required=True)
    pf.add_argument("--output", required=True)
    pn = sub.add_parser("names")
    pn.add_argument("--json", required=True)
    pn.add_argument("--words", required=True)
    pn.add_argument("--output", required=True)
    args = p.parse_args()
    {"info": cmd_info, "folder": cmd_folder, "names": cmd_names}[args.cmd](args)


if __name__ == "__main__":
    main()
