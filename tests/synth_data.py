"""Shared synthetic-dataset builder for end-to-end tests.

Writes a tiny on-disk image set + d2-format proposal pickle and registers it
in the catalogs. Used by test_end_to_end (VOC evaluator) and the int8
golden-eval guard (COCO evaluator)."""

import pickle

import numpy as np

from wsovod_tpu.data.catalog import DatasetCatalog, MetadataCatalog


def make_synth_dataset(root, name, evaluator_type="pascal_voc", n_images=6):
    import cv2

    (root / "imgs").mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    dicts = []
    ids, pboxes, pscores = [], [], []
    for i in range(n_images):
        h, w = 72, 96
        img = rng.randint(0, 120, (h, w, 3), np.uint8)
        # paint a bright "object", color keyed to the class so the
        # image-level MIL supervision is actually learnable
        x1, y1 = rng.randint(5, 30), rng.randint(5, 20)
        x2, y2 = x1 + rng.randint(20, 40), y1 + rng.randint(20, 35)
        img[y1:y2, x1:x2] = [250, 120, 30] if i % 2 == 0 else [30, 220, 250]
        path = str(root / "imgs" / f"{i}.jpg")
        cv2.imwrite(path, img)
        dicts.append(
            {
                "file_name": path,
                "image_id": i,
                "height": h,
                "width": w,
                "annotations": [
                    {"category_id": i % 2, "bbox": [x1, y1, x2, y2], "bbox_mode": "xyxy"}
                ],
            }
        )
        ids.append(i)
        # proposals: the gt box + jittered + random
        base = np.array([[x1, y1, x2, y2]], np.float32)
        jit = base + rng.uniform(-4, 4, (6, 4)).astype(np.float32)
        rand = rng.uniform(0, 50, (5, 2))
        rand = np.concatenate([rand, rand + rng.uniform(10, 30, (5, 2))], 1).astype(
            np.float32
        )
        pboxes.append(np.concatenate([base, jit, rand]))
        pscores.append(rng.uniform(0.5, 1.0, 12).astype(np.float32))

    prop_path = str(root / "props.pkl")
    with open(prop_path, "wb") as f:
        pickle.dump({"indexes": ids, "boxes": pboxes, "scores": pscores}, f)

    if name not in DatasetCatalog.list():
        DatasetCatalog.register(name, lambda: dicts)
        meta = MetadataCatalog.get(name)
        meta.set(thing_classes=["red", "blue"], evaluator_type=evaluator_type)
        if evaluator_type == "pascal_voc":
            meta.set(year=2007)
    return name, prop_path
