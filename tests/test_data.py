import json
import os
import pickle

import numpy as np
import pytest

from wsovod_tpu.config import get_cfg
from wsovod_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from wsovod_tpu.data.dataset_mapper import DatasetMapper, default_image_buckets, fit_to_bucket
from wsovod_tpu.data.datasets.coco import load_coco_json, register_coco_instances
from wsovod_tpu.data.datasets.pascal_voc import load_voc_instances
from wsovod_tpu.data.loader import (
    build_detection_test_loader,
    build_detection_train_loader,
    get_detection_dataset_dicts,
)
from wsovod_tpu.data.proposals import unique_boxes


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    """Synthetic 4-image VOC2007-style dataset."""
    import cv2

    root = tmp_path_factory.mktemp("VOC2007")
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "JPEGImages").mkdir()
    (root / "Annotations").mkdir()
    rng = np.random.RandomState(0)
    ids = []
    for i in range(4):
        fid = f"{i:06d}"
        ids.append(fid)
        img = rng.randint(0, 255, (80 + 10 * i, 100, 3), np.uint8)
        cv2.imwrite(str(root / "JPEGImages" / (fid + ".jpg")), img)
        xml = f"""<annotation><size><width>100</width><height>{80 + 10 * i}</height></size>
<object><name>cat</name><difficult>0</difficult>
<bndbox><xmin>10</xmin><ymin>10</ymin><xmax>50</xmax><ymax>60</ymax></bndbox></object>
<object><name>dog</name><difficult>1</difficult>
<bndbox><xmin>1</xmin><ymin>1</ymin><xmax>20</xmax><ymax>20</ymax></bndbox></object>
</annotation>"""
        (root / "Annotations" / (fid + ".xml")).write_text(xml)
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(ids))
    return str(root)


def test_voc_loader_skips_difficult(voc_root):
    dicts = load_voc_instances(voc_root, "trainval", class_names=("cat", "dog"))
    assert len(dicts) == 4
    # difficult dog skipped
    assert all(len(r["annotations"]) == 1 for r in dicts)
    assert dicts[0]["annotations"][0]["category_id"] == 0
    # 1-indexed -> 0-indexed conversion
    assert dicts[0]["annotations"][0]["bbox"][0] == 9.0


def test_coco_json_loader(tmp_path):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((60, 90, 3), np.uint8))
    coco = {
        "images": [{"id": 7, "file_name": "a.jpg", "height": 60, "width": 90}],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 5, "bbox": [10, 10, 20, 30], "iscrowd": 0}
        ],
        "categories": [{"id": 5, "name": "thing"}],
    }
    jf = tmp_path / "ann.json"
    jf.write_text(json.dumps(coco))
    dicts = load_coco_json(str(jf), str(img_dir), "_test_coco_json")
    assert len(dicts) == 1
    ann = dicts[0]["annotations"][0]
    assert ann["category_id"] == 0
    assert ann["bbox"] == [10, 10, 30, 40]


def test_unique_boxes():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [1, 1, 5, 5]], np.float32)
    keep = unique_boxes(boxes)
    assert len(keep) == 2


def test_fit_to_bucket():
    buckets = [(96, 128), (128, 96), (128, 128)]
    img = np.ones((90, 100, 3), np.float32)
    out, true_size, scale = fit_to_bucket(img, buckets)
    assert out.shape == (96, 128, 3)
    assert true_size == (90, 100)
    assert scale == 1.0
    # oversized image downscales into the largest bucket
    big = np.ones((300, 400, 3), np.float32)
    out2, ts2, s2 = fit_to_bucket(big, buckets)
    assert out2.shape[0:2] == (128, 128)
    assert s2 < 1.0


@pytest.fixture(scope="module")
def registered_voc(voc_root):
    name = "_synth_voc_trainval"
    if name not in DatasetCatalog.list():
        DatasetCatalog.register(
            name, lambda: load_voc_instances(voc_root, "trainval", ("cat", "dog"))
        )
        MetadataCatalog.get(name).set(
            thing_classes=["cat", "dog"], year=2007, evaluator_type="pascal_voc"
        )
    return name


def _small_cfg(registered_voc, with_proposals=None):
    cfg = get_cfg()
    cfg.DATASETS.TRAIN = (registered_voc,)
    cfg.DATASETS.TEST = (registered_voc,)
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.INPUT.CROP.ENABLED = False
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TPU.PROPOSAL_PAD = 16
    cfg.TPU.MAX_GT_PAD = 8
    if with_proposals:
        cfg.MODEL.LOAD_PROPOSALS = True
        cfg.DATASETS.PROPOSAL_FILES_TRAIN = (with_proposals,)
        cfg.DATASETS.PROPOSAL_FILES_TEST = (with_proposals,)
        cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 10
        cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 10
    else:
        cfg.MODEL.LOAD_PROPOSALS = False
    return cfg


@pytest.fixture(scope="module")
def proposal_file(tmp_path_factory, registered_voc):
    rng = np.random.RandomState(0)
    dicts = DatasetCatalog.get(registered_voc)
    ids, boxes, scores = [], [], []
    for r in dicts:
        ids.append(r["image_id"])
        b = rng.uniform(0, 50, (20, 2))
        b = np.concatenate([b, b + rng.uniform(5, 30, (20, 2))], 1).astype(np.float32)
        boxes.append(b)
        scores.append(rng.uniform(0, 1, 20).astype(np.float32))
    path = tmp_path_factory.mktemp("props") / "props.pkl"
    with open(path, "wb") as f:
        pickle.dump({"indexes": ids, "boxes": boxes, "scores": scores}, f)
    return str(path)


def test_train_loader_batches(registered_voc, proposal_file):
    cfg = _small_cfg(registered_voc, with_proposals=proposal_file)
    loader = build_detection_train_loader(cfg)
    batch = next(loader)
    assert batch["images"].shape[0] == 2
    assert batch["images"].shape[3] == 3
    assert batch["images"].shape[1] % 32 == 0
    assert batch["sam_boxes"].shape == (2, 16, 4)
    assert batch["sam_valid"].sum() > 0
    assert batch["gt_valid"].any()
    # proposal boxes inside image bounds
    sizes = batch["image_sizes"]
    assert (batch["sam_boxes"][..., 2] <= sizes[:, 1:2] + 1e-3).all()


def test_test_loader_covers_all(registered_voc, proposal_file):
    cfg = _small_cfg(registered_voc, with_proposals=proposal_file)
    loader = build_detection_test_loader(cfg, registered_voc, batch_size=2)
    seen = []
    for batch in loader:
        for i, ok in enumerate(np.asarray(batch["batch_valid"])):
            if ok:
                seen.append(batch["image_id"][i])
    assert len(seen) == 4
    assert len(set(seen)) == 4


def test_repeat_factor_sampler(registered_voc):
    from wsovod_tpu.data.loader import RepeatFactorTrainingSampler

    dicts = DatasetCatalog.get(registered_voc)
    s = RepeatFactorTrainingSampler(dicts, repeat_thresh=0.5, seed=0)
    it = iter(s)
    idxs = [next(it) for _ in range(40)]
    assert set(idxs) <= set(range(len(dicts)))
