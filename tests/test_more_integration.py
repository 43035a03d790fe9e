"""Multi-dataset loader, TTA driver, OV evaluator, dir-of-pkl proposals."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsovod_tpu.config import get_cfg
from wsovod_tpu.data.catalog import DatasetCatalog, MetadataCatalog


@pytest.fixture(scope="module")
def two_datasets(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("multi")
    rng = np.random.RandomState(0)
    names = []
    prop_files = []
    for d, (name, ncls) in enumerate([("_md_voc", 2), ("_md_coco", 3)]):
        (root / name).mkdir()
        dicts = []
        ids, boxes_l, scores_l = [], [], []
        for i in range(4):
            h, w = 64, 80
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            path = str(root / name / f"{i}.jpg")
            cv2.imwrite(path, img)
            dicts.append(
                {
                    "file_name": path,
                    "image_id": f"{name}_{i}",
                    "height": h,
                    "width": w,
                    "annotations": [
                        {"category_id": i % ncls, "bbox": [5, 5, 40, 40], "bbox_mode": "xyxy"}
                    ],
                }
            )
            ids.append(f"{name}_{i}")
            b = rng.uniform(0, 40, (8, 2))
            boxes_l.append(np.concatenate([b, b + 15], 1).astype(np.float32))
            scores_l.append(rng.uniform(0, 1, 8).astype(np.float32))
        pf = str(root / f"{name}_props.pkl")
        with open(pf, "wb") as f:
            pickle.dump({"indexes": ids, "boxes": boxes_l, "scores": scores_l}, f)
        if name not in DatasetCatalog.list():
            DatasetCatalog.register(name, lambda d=dicts: d)
            MetadataCatalog.get(name).set(
                thing_classes=[f"c{j}" for j in range(ncls)], evaluator_type="pascal_voc",
                year=2007,
            )
        names.append(name)
        prop_files.append(pf)
    return names, prop_files


def test_multi_dataset_loader_homogeneous_batches(two_datasets):
    names, prop_files = two_datasets
    cfg = get_cfg()
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.DATASETS.MIXED_DATASETS.NAMES = names
    cfg.DATASETS.MIXED_DATASETS.NUM_CLASSES = [2, 3]
    cfg.DATASETS.MIXED_DATASETS.PROPOSAL_FILES = prop_files
    cfg.DATASETS.MIXED_DATASETS.RATIOS = [1, 1]
    cfg.DATASETS.MIXED_DATASETS.USE_RFS = [False, False]
    cfg.DATASETS.MIXED_DATASETS.USE_CAS = [False, False]
    cfg.DATASETS.MIXED_DATASETS.FILTER_EMPTY_ANNOTATIONS = [True, True]
    cfg.SOLVER.IMS_PER_BATCH_LIST = [2, 2]
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 80
    cfg.INPUT.CROP.ENABLED = False
    cfg.TPU.PROPOSAL_PAD = 8
    cfg.TPU.MAX_GT_PAD = 4

    from wsovod_tpu.data.loader_multi_dataset import build_multi_dataset_train_loader

    loader = build_multi_dataset_train_loader(cfg)
    seen = set()
    for _ in range(6):
        batch = next(loader)
        ds = np.asarray(batch["dataset_id"])
        assert (ds == ds[0]).all(), "batch must be homogeneous in dataset_id"
        seen.add(int(ds[0]))
        assert batch["images"].shape[0] == 2
    assert seen == {0, 1}


def test_dir_of_pkl_proposals(tmp_path, two_datasets):
    from wsovod_tpu.data.proposals import load_proposals_into_dataset

    d = tmp_path / "per_image"
    d.mkdir()
    dicts = DatasetCatalog.get("_md_voc")
    rng = np.random.RandomState(0)
    for r in dicts[:2]:
        with open(d / f"{r['image_id']}.pkl", "wb") as f:
            pickle.dump(
                {"boxes": rng.rand(5, 4) * 50, "scores": rng.rand(5)}, f
            )
    out = load_proposals_into_dataset(dicts, str(d))
    assert len(out) == 2
    assert out[0]["proposal_boxes"].shape == (5, 4)
    # sorted by score descending
    s = out[0]["proposal_objectness_logits"]
    assert (np.diff(s) <= 0).all()


def test_ov_coco_evaluator_split():
    from wsovod_tpu.evaluation.coco_evaluation import OVCOCOEvaluator

    name = "_ov_test"
    MetadataCatalog.get(name).set(
        thing_classes=["cat", "dog", "bus"],
        thing_dataset_id_to_contiguous_id={1: 0, 2: 1, 3: 2},
        base_classes=["cat", "bus"],
        novel_classes=["dog"],
        evaluator_type="ov_coco",
    )
    ev = OVCOCOEvaluator(name)
    for i in range(3):
        ev.process_gt(i, np.array([[10, 10, 50, 50]]), np.array([i % 3]))
        ev.process(i, np.array([[10, 10, 50, 50]]), np.array([0.9]), np.array([i % 3]))
    res = ev.evaluate()["bbox"]
    assert res["AP-base"] == pytest.approx(100.0)
    assert res["AP-novel"] == pytest.approx(100.0)
    assert "AP50-base" in res


def test_tta_driver_smoke(two_datasets, tmp_path):
    """test_with_TTA_WSL end-to-end on a tiny model + synthetic dataset."""
    names, prop_files = two_datasets
    cfg = get_cfg()
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 16
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 4
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [16, 16]
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_DIM = 8
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_NUM = 1
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_REG = [True]
    cfg.DATASETS.TEST = (names[0],)
    cfg.DATASETS.PROPOSAL_FILES_TEST = (prop_files[0],)
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 8
    cfg.TEST.AUG.MIN_SIZES = (48, 64)
    cfg.TEST.AUG.MAX_SIZE = 96
    cfg.TEST.AUG.FLIP = True
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.TPU.PROPOSAL_PAD = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    # precomputed-proposal mode -> AVG merge path
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "PrecomputedProposals"

    from wsovod_tpu.engine.evaluator import test_with_TTA_WSL
    from wsovod_tpu.models import build_model

    model = build_model(cfg)
    emb = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
    batch = {
        "images": jnp.zeros((1, 64, 96, 3), jnp.float32),
        "image_sizes": jnp.asarray([[64, 80]], jnp.int32),
        "sam_boxes": jnp.zeros((1, 8, 4), jnp.float32),
        "sam_scores": jnp.zeros((1, 8), jnp.float32),
        "sam_valid": jnp.ones((1, 8), bool),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False,
                        embeddings=emb)
    results = test_with_TTA_WSL(cfg, model, params, embeddings=emb)
    res = results[names[0] + "_TTA"]["bbox"]
    assert "AP50" in res and np.isfinite(res["AP50"])


def test_tta_driver_union(two_datasets, tmp_path):
    """UNION merge path: RPN (non-precomputed) model through test_with_TTA_WSL
    (reference engine/trainer.py:151-154 selects TTAUNION for RPN models)."""
    names, prop_files = two_datasets
    cfg = get_cfg()
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 16
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 4
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [16, 16]
    cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.WEIGHT_DIM = 8
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_NUM = 1
    cfg.WSOVOD.INSTANCE_REFINEMENT.REFINE_REG = [True]
    cfg.DATASETS.TEST = (names[0],)
    cfg.DATASETS.PROPOSAL_FILES_TEST = (prop_files[0],)
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 8
    cfg.TEST.AUG.MIN_SIZES = (48, 64)
    cfg.TEST.AUG.MAX_SIZE = 96
    cfg.TEST.AUG.FLIP = True
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.TPU.PROPOSAL_PAD = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    assert cfg.MODEL.PROPOSAL_GENERATOR.NAME == "WSOVODRPN_V2"  # UNION branch

    from wsovod_tpu.engine.evaluator import test_with_TTA_WSL
    from wsovod_tpu.models import build_model

    model = build_model(cfg)
    emb = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
    batch = {
        "images": jnp.zeros((1, 64, 96, 3), jnp.float32),
        "image_sizes": jnp.asarray([[64, 80]], jnp.int32),
        "sam_boxes": jnp.zeros((1, 8, 4), jnp.float32),
        "sam_scores": jnp.zeros((1, 8), jnp.float32),
        "sam_valid": jnp.ones((1, 8), bool),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False,
                        embeddings=emb)
    results = test_with_TTA_WSL(cfg, model, params, embeddings=emb)
    res = results[names[0] + "_TTA"]["bbox"]
    assert "AP50" in res and np.isfinite(res["AP50"])
