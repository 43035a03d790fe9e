import numpy as np
import pytest

from wsovod_tpu.evaluation.cocoeval import COCOEval
from wsovod_tpu.evaluation.pascal_voc_evaluation import (
    PascalVOCDetectionEvaluator_WSL,
    voc_ap,
    voc_eval,
    voc_eval_corloc,
)


def test_voc_ap_known_values():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec) == pytest.approx(1.0)
    # 07 metric, perfect detector
    assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(1.0)


def test_voc_eval_perfect_and_miss():
    gt = {
        "img1": {"boxes": np.array([[10, 10, 50, 50]], float)},
        "img2": {"boxes": np.array([[20, 20, 80, 80]], float)},
    }
    dets = [
        {"image_id": "img1", "bbox": np.array([10, 10, 50, 50]), "score": 0.9},
        {"image_id": "img2", "bbox": np.array([20, 20, 80, 80]), "score": 0.8},
    ]
    _, _, ap = voc_eval(dets, gt, 0.5)
    assert ap == pytest.approx(1.0)
    # one duplicate detection -> counted as FP but AP50 still 1.0 (ranked below)
    dets_dup = dets + [
        {"image_id": "img1", "bbox": np.array([11, 11, 51, 51]), "score": 0.1}
    ]
    _, _, ap2 = voc_eval(dets_dup, gt, 0.5)
    assert ap2 == pytest.approx(1.0)
    # miss one gt
    _, _, ap3 = voc_eval(dets[:1], gt, 0.5)
    assert ap3 == pytest.approx(0.5)


def test_corloc():
    gt = {
        "a": {"boxes": np.array([[0, 0, 10, 10]], float)},
        "b": {"boxes": np.array([[0, 0, 10, 10]], float)},
        "c": {"boxes": np.zeros((0, 4))},
    }
    dets = [
        {"image_id": "a", "bbox": np.array([0, 0, 10, 10]), "score": 0.9},
        {"image_id": "a", "bbox": np.array([50, 50, 60, 60]), "score": 0.1},
        {"image_id": "b", "bbox": np.array([50, 50, 60, 60]), "score": 0.9},
        {"image_id": "b", "bbox": np.array([0, 0, 10, 10]), "score": 0.2},
    ]
    # only image a's TOP detection hits; c has no gt and is excluded
    assert voc_eval_corloc(dets, gt, 0.5) == pytest.approx(0.5)


def _mk_coco(num_imgs=4):
    gt, dt = [], []
    ann_id = 1
    for i in range(num_imgs):
        gt.append(
            {
                "id": ann_id,
                "image_id": i,
                "category_id": 1,
                "bbox": [10, 10, 40, 40],
                "area": 1600,
                "iscrowd": 0,
            }
        )
        ann_id += 1
    return gt


def test_cocoeval_perfect():
    gt = _mk_coco()
    dt = [
        {"image_id": g["image_id"], "category_id": 1, "bbox": g["bbox"], "score": 0.9}
        for g in gt
    ]
    ev = COCOEval(gt, dt, img_ids=list(range(4)), cat_ids=[1])
    res = ev.summarize()
    assert res["AP"] == pytest.approx(100.0)
    assert res["AP50"] == pytest.approx(100.0)
    assert res["AR@100"] == pytest.approx(100.0)


def test_cocoeval_localization_quality():
    gt = _mk_coco()
    # detections offset so IoU ~ 0.6: matches at 0.5/0.55/0.6 only
    dt = [
        {
            "image_id": g["image_id"],
            "category_id": 1,
            "bbox": [10, 10 + 10, 40, 40],
            "score": 0.9,
        }
        for g in gt
    ]
    ev = COCOEval(gt, dt, img_ids=list(range(4)), cat_ids=[1])
    res = ev.summarize()
    # IoU(det, gt) = 30/50 = 0.6 -> matched at thresholds .5, .55, .6 only
    assert res["AP50"] == pytest.approx(100.0)
    assert res["AP75"] == pytest.approx(0.0)
    assert res["AP"] == pytest.approx(100.0 * 3 / 10, abs=0.5)


def test_cocoeval_crowd_ignore():
    gt = [
        {
            "id": 1, "image_id": 0, "category_id": 1,
            "bbox": [0, 0, 100, 100], "area": 10000, "iscrowd": 1,
        },
        {
            "id": 2, "image_id": 0, "category_id": 1,
            "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0,
        },
    ]
    dt = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        # falls inside the crowd region: should be ignored, not FP
        {"image_id": 0, "category_id": 1, "bbox": [50, 50, 40, 40], "score": 0.8},
    ]
    ev = COCOEval(gt, dt, img_ids=[0], cat_ids=[1])
    res = ev.summarize()
    assert res["AP50"] == pytest.approx(100.0)


def test_voc_evaluator_end_to_end():
    from wsovod_tpu.data.catalog import MetadataCatalog

    MetadataCatalog.get("_test_voc").set(
        thing_classes=["cat", "dog"], year=2007, evaluator_type="pascal_voc"
    )
    ev = PascalVOCDetectionEvaluator_WSL("_test_voc")
    ev.process_gt("im0", np.array([[0, 0, 10, 10]]), np.array([0]))
    ev.process_gt("im1", np.array([[5, 5, 25, 25]]), np.array([1]))
    ev.process("im0", np.array([[0, 0, 10, 10]]), np.array([0.9]), np.array([0]))
    ev.process("im1", np.array([[5, 5, 25, 25]]), np.array([0.8]), np.array([1]))
    res = ev.evaluate()["bbox"]
    assert res["AP50"] == pytest.approx(1.0)
    assert res["CorLoc50"] == pytest.approx(1.0)


def test_box_proposal_ar_hand_computed():
    """Hand-derived AR fixture for the proposal-recall branch (reference
    _evaluate_box_proposals, coco_evaluation.py:476-585)."""
    from wsovod_tpu.evaluation.coco_evaluation import evaluate_box_proposals

    gt_by_image = {
        1: [
            ((0, 0, 10, 10), 100.0, 0),        # small
            ((0, 0, 100, 100), 10000.0, 0),    # large
            ((5, 5, 9, 9), 16.0, 1),           # crowd: ignored
        ]
    }
    proposals = [
        {
            "image_id": 1,
            "boxes": np.array(
                [[0, 0, 100, 82], [0, 0, 10, 10], [50, 50, 60, 60]], np.float32
            ),
            "objectness_logits": np.array([3.0, 2.0, 1.0], np.float32),
        }
    ]
    # overlaps: gt1 matched exactly (IoU 1.0), gt2 covered at IoU 0.82
    res = evaluate_box_proposals(proposals, gt_by_image, area="all")
    assert res["num_pos"] == 2
    # recalls: 1.0 for t in {.5..0.8} (7 thresholds), 0.5 for {.85,.9,.95}
    assert abs(res["ar"] - (7 * 1.0 + 3 * 0.5) / 10) < 1e-6
    res_s = evaluate_box_proposals(proposals, gt_by_image, area="small")
    assert res_s["num_pos"] == 1 and abs(res_s["ar"] - 1.0) < 1e-6
    res_l = evaluate_box_proposals(proposals, gt_by_image, area="large")
    assert res_l["num_pos"] == 1 and abs(res_l["ar"] - 0.7) < 1e-6
    # limit=1 keeps only the top-objectness proposal -> gt1 unmatched
    res_1 = evaluate_box_proposals(proposals, gt_by_image, area="all", limit=1)
    assert abs(res_1["ar"] - 0.35) < 1e-6  # only gt2 at 0.82 -> 7/10 * 0.5


def test_coco_evaluator_proposal_branch(tmp_path):
    """COCOEvaluator reports box_proposals AR + dumps box_proposals.pkl when
    proposals are processed (reference coco_evaluation.py:203-204,284-305)."""
    import pickle

    from wsovod_tpu.data.catalog import MetadataCatalog
    from wsovod_tpu.evaluation.coco_evaluation import COCOEvaluator

    name = "synthetic_proposal_eval_ds"
    if name not in MetadataCatalog.list():
        MetadataCatalog.get(name).set(
            thing_classes=["a", "b"], evaluator_type="coco"
        )
    ev = COCOEvaluator(name, output_dir=str(tmp_path))
    ev.process_gt(7, np.array([[0, 0, 10, 10]]), np.array([0]))
    ev.process(7, np.array([[0, 0, 10, 10]]), np.array([0.9]), np.array([0]))
    ev.process_proposals(
        7, np.array([[0, 0, 10, 10], [3, 3, 30, 30]], np.float32),
        np.array([1.0, 0.5], np.float32),
    )
    out = ev.evaluate()
    assert "box_proposals" in out
    assert abs(out["box_proposals"]["AR@100"] - 100.0) < 1e-6
    assert abs(out["box_proposals"]["ARs@1000"] - 100.0) < 1e-6
    assert out["box_proposals"]["ARl@100"] == 0.0  # no large gt
    pkl = tmp_path / "box_proposals.pkl"
    assert pkl.exists()
    data = pickle.loads(pkl.read_bytes())
    assert data["ids"] == [7] and len(data["boxes"]) == 1
