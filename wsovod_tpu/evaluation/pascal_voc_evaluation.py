"""Pascal VOC detection evaluator with CorLoc.

Reference ``wsovod/evaluation/pascal_voc_evaluation.py:20-565``
(``PascalVOCDetectionEvaluator_WSL``): VOC AP at IoU .50:.95 (reporting
AP/AP50/AP75) via the classic ``voc_eval`` ranked-detections algorithm
(07 metric: 11-point interpolation for year 2007), plus **CorLoc** — for each
class, the fraction of positive images whose single top-scoring detection
hits a ground truth at >= the IoU threshold (reference ``voc_eval_corloc``
:357-452).

Pure numpy on host CPU; detections are produced on device and gathered here.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np

from ..data.catalog import MetadataCatalog


def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric: bool = False) -> float:
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = prec[rec >= t].max() if np.any(rec >= t) else 0.0
            ap += p / 11.0
        return float(ap)
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _iou_one_to_many(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    if len(boxes) == 0:
        return np.zeros((0,))
    ixmin = np.maximum(boxes[:, 0], box[0])
    iymin = np.maximum(boxes[:, 1], box[1])
    ixmax = np.minimum(boxes[:, 2], box[2])
    iymax = np.minimum(boxes[:, 3], box[3])
    iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
    ih = np.maximum(iymax - iymin + 1.0, 0.0)
    inter = iw * ih
    union = (
        (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
        + (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
        - inter
    )
    return inter / np.maximum(union, 1e-10)


def voc_eval(
    detections: List[dict],
    gt_by_image: Dict,
    ovthresh: float = 0.5,
    use_07_metric: bool = False,
):
    """detections: [{image_id, bbox (XYXY), score}]; gt_by_image:
    {image_id: {boxes [N,4], det [N] bool scratch}}. Returns (rec, prec, ap)."""
    npos = sum(len(g["boxes"]) for g in gt_by_image.values())
    dets = sorted(detections, key=lambda d: -d["score"])
    nd = len(dets)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    seen = {k: np.zeros(len(g["boxes"]), bool) for k, g in gt_by_image.items()}
    for i, d in enumerate(dets):
        g = gt_by_image.get(d["image_id"])
        if g is None or len(g["boxes"]) == 0:
            fp[i] = 1
            continue
        ious = _iou_one_to_many(np.asarray(d["bbox"]), g["boxes"])
        j = int(np.argmax(ious))
        if ious[j] > ovthresh and not seen[d["image_id"]][j]:
            tp[i] = 1
            seen[d["image_id"]][j] = True
        else:
            fp[i] = 1
    tp = np.cumsum(tp)
    fp = np.cumsum(fp)
    rec = tp / max(npos, 1)
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    ap = voc_ap(rec, prec, use_07_metric)
    return rec, prec, ap


def voc_eval_corloc(
    detections: List[dict], gt_by_image: Dict, ovthresh: float = 0.5
) -> float:
    """CorLoc (reference :357-452): fraction of images containing the class
    whose top-1 detection hits a gt at >= thresh."""
    pos_images = [k for k, g in gt_by_image.items() if len(g["boxes"])]
    if not pos_images:
        return np.nan
    best_by_image = {}
    for d in detections:
        cur = best_by_image.get(d["image_id"])
        if cur is None or d["score"] > cur["score"]:
            best_by_image[d["image_id"]] = d
    hit = 0
    for k in pos_images:
        d = best_by_image.get(k)
        if d is None:
            continue
        ious = _iou_one_to_many(np.asarray(d["bbox"]), gt_by_image[k]["boxes"])
        if len(ious) and ious.max() > ovthresh:
            hit += 1
    return hit / len(pos_images)


class PascalVOCDetectionEvaluator_WSL:
    """Accumulates per-image predictions; ``evaluate()`` returns
    {'bbox': {AP, AP50, AP75, CorLoc, CorLoc50, CorLoc75, per-class AP50}}."""

    def __init__(self, dataset_name: str, use_07_metric: bool | None = None):
        meta = MetadataCatalog.get(dataset_name)
        self.class_names = list(meta.thing_classes)
        year = meta.get("year", 2007)
        self.use_07 = use_07_metric if use_07_metric is not None else year == 2007
        self.reset()

    def reset(self):
        self._preds = defaultdict(list)  # class -> [det dict]
        self._gt = defaultdict(dict)  # class -> image_id -> {boxes}

    def process_gt(self, image_id, gt_boxes: np.ndarray, gt_classes: np.ndarray):
        for c in range(len(self.class_names)):
            sel = gt_classes == c
            self._gt[c][image_id] = {"boxes": np.asarray(gt_boxes[sel], np.float64)}

    def process(
        self,
        image_id,
        boxes: np.ndarray,
        scores: np.ndarray,
        classes: np.ndarray,
    ):
        for b, s, c in zip(boxes, scores, classes):
            self._preds[int(c)].append(
                {"image_id": image_id, "bbox": np.asarray(b, np.float64), "score": float(s)}
            )

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        # multi-host: merge per-host predictions onto main (reference
        # pascal_voc_evaluation.py:75-81 comm.gather); GT is full on all hosts
        import jax

        if jax.process_count() > 1:
            from ..parallel.distributed import all_gather_objects, is_main_process

            parts = all_gather_objects(dict(self._preds))
            if not is_main_process():
                return {}
            merged = defaultdict(list)
            for part in parts:
                for c, lst in part.items():
                    merged[c].extend(lst)
            self._preds = merged
        thresholds = [0.5 + 0.05 * i for i in range(10)]
        aps = defaultdict(list)  # thresh -> [per-class ap]
        corlocs = defaultdict(list)
        for c in range(len(self.class_names)):
            gt = self._gt[c]
            dets = self._preds.get(c, [])
            for t in thresholds:
                _, _, ap = voc_eval(dets, gt, ovthresh=t, use_07_metric=self.use_07)
                aps[t].append(ap)
                corlocs[t].append(voc_eval_corloc(dets, gt, ovthresh=t))
        mean_ap = {t: float(np.mean(aps[t])) for t in thresholds}
        mean_cl = {t: float(np.nanmean(corlocs[t])) for t in thresholds}
        ret = {
            "bbox": {
                "AP": float(np.mean(list(mean_ap.values()))),
                "AP50": mean_ap[0.5],
                "AP75": mean_ap[0.75],
                "CorLoc": float(np.mean(list(mean_cl.values()))),
                "CorLoc50": mean_cl[0.5],
                "CorLoc75": mean_cl[0.75],
            }
        }
        for i, name in enumerate(self.class_names):
            ret["bbox"][f"AP50-{name}"] = aps[0.5][i]
        return ret
