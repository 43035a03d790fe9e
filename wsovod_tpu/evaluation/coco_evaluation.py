"""COCO + open-vocabulary COCO evaluators.

Reference ``wsovod/evaluation/coco_evaluation.py:34-741`` and
``ov_coco_evaluation.py:34-500``: gather predictions, convert to COCO-json
detection records (``instances_to_coco_json``), run COCOeval, report
AP/AP50/AP75/APs/m/l + per-category AP; the OV variant additionally reports
base(48)/novel(17) split averages.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..data.catalog import MetadataCatalog
from .cocoeval import COCOEval


def instances_to_coco_json(
    image_id,
    boxes_xyxy: np.ndarray,
    scores: np.ndarray,
    classes: np.ndarray,
    reverse_id_map: Dict[int, int],
) -> List[dict]:
    out = []
    for b, s, c in zip(boxes_xyxy, scores, classes):
        x1, y1, x2, y2 = [float(v) for v in b]
        out.append(
            {
                "image_id": image_id,
                "category_id": reverse_id_map[int(c)],
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "score": float(s),
            }
        )
    return out


_PROPOSAL_AREAS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def _pairwise_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU of XYXY boxes a [N, 4] vs b [M, 4] -> [N, M]."""
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def evaluate_box_proposals(
    proposals: List[dict],
    gt_by_image: Dict,
    area: str = "all",
    limit: Optional[int] = None,
    thresholds: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Proposal recall (reference ``coco_evaluation.py:476-585``): greedy
    best-covered-GT-first bipartite matching of proposals (sorted by
    objectness) to non-crowd GT within an area range; AR = mean recall over
    IoU 0.5:0.05:0.95.

    ``gt_by_image``: image_id -> list of (xyxy box, area, iscrowd)."""
    lo, hi = _PROPOSAL_AREAS[area]
    if thresholds is None:
        thresholds = np.arange(0.5, 0.95 + 1e-5, 0.05, dtype=np.float32)
    gt_overlaps = []
    num_pos = 0
    for pred in proposals:
        boxes = pred["boxes"]
        order = np.argsort(-pred["objectness_logits"], kind="stable")
        boxes = boxes[order]
        anno = gt_by_image.get(pred["image_id"], [])
        non_crowd = [(b, a) for b, a, crowd in anno if not crowd]
        # reference order: skip empty images BEFORE the area filter, count
        # positives AFTER it (coco_evaluation.py:528-537)
        if len(non_crowd) == 0 or len(boxes) == 0:
            continue
        gt = np.array(
            [b for b, a in non_crowd if lo <= a <= hi], np.float32
        ).reshape(-1, 4)
        num_pos += len(gt)
        if len(gt) == 0:
            continue
        if limit is not None and len(boxes) > limit:
            boxes = boxes[:limit]
        overlaps = _pairwise_iou_np(boxes, gt)
        _gt_ov = np.zeros(len(gt), np.float32)
        for j in range(min(len(boxes), len(gt))):
            max_overlaps = overlaps.max(axis=0)  # best proposal per gt
            argmax_overlaps = overlaps.argmax(axis=0)
            gt_ind = int(max_overlaps.argmax())  # best-covered gt first
            gt_ovr = max_overlaps[gt_ind]
            if gt_ovr < 0:
                break
            box_ind = int(argmax_overlaps[gt_ind])
            _gt_ov[j] = overlaps[box_ind, gt_ind]
            overlaps[box_ind, :] = -1
            overlaps[:, gt_ind] = -1
        gt_overlaps.append(_gt_ov)
    ov = np.sort(np.concatenate(gt_overlaps)) if gt_overlaps else np.zeros(0)
    recalls = np.array(
        [
            (ov >= t).sum() / float(num_pos) if num_pos else 0.0
            for t in thresholds
        ],
        np.float32,
    )
    return {
        "ar": float(recalls.mean()),
        "recalls": recalls,
        "thresholds": thresholds,
        "num_pos": num_pos,
    }


class COCOEvaluator:
    def __init__(self, dataset_name: str, output_dir: Optional[str] = None):
        self._meta = MetadataCatalog.get(dataset_name)
        self._output_dir = output_dir
        self._thing_classes = list(self._meta.thing_classes)
        id_map = self._meta.get("thing_dataset_id_to_contiguous_id")
        if id_map is None:
            id_map = {i: i for i in range(len(self._thing_classes))}
        self._reverse_id_map = {v: k for k, v in id_map.items()}
        self._cat_ids = sorted(self._reverse_id_map.values())
        self.reset()

    def reset(self):
        self._predictions: List[dict] = []
        self._proposals: List[dict] = []
        self._gt: List[dict] = []
        self._img_ids: List = []
        self._ann_id = 1
        self._gathered = False

    def process_gt(self, image_id, gt_boxes_xyxy, gt_classes, iscrowd=None):
        self._img_ids.append(image_id)
        for i, (b, c) in enumerate(zip(gt_boxes_xyxy, gt_classes)):
            x1, y1, x2, y2 = [float(v) for v in b]
            self._gt.append(
                {
                    "id": self._ann_id,
                    "image_id": image_id,
                    "category_id": self._reverse_id_map[int(c)],
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "iscrowd": int(iscrowd[i]) if iscrowd is not None else 0,
                }
            )
            self._ann_id += 1

    def process(self, image_id, boxes_xyxy, scores, classes):
        self._predictions.extend(
            instances_to_coco_json(
                image_id, boxes_xyxy, scores, classes, self._reverse_id_map
            )
        )

    def process_proposals(self, image_id, boxes_xyxy, objectness_logits):
        """Collect box proposals for the recall diagnostic (reference
        ``coco_evaluation.py:172-173``; enabled by routing proposals into the
        eval outputs, cfg ``TEST.EVAL_PROPOSALS``)."""
        self._proposals.append(
            {
                "image_id": image_id,
                "boxes": np.asarray(boxes_xyxy, np.float32),
                "objectness_logits": np.asarray(objectness_logits, np.float32),
            }
        )

    def _gather_predictions(self) -> bool:
        """Multi-host: merge per-host predictions onto the main process
        (reference ``coco_evaluation.py:182-188`` comm.gather). Returns False
        on non-main processes, which must report {}. GT is registered in full
        on every host, so only predictions move."""
        if getattr(self, "_gathered", False):
            return True
        from ..parallel.distributed import all_gather_objects, is_main_process

        import jax

        if jax.process_count() > 1:
            parts = all_gather_objects((self._predictions, self._proposals))
            if not is_main_process():
                return False
            self._predictions = [p for part in parts for p in part[0]]
            self._proposals = [p for part in parts for p in part[1]]
        self._gathered = True
        return True

    def _run_eval(self) -> COCOEval:
        ev = COCOEval(self._gt, self._predictions, self._img_ids, self._cat_ids)
        ev.evaluate()
        return ev

    def _gt_by_image(self) -> Dict:
        by_img: Dict = {}
        for g in self._gt:
            x, y, w, h = g["bbox"]
            by_img.setdefault(g["image_id"], []).append(
                ((x, y, x + w, y + h), g["area"], g["iscrowd"])
            )
        return by_img

    def _eval_box_proposals(self) -> Dict[str, float]:
        """Proposal AR@{100,1000} by area + ``box_proposals.pkl`` dump
        (reference ``coco_evaluation.py:284-321``) whenever predictions carry
        proposals — the diagnostic for RPN/SAM proposal quality independent
        of the MIL heads."""
        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            import pickle

            proposal_data = {
                "boxes": [p["boxes"] for p in self._proposals],
                "objectness_logits": [
                    p["objectness_logits"] for p in self._proposals
                ],
                "ids": [p["image_id"] for p in self._proposals],
                "bbox_mode": 0,  # XYXY_ABS
            }
            with open(
                os.path.join(self._output_dir, "box_proposals.pkl"), "wb"
            ) as f:
                pickle.dump(proposal_data, f)
        gt_by_image = self._gt_by_image()
        res = {}
        for limit in (100, 1000):
            for area, suffix in (
                ("all", ""), ("small", "s"), ("medium", "m"), ("large", "l")
            ):
                stats = evaluate_box_proposals(
                    self._proposals, gt_by_image, area=area, limit=limit
                )
                res[f"AR{suffix}@{limit}"] = stats["ar"] * 100.0
        return res

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        if not self._gather_predictions():
            return {}
        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            with open(
                os.path.join(self._output_dir, "coco_instances_results.json"), "w"
            ) as f:
                json.dump(self._predictions, f)
        proposal_res = self._eval_box_proposals() if self._proposals else None
        ev = self._run_eval()
        results = ev.summarize()
        per_cat = ev.per_category_ap()
        for cat_id, ap in per_cat.items():
            name = self._thing_classes[
                {v: k for k, v in self._reverse_id_map.items()}[cat_id]
            ]
            results[f"AP-{name}"] = ap
        out = {"bbox": results}
        if proposal_res is not None:
            out["box_proposals"] = proposal_res
        return out


class OVCOCOEvaluator(COCOEvaluator):
    """Open-vocabulary split report (reference ``ov_coco_evaluation.py:410-498``):
    per-group mean AP and AP50 over the 48-base / 17-novel COCO classes."""

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        if not self._gather_predictions():
            return {}
        proposal_res = self._eval_box_proposals() if self._proposals else None
        ev = self._run_eval()
        results = ev.summarize()
        per_cat = ev.per_category_ap()
        per_cat50 = ev.per_category_ap50()
        cont_of_cat = {v: k for k, v in self._reverse_id_map.items()}

        base = set(self._meta.get("base_classes", []))
        novel = set(self._meta.get("novel_classes", []))
        groups = {"base": [], "novel": []}
        groups50 = {"base": [], "novel": []}
        for cat_id, ap in per_cat.items():
            name = self._thing_classes[cont_of_cat[cat_id]]
            ap50 = per_cat50[cat_id]
            if name in base:
                groups["base"].append(ap)
                groups50["base"].append(ap50)
            elif name in novel:
                groups["novel"].append(ap)
                groups50["novel"].append(ap50)
            results[f"AP-{name}"] = ap
        for g in ("base", "novel"):
            if groups[g]:
                results[f"AP-{g}"] = float(np.nanmean(groups[g]))
                results[f"AP50-{g}"] = float(np.nanmean(groups50[g]))
        out = {"bbox": results}
        if proposal_res is not None:
            out["box_proposals"] = proposal_res
        return out
