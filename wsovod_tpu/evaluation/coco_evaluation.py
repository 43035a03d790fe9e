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
        self._gt: List[dict] = []
        self._img_ids: List = []
        self._ann_id = 1

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
            parts = all_gather_objects(self._predictions)
            if not is_main_process():
                return False
            self._predictions = [p for part in parts for p in part]
        self._gathered = True
        return True

    def _run_eval(self) -> COCOEval:
        ev = COCOEval(self._gt, self._predictions, self._img_ids, self._cat_ids)
        ev.evaluate()
        return ev

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        if not self._gather_predictions():
            return {}
        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            with open(
                os.path.join(self._output_dir, "coco_instances_results.json"), "w"
            ) as f:
                json.dump(self._predictions, f)
        ev = self._run_eval()
        results = ev.summarize()
        per_cat = ev.per_category_ap()
        for cat_id, ap in per_cat.items():
            name = self._thing_classes[
                {v: k for k, v in self._reverse_id_map.items()}[cat_id]
            ]
            results[f"AP-{name}"] = ap
        return {"bbox": results}


class OVCOCOEvaluator(COCOEvaluator):
    """Open-vocabulary split report (reference ``ov_coco_evaluation.py:410-498``):
    per-group mean AP and AP50 over the 48-base / 17-novel COCO classes."""

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        if not self._gather_predictions():
            return {}
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
        return {"bbox": results}
