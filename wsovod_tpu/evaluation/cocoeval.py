"""Numpy port of the COCO detection evaluation protocol (COCOeval, bbox).

pycocotools is not available in this environment, so this is a from-scratch
implementation of the standard COCO AP algorithm (greedy per-image/category
matching at 10 IoU thresholds, crowd-ignore semantics, area ranges, maxDets,
101-point precision interpolation) producing the same summary metrics
(AP, AP50, AP75, APs, APm, APl, AR@1/10/100, ARs, ARm, ARl).

Consumed by ``coco_evaluation.COCOEvaluator`` which mirrors the reference's
evaluator outputs (``wsovod/evaluation/coco_evaluation.py:34-741``).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def bbox_iou_xywh(dets: np.ndarray, gts: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """IoU of det x gt boxes in XYWH; crowd gt uses intersection/det-area."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    dx1, dy1 = dets[:, 0], dets[:, 1]
    dx2, dy2 = dets[:, 0] + dets[:, 2], dets[:, 1] + dets[:, 3]
    gx1, gy1 = gts[:, 0], gts[:, 1]
    gx2, gy2 = gts[:, 0] + gts[:, 2], gts[:, 1] + gts[:, 3]
    iw = np.maximum(
        0.0, np.minimum(dx2[:, None], gx2[None]) - np.maximum(dx1[:, None], gx1[None])
    )
    ih = np.maximum(
        0.0, np.minimum(dy2[:, None], gy2[None]) - np.maximum(dy1[:, None], gy1[None])
    )
    inter = iw * ih
    d_area = (dets[:, 2] * dets[:, 3])[:, None]
    g_area = (gts[:, 2] * gts[:, 3])[None]
    union = np.where(iscrowd[None].astype(bool), d_area, d_area + g_area - inter)
    return inter / np.maximum(union, 1e-10)


class COCOEval:
    """gt / dt are COCO-style annotation dicts (bbox XYWH)."""

    def __init__(
        self,
        gt_anns: List[dict],
        dt_anns: List[dict],
        img_ids: List,
        cat_ids: List[int],
    ):
        self.img_ids = list(img_ids)
        self.cat_ids = list(cat_ids)
        self._gt = defaultdict(list)
        self._dt = defaultdict(list)
        for g in gt_anns:
            self._gt[(g["image_id"], g["category_id"])].append(g)
        for d in dt_anns:
            self._dt[(d["image_id"], d["category_id"])].append(d)
        self.eval: Optional[Dict] = None

    # ---------------------------------------------------------- matching
    def _evaluate_img(self, img_id, cat_id, area_rng, max_det):
        gt = self._gt.get((img_id, cat_id), [])
        dt = self._dt.get((img_id, cat_id), [])
        if len(gt) == 0 and len(dt) == 0:
            return None

        for g in gt:
            area = g.get("area", g["bbox"][2] * g["bbox"][3])
            # pycocotools boundary semantics: out-of-range is area<lo or
            # area>hi (STRICT at the upper bound — area == 32^2 is "small")
            g["_ignore"] = g.get("iscrowd", 0) or area < area_rng[0] or area > area_rng[1]

        gt_order = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gt_order]
        dt = sorted(dt, key=lambda d: -d["score"])[:max_det]

        g_boxes = np.array([g["bbox"] for g in gt]).reshape(-1, 4)
        d_boxes = np.array([d["bbox"] for d in dt]).reshape(-1, 4)
        crowd = np.array([g.get("iscrowd", 0) for g in gt])
        ious = bbox_iou_xywh(d_boxes, g_boxes, crowd)

        t_count = len(IOU_THRS)
        gt_ig = np.array([g["_ignore"] for g in gt], bool)
        dt_matches = np.zeros((t_count, len(dt)), dtype=np.int64) - 1
        dt_ignore = np.zeros((t_count, len(dt)), bool)
        gt_matched = np.zeros((t_count, len(gt)), bool)

        for ti, t in enumerate(IOU_THRS):
            for di in range(len(dt)):
                best_iou = min(t, 1 - 1e-10)
                best = -1
                for gi in range(len(gt)):
                    if gt_matched[ti, gi] and not crowd[gi]:
                        continue
                    # break if moving to ignore gt after a real match
                    if best > -1 and not gt_ig[best] and gt_ig[gi]:
                        break
                    if ious[di, gi] < best_iou:
                        continue
                    best_iou = ious[di, gi]
                    best = gi
                if best == -1:
                    continue
                dt_matches[ti, di] = best
                dt_ignore[ti, di] = gt_ig[best]
                gt_matched[ti, best] = True

        # dets outside the area range that are unmatched -> ignore
        # (same strict-upper-bound semantics as the gt ignore above)
        d_areas = d_boxes[:, 2] * d_boxes[:, 3]
        d_out = (d_areas < area_rng[0]) | (d_areas > area_rng[1])
        dt_ignore = dt_ignore | ((dt_matches == -1) & d_out[None])

        return {
            "scores": np.array([d["score"] for d in dt]),
            "matched": dt_matches > -1,
            "dt_ignore": dt_ignore,
            "num_gt": int(np.sum(~gt_ig)),
        }

    # -------------------------------------------------------- accumulate
    def evaluate(self) -> Dict:
        k_count = len(self.cat_ids)
        a_names = list(AREA_RANGES)
        precision = -np.ones((len(IOU_THRS), len(REC_THRS), k_count, len(a_names), len(MAX_DETS)))
        recall = -np.ones((len(IOU_THRS), k_count, len(a_names), len(MAX_DETS)))
        scores_out = -np.ones_like(precision)

        for ki, cat in enumerate(self.cat_ids):
            for ai, a_name in enumerate(a_names):
                rng = AREA_RANGES[a_name]
                for mi, max_det in enumerate(MAX_DETS):
                    results = [
                        self._evaluate_img(img, cat, rng, max_det)
                        for img in self.img_ids
                    ]
                    results = [r for r in results if r is not None]
                    if not results:
                        continue
                    scores = np.concatenate([r["scores"] for r in results])
                    order = np.argsort(-scores, kind="mergesort")
                    matched = np.concatenate([r["matched"] for r in results], axis=1)[:, order]
                    ignored = np.concatenate([r["dt_ignore"] for r in results], axis=1)[:, order]
                    npig = sum(r["num_gt"] for r in results)
                    if npig == 0:
                        continue
                    tps = matched & ~ignored
                    fps = ~matched & ~ignored
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for ti in range(len(IOU_THRS)):
                        tp, fp = tp_sum[ti], fp_sum[ti]
                        rc = tp / npig
                        pr = tp / np.maximum(tp + fp, np.finfo(float).eps)
                        recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0.0
                        # monotone precision envelope
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            pr[i - 1] = max(pr[i - 1], pr[i])
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(len(REC_THRS))
                        ss = np.zeros(len(REC_THRS))
                        s_sorted = scores[order]
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                                ss[ri] = s_sorted[pi]
                        precision[ti, :, ki, ai, mi] = q
                        scores_out[ti, :, ki, ai, mi] = ss

        self.eval = {"precision": precision, "recall": recall, "scores": scores_out}
        return self.eval

    # --------------------------------------------------------- summarize
    def _summarize(self, ap=True, iou=None, area="all", max_det=100):
        assert self.eval is not None
        ai = list(AREA_RANGES).index(area)
        mi = MAX_DETS.index(max_det)
        if ap:
            s = self.eval["precision"]
            if iou is not None:
                s = s[np.where(np.isclose(IOU_THRS, iou))[0]]
            s = s[:, :, :, ai, mi]
        else:
            s = self.eval["recall"]
            if iou is not None:
                s = s[np.where(np.isclose(IOU_THRS, iou))[0]]
            s = s[:, :, ai, mi]
        valid = s[s > -1]
        return float(np.mean(valid)) if valid.size else float("nan")

    def summarize(self) -> Dict[str, float]:
        if self.eval is None:
            self.evaluate()
        return {
            "AP": self._summarize(True) * 100,
            "AP50": self._summarize(True, iou=0.5) * 100,
            "AP75": self._summarize(True, iou=0.75) * 100,
            "APs": self._summarize(True, area="small") * 100,
            "APm": self._summarize(True, area="medium") * 100,
            "APl": self._summarize(True, area="large") * 100,
            "AR@1": self._summarize(False, max_det=1) * 100,
            "AR@10": self._summarize(False, max_det=10) * 100,
            "AR@100": self._summarize(False, max_det=100) * 100,
            "ARs": self._summarize(False, area="small") * 100,
            "ARm": self._summarize(False, area="medium") * 100,
            "ARl": self._summarize(False, area="large") * 100,
        }

    def per_category_ap(self) -> Dict[int, float]:
        assert self.eval is not None
        out = {}
        ai = list(AREA_RANGES).index("all")
        mi = MAX_DETS.index(100)
        for ki, cat in enumerate(self.cat_ids):
            s = self.eval["precision"][:, :, ki, ai, mi]
            valid = s[s > -1]
            out[cat] = float(np.mean(valid)) * 100 if valid.size else float("nan")
        return out

    def per_category_ap50(self) -> Dict[int, float]:
        assert self.eval is not None
        out = {}
        ai = list(AREA_RANGES).index("all")
        mi = MAX_DETS.index(100)
        ti = np.where(np.isclose(IOU_THRS, 0.5))[0][0]
        for ki, cat in enumerate(self.cat_ids):
            s = self.eval["precision"][ti, :, ki, ai, mi]
            valid = s[s > -1]
            out[cat] = float(np.mean(valid)) * 100 if valid.size else float("nan")
        return out
