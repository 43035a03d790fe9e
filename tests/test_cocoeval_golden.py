"""Golden validation of the from-scratch COCOeval port (VERDICT r1 #3).

pycocotools is unavailable in this container, so the port is pinned two ways:

1. a tiny hand-derived case whose 12 summary metrics are computed analytically
   below (the arithmetic is spelled out in comments — these are true goldens,
   not an implementation echo);
2. a randomized 20-image fixture (crowd anns, area-range edges incl. the
   exact 32^2/96^2 boundaries, score ties, >100 dets/image) cross-checked
   against an independently structured brute-force oracle implementing the
   published COCO protocol (greedy matching per IoU threshold, crowd
   intersection-over-det-area, unmatched-out-of-range det ignore, 101-point
   interpolated AP). Reference protocol:
   /root/reference/wsovod/evaluation/coco_evaluation.py:196-252 (consumes
   pycocotools' COCOeval).
"""

import numpy as np
import pytest

from wsovod_tpu.evaluation.cocoeval import COCOEval

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREAS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


# --------------------------------------------------------------- oracle
def _iou_single(d, g, crowd):
    dx, dy, dw, dh = d
    gx, gy, gw, gh = g
    iw = min(dx + dw, gx + gw) - max(dx, gx)
    ih = min(dy + dh, gy + gh) - max(dy, gy)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    union = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / union


def _oracle_eval_one(gts, dts, thr, area_rng, max_det):
    """One (category, image, threshold, area, maxdet) evaluation.

    Returns per-det (score, is_tp, is_ignored) records + #non-ignored gt.
    """
    lo, hi = area_rng
    gt_ignore = [
        bool(g.get("iscrowd", 0))
        or g.get("area", g["bbox"][2] * g["bbox"][3]) < lo
        or g.get("area", g["bbox"][2] * g["bbox"][3]) > hi
        for g in gts
    ]
    # non-ignored gt first (stable)
    order = sorted(range(len(gts)), key=lambda i: gt_ignore[i])
    gts = [gts[i] for i in order]
    gt_ignore = [gt_ignore[i] for i in order]
    dts = sorted(dts, key=lambda d: -d["score"])[:max_det]

    taken = [False] * len(gts)
    records = []
    for d in dts:
        best, best_iou = -1, min(thr, 1 - 1e-10)
        for gi, g in enumerate(gts):
            if taken[gi] and not g.get("iscrowd", 0):
                continue
            if best > -1 and not gt_ignore[best] and gt_ignore[gi]:
                break  # only ignored gts remain and a real match exists
            iou = _iou_single(d["bbox"], g["bbox"], g.get("iscrowd", 0))
            if iou < best_iou:
                continue
            best, best_iou = gi, iou
        if best > -1:
            taken[best] = True
            records.append((d["score"], True, gt_ignore[best]))
        else:
            a = d["bbox"][2] * d["bbox"][3]
            records.append((d["score"], False, a < lo or a > hi))
    return records, sum(1 for ig in gt_ignore if not ig)


def _oracle_summarize(gt_anns, dt_anns, img_ids, cat_ids):
    """Full 12-metric summary via the brute-force oracle."""
    by_gt, by_dt = {}, {}
    for g in gt_anns:
        by_gt.setdefault((g["image_id"], g["category_id"]), []).append(g)
    for d in dt_anns:
        by_dt.setdefault((d["image_id"], d["category_id"]), []).append(d)

    def pr_curve(cat, thr, area, max_det):
        records, npig = [], 0
        seen = False
        for img in img_ids:
            gts = by_gt.get((img, cat), [])
            dts = by_dt.get((img, cat), [])
            if not gts and not dts:
                continue
            seen = True
            rec, n = _oracle_eval_one(gts, dts, thr, AREAS[area], max_det)
            records += rec
            npig += n
        if not seen or npig == 0:
            return None, None
        records.sort(key=lambda r: -r[0])  # stable by construction order
        tp = fp = 0
        pr, rc = [], []
        for score, is_tp, ig in records:
            if ig:
                continue
            if is_tp:
                tp += 1
            else:
                fp += 1
            pr.append(tp / (tp + fp))
            rc.append(tp / npig)
        # interpolated precision at the 101 recall points
        for i in range(len(pr) - 2, -1, -1):
            pr[i] = max(pr[i], pr[i + 1])
        q = []
        for r in REC_THRS:
            idx = next((i for i, v in enumerate(rc) if v >= r), None)
            q.append(pr[idx] if idx is not None else 0.0)
        return q, (rc[-1] if rc else 0.0)

    def mean_ap(thrs, area, max_det):
        vals = []
        for cat in cat_ids:
            for t in thrs:
                q, _ = pr_curve(cat, t, area, max_det)
                if q is not None:
                    vals.append(np.mean(q))
        return float(np.mean(vals)) * 100 if vals else float("nan")

    def mean_ar(thrs, area, max_det):
        vals = []
        for cat in cat_ids:
            for t in thrs:
                _, r = pr_curve(cat, t, area, max_det)
                if r is not None:
                    vals.append(r)
        return float(np.mean(vals)) * 100 if vals else float("nan")

    return {
        "AP": mean_ap(IOU_THRS, "all", 100),
        "AP50": mean_ap([0.5], "all", 100),
        "AP75": mean_ap([0.75], "all", 100),
        "APs": mean_ap(IOU_THRS, "small", 100),
        "APm": mean_ap(IOU_THRS, "medium", 100),
        "APl": mean_ap(IOU_THRS, "large", 100),
        "AR@1": mean_ar(IOU_THRS, "all", 1),
        "AR@10": mean_ar(IOU_THRS, "all", 10),
        "AR@100": mean_ar(IOU_THRS, "all", 100),
        "ARs": mean_ar(IOU_THRS, "small", 1_00),
        "ARm": mean_ar(IOU_THRS, "medium", 100),
        "ARl": mean_ar(IOU_THRS, "large", 100),
    }


# ---------------------------------------------------------------- tests
def test_hand_derived_goldens():
    """2 gts, 3 dets, one category. Derivation:

    d1 (s=.9) IoU 1.0 with gtA -> TP at every threshold.
    d2 (s=.8) IoU 81/119 = 0.68067 with gtB -> TP for thr in {.5,.55,.6,.65},
       FP for thr >= .7. d3 (s=.7) IoU 0 -> always FP.
    thr <= .65 : PR = 1.0 everywhere -> AP_t = 1, recall 1.
    thr >= .70 : TP,FP,FP -> envelope precision 1.0 up to recall .5, 0 after
       -> AP_t = 51/101 (recall grid points 0.00..0.50), recall .5.
    AP  = (4*1 + 6*51/101)/10 = 0.7029703
    AP50 = 1, AP75 = 51/101; both gts are small (area 100) -> APs = AP,
    APm/APl undefined (nan). AR@1: only d1 -> recall .5 at every t -> 50.
    AR@10 = AR@100 = (4*1 + 6*.5)/10 = 70.
    """
    gts = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "area": 100, "id": 1},
        {"image_id": 1, "category_id": 1, "bbox": [20, 20, 10, 10], "area": 100, "id": 2},
    ]
    dts = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [21, 21, 10, 10], "score": 0.8},
        {"image_id": 1, "category_id": 1, "bbox": [40, 40, 10, 10], "score": 0.7},
    ]
    ev = COCOEval(gts, dts, img_ids=[1], cat_ids=[1])
    ev.evaluate()
    s = ev.summarize()
    assert abs(s["AP"] - 70.29703) < 1e-3, s["AP"]
    assert abs(s["AP50"] - 100.0) < 1e-6
    assert abs(s["AP75"] - 100 * 51 / 101) < 1e-3
    assert abs(s["APs"] - s["AP"]) < 1e-9
    assert np.isnan(s["APm"]) and np.isnan(s["APl"])
    assert abs(s["AR@1"] - 50.0) < 1e-6
    assert abs(s["AR@10"] - 70.0) < 1e-6
    assert abs(s["AR@100"] - 70.0) < 1e-6


def test_crowd_semantics_golden():
    """A crowd gt absorbs any number of dets (ignored, never FP); IoU vs
    crowd is intersection / det area."""
    gts = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 100, 100], "area": 10000,
         "iscrowd": 1, "id": 1},
        {"image_id": 1, "category_id": 1, "bbox": [200, 200, 10, 10], "area": 100, "id": 2},
    ]
    dts = [
        # fully inside the crowd: inter/det-area = 1 -> matched-ignored
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 10, 10], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [30, 30, 10, 10], "score": 0.85},
        # exact hit on the real gt
        {"image_id": 1, "category_id": 1, "bbox": [200, 200, 10, 10], "score": 0.8},
    ]
    ev = COCOEval(gts, dts, img_ids=[1], cat_ids=[1])
    ev.evaluate()
    s = ev.summarize()
    # only the real gt counts; its det is TP at every threshold with no FP
    # before it (the crowd-matched dets are ignored) -> perfect AP/AR
    assert abs(s["AP"] - 100.0) < 1e-6, s
    assert abs(s["AR@100"] - 100.0) < 1e-6
    # maxDet=1 keeps only the (ignored) crowd det -> recall 0
    assert abs(s["AR@1"] - 0.0) < 1e-6


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_fixture_vs_oracle(seed):
    rng = np.random.RandomState(seed)
    img_ids = list(range(1, 21))
    cat_ids = [1, 2, 3]
    gts, dts = [], []
    gid = 0
    for img in img_ids:
        for cat in cat_ids:
            for _ in range(rng.randint(0, 5)):
                gid += 1
                # exercise the exact 32^2 / 96^2 area boundaries
                kind = rng.randint(0, 4)
                if kind == 0:
                    w = h = 32.0
                elif kind == 1:
                    w = h = 96.0
                else:
                    w, h = rng.uniform(4, 150, 2)
                x, y = rng.uniform(0, 300, 2)
                gts.append({
                    "image_id": img, "category_id": cat, "id": gid,
                    "bbox": [x, y, w, h], "area": w * h,
                    "iscrowd": int(rng.rand() < 0.15),
                })
            n_dt = rng.randint(0, 9)
            if img == 3 and cat == 1:
                n_dt = 120  # exceed maxDets=100
            for _ in range(n_dt):
                if gts and rng.rand() < 0.5:
                    g = gts[rng.randint(0, len(gts))]
                    jitter = rng.uniform(-6, 6, 4)
                    bb = [
                        g["bbox"][0] + jitter[0], g["bbox"][1] + jitter[1],
                        max(2.0, g["bbox"][2] + jitter[2]),
                        max(2.0, g["bbox"][3] + jitter[3]),
                    ]
                else:
                    x, y = rng.uniform(0, 300, 2)
                    w, h = rng.uniform(4, 150, 2)
                    bb = [x, y, w, h]
                # quantized scores force ties
                score = round(float(rng.rand()), 1)
                dts.append({
                    "image_id": img, "category_id": cat,
                    "bbox": [float(v) for v in bb], "score": score,
                })

    ev = COCOEval(gts, dts, img_ids=img_ids, cat_ids=cat_ids)
    ev.evaluate()
    got = ev.summarize()
    want = _oracle_summarize(gts, dts, img_ids, cat_ids)
    for k in want:
        if np.isnan(want[k]):
            assert np.isnan(got[k]), k
        else:
            assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])
