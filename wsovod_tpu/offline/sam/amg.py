"""SAM automatic mask generation -> box proposals (TPU pipeline).

Replaces ``SamAutomaticMaskGenerator`` as used by the reference's offline
proposal tool (``tools/generate_sam_proposals_cuda.py:16-138``): a
``points_per_side`` grid of single-point prompts per crop (full image +
``crop_n_layers`` overlapping crops), multimask decoding, predicted-IoU and
stability-score filtering, per-crop box NMS, then cross-crop NMS. For WSOVOD
only the BOXES matter (the pkl stores boxes/scores), so masks never leave the
device: stability scores and bounding boxes are reduced from mask logits
on-TPU and only [N, 4] boxes + scores come back.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .modeling import SAM
from .predictor import preprocess_image_for_sam


def build_point_grid(n_per_side: int) -> np.ndarray:
    offset = 1.0 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)  # [N, 2] in [0,1]


def generate_crop_boxes(
    im_h: int, im_w: int, n_layers: int, overlap_ratio: float
) -> List[Tuple[int, int, int, int]]:
    crops = [(0, 0, im_w, im_h)]
    short = min(im_h, im_w)
    for layer in range(n_layers):
        n = 2 ** (layer + 1)
        overlap = int(overlap_ratio * short * (2 / n))
        cw = int(np.ceil((overlap * (n - 1) + im_w) / n))
        ch = int(np.ceil((overlap * (n - 1) + im_h) / n))
        x0s = [int((cw - overlap) * i) for i in range(n)]
        y0s = [int((ch - overlap) * i) for i in range(n)]
        for y0 in y0s:
            for x0 in x0s:
                crops.append((x0, y0, min(x0 + cw, im_w), min(y0 + ch, im_h)))
    return crops


class SamAutomaticMaskGenerator:
    def __init__(
        self,
        sam: SAM,
        params,
        points_per_side: int = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        mask_threshold: float = 0.0,
        box_nms_thresh: float = 0.7,
        crop_n_layers: int = 0,
        crop_nms_thresh: float = 0.7,
        crop_overlap_ratio: float = 512 / 1500,
        min_box_area: float = 0.0,
    ):
        self.sam = sam
        self.params = params
        self.grid = build_point_grid(points_per_side)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.mask_threshold = mask_threshold
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.min_box_area = min_box_area

        self._encode = jax.jit(
            lambda p, x: self.sam.apply(p, x, method=self.sam.encode_image)
        )
        self._decode_batch = jax.jit(self._decode_points_stats)

    # ---------------------------------------------------------------- device
    def _decode_points_stats(self, params, emb, points):
        """points [B, 2] (model coords) -> per candidate (boxes [B*3, 4] in
        model coords, iou [B*3], stability [B*3]) — the 3 multimask outputs."""
        labels = jnp.ones((points.shape[0], 1), jnp.int32)
        masks, iou = self.sam.apply(
            params, emb, points[:, None, :], labels, method=self.sam.decode_points
        )
        masks = masks[:, 1:]  # multimask outputs
        iou = iou[:, 1:]
        b, m, mh, mw = masks.shape
        masks = masks.reshape(b * m, mh, mw)
        iou = iou.reshape(b * m)

        t = self.mask_threshold
        off = self.stability_score_offset
        area_high = jnp.sum(masks > (t + off), axis=(1, 2)).astype(jnp.float32)
        area_low = jnp.sum(masks > (t - off), axis=(1, 2)).astype(jnp.float32)
        stability = area_high / jnp.maximum(area_low, 1.0)

        binm = masks > t
        hs = jnp.any(binm, axis=2)
        ws = jnp.any(binm, axis=1)
        rows = jnp.arange(mh)
        cols = jnp.arange(mw)
        y1 = jnp.min(jnp.where(hs, rows[None], mh), axis=1)
        y2 = jnp.max(jnp.where(hs, rows[None], -1), axis=1)
        x1 = jnp.min(jnp.where(ws, cols[None], mw), axis=1)
        x2 = jnp.max(jnp.where(ws, cols[None], -1), axis=1)
        boxes = jnp.stack([x1, y1, x2 + 1, y2 + 1], axis=1).astype(jnp.float32)
        empty = ~jnp.any(binm, axis=(1, 2))
        return boxes, iou, stability, empty

    # ------------------------------------------------------------------ host
    def _process_crop(self, image_bgr: np.ndarray, crop) -> Dict[str, np.ndarray]:
        x0, y0, x1, y1 = crop
        crop_img = image_bgr[y0:y1, x0:x1]
        ch, cw = crop_img.shape[:2]
        x, scale, (nh, nw) = preprocess_image_for_sam(crop_img, self.sam.img_size)
        emb = self._encode(self.params, jnp.asarray(x))

        pts = self.grid * np.array([nw, nh])  # model-input coords
        all_boxes, all_scores = [], []
        ppb = self.points_per_batch
        n = len(pts)
        pad = (-n) % ppb
        pts_p = np.concatenate([pts, np.zeros((pad, 2))], 0) if pad else pts
        for i in range(0, len(pts_p), ppb):
            boxes, iou, stab, empty = self._decode_batch(
                self.params, emb, jnp.asarray(pts_p[i : i + ppb], jnp.float32)
            )
            boxes = np.asarray(boxes)
            iou = np.asarray(iou)
            stab = np.asarray(stab)
            empty = np.asarray(empty)
            keep = (
                (iou > self.pred_iou_thresh)
                & (stab > self.stability_score_thresh)
                & ~empty
            )
            if i + ppb > n:  # drop padding points
                real = np.zeros(len(keep), bool)
                real[: (n - i) * 3] = True
                keep &= real
            # mask grid -> model coords -> crop coords
            up = self.sam.img_size / (self.sam.img_size // 4)
            b = boxes[keep] * up / scale
            b[:, 0::2] = np.clip(b[:, 0::2], 0, cw)
            b[:, 1::2] = np.clip(b[:, 1::2], 0, ch)
            all_boxes.append(b)
            all_scores.append((iou[keep] * stab[keep]).clip(max=1.0))
        boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4))
        scores = np.concatenate(all_scores) if all_scores else np.zeros((0,))

        if self.min_box_area > 0 and len(boxes):
            wh = boxes[:, 2:] - boxes[:, :2]
            ok = (wh[:, 0] * wh[:, 1]) >= self.min_box_area
            boxes, scores = boxes[ok], scores[ok]

        if len(boxes):
            keep = _nms_numpy(boxes, scores, self.box_nms_thresh)
            boxes, scores = boxes[keep], scores[keep]
        boxes[:, 0::2] += x0
        boxes[:, 1::2] += y0
        return {"boxes": boxes, "scores": scores}

    def generate(self, image_bgr: np.ndarray) -> Dict[str, np.ndarray]:
        """Returns {'boxes': [N, 4] XYXY, 'scores': [N]} in image coords."""
        h, w = image_bgr.shape[:2]
        crops = generate_crop_boxes(h, w, self.crop_n_layers, self.crop_overlap_ratio)
        boxes_l, scores_l = [], []
        for crop in crops:
            r = self._process_crop(image_bgr, crop)
            boxes_l.append(r["boxes"])
            scores_l.append(r["scores"])
        boxes = np.concatenate(boxes_l)
        scores = np.concatenate(scores_l)
        if len(crops) > 1 and len(boxes):
            keep = _nms_numpy(boxes, scores, self.crop_nms_thresh)
            boxes, scores = boxes[keep], scores[keep]
        order = np.argsort(-scores)
        return {"boxes": boxes[order], "scores": scores[order]}


def _nms_numpy(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[order[1:]] - inter, 1e-10)
        order = order[1:][iou <= thresh]
    return np.array(keep, np.int64)
