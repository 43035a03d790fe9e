"""Test-time augmentation: AVG and UNION merges.

Reference ``wsovod/modeling/test_time_augmentation_avg.py:27-335`` and
``test_time_augmentation_union.py``; selection rule (reference
``engine/trainer.py:151-154``): AVG for precomputed-proposal models (the same
proposal set rides every augmentation, so pre-NMS score/box matrices average
row-wise), UNION for RPN models (per-aug detections are unioned then re-NMSed).

Host side builds the augmented batches (8 scales x flip); the device side is
the same jitted inference forward; merging is a small jnp postprocess.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.dataset_mapper import fit_to_bucket
from ..data.transforms import hflip, resize_shortest_edge
from .fast_rcnn_inference import fast_rcnn_inference_batched


def make_tta_inputs(
    image: np.ndarray,  # HWC float BGR, original size
    proposal_boxes: np.ndarray,  # [S, 4] original coords
    proposal_scores: np.ndarray,
    proposal_valid: np.ndarray,
    min_sizes: Tuple[int, ...],
    max_size: int,
    flip: bool,
    buckets: List[Tuple[int, int]],
    proposal_pad: int,
) -> List[Dict]:
    """One batch dict per augmentation, each with an ``inv`` record mapping
    network coords back to the original image."""
    h0, w0 = image.shape[:2]
    out = []
    for short in min_sizes:
        for do_flip in ([False, True] if flip else [False]):
            img, box_fn = resize_shortest_edge(image, short, max_size)
            boxes = box_fn(proposal_boxes.copy())
            if do_flip:
                img, flip_fn = hflip(img)
                boxes = flip_fn(boxes)
            img, true_size, extra = fit_to_bucket(img, buckets)
            boxes = boxes * extra
            s = proposal_pad
            sb = np.zeros((s, 4), np.float32)
            ss = np.zeros((s,), np.float32)
            sv = np.zeros((s,), bool)
            n = min(len(boxes), s)
            sb[:n] = boxes[:n]
            ss[:n] = proposal_scores[:n]
            sv[:n] = proposal_valid[:n]
            out.append(
                {
                    "images": img[None],
                    "image_sizes": np.array([true_size], np.int32),
                    "sam_boxes": sb[None],
                    "sam_scores": ss[None],
                    "sam_valid": sv[None],
                    "inv": {
                        "scale_y": h0 / true_size[0],
                        "scale_x": w0 / true_size[1],
                        "flip": do_flip,
                        "flip_width": true_size[1],
                        "orig_size": (h0, w0),
                    },
                }
            )
    return out


def inverse_transform_boxes(boxes: np.ndarray, inv: Dict) -> np.ndarray:
    b = np.asarray(boxes, np.float32).copy()
    if inv["flip"]:
        w = inv["flip_width"]
        x1 = w - b[..., 2]
        x2 = w - b[..., 0]
        b[..., 0], b[..., 2] = x1, x2
    b[..., 0::2] *= inv["scale_x"]
    b[..., 1::2] *= inv["scale_y"]
    h0, w0 = inv["orig_size"]
    b[..., 0::2] = np.clip(b[..., 0::2], 0, w0)
    b[..., 1::2] = np.clip(b[..., 1::2], 0, h0)
    return b


def tta_avg_merge(
    all_scores: List[np.ndarray],  # per aug [P, C+1]
    all_boxes: List[np.ndarray],  # per aug [P, 4] (network coords)
    invs: List[Dict],
    valid: np.ndarray,  # [P]
    score_thresh: float,
    nms_thresh: float,
    topk: int,
):
    """AVG merge (reference ``test_time_augmentation_avg.py:280-318``):
    inverse-transform per-aug boxes, average boxes and scores row-wise, one
    final fast_rcnn_inference."""
    boxes = np.mean(
        [inverse_transform_boxes(b, inv) for b, inv in zip(all_boxes, invs)], axis=0
    )
    scores = np.mean(all_scores, axis=0)
    h0, w0 = invs[0]["orig_size"]
    det = fast_rcnn_inference_batched(
        jnp.asarray(boxes)[None],
        jnp.asarray(scores)[None],
        jnp.asarray(valid)[None],
        jnp.asarray(np.array([[h0, w0]], np.int32)),
        score_thresh=score_thresh,
        nms_thresh=nms_thresh,
        topk_per_image=topk,
    )
    return det


def tta_union_merge(
    det_boxes: List[np.ndarray],  # per aug [K, 4] network coords (valid only)
    det_scores: List[np.ndarray],
    det_classes: List[np.ndarray],
    invs: List[Dict],
    nms_thresh: float,
    topk: int,
):
    """UNION merge: concat per-aug post-NMS detections in original coords,
    class-wise NMS, keep top-k."""
    boxes = np.concatenate(
        [inverse_transform_boxes(b, inv) for b, inv in zip(det_boxes, invs)], axis=0
    )
    scores = np.concatenate(det_scores, axis=0)
    classes = np.concatenate(det_classes, axis=0)
    if len(boxes) == 0:
        return boxes, scores, classes
    from ..ops.nms import nms_topk as _nms_topk

    idx, ok = _nms_topk(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        nms_thresh,
        k=min(topk, len(boxes)),
        valid=jnp.ones((len(boxes),), bool),
        idxs=jnp.asarray(classes),
    )
    idx = np.asarray(idx)[np.asarray(ok)]
    return boxes[idx], scores[idx], classes[idx]
