"""Pseudo-ground-truth mining and proposal (re-)labeling.

Reference ``wsovod/modeling/roi_heads/roi_heads.py``:

* ``get_image_level_gt`` (:158-174) — the per-image multi-label one-hot
  derived from instance annotations; the ONLY supervision WSOVOD uses.
* ``get_pgt_top_k`` (:1042-1343) — per image, for each *present* class, the
  top-k scoring proposals (area > 20) become pseudo boxes; weights are the
  image-level class logits; empty-set fallbacks are score 1 / box
  [-1e4,-1e4,1e4,1e4] / class 0.
* ``get_pgt_mist`` (:909-1040) — MIST mining: top-p% per class with a score
  threshold, per-class NMS, union.
* ``label_and_sample_proposals_wsl`` (:1566-1825) — IoU-match proposals to
  the mined pseudo GT (per-stage matcher), copy class/weight/score, subsample
  marking non-sampled rows as ignore (-1) while keeping all rows.

All functions are single-image pure functions over padded tensors (vmap at
the call site); dynamic selections become fixed-capacity ``[C * k]`` tables
with validity masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.matcher import Matcher
from ..ops.nms import nms_mask
from ..ops.sampling import subsample_labels
from ..structures.boxes import box_area, pairwise_iou


class PseudoGT(NamedTuple):
    boxes: jnp.ndarray  # [G, 4]
    classes: jnp.ndarray  # [G] int32
    scores: jnp.ndarray  # [G]
    weights: jnp.ndarray  # [G]
    valid: jnp.ndarray  # [G] bool


def get_image_level_gt(
    gt_classes: jnp.ndarray,  # [G] int32 instance classes (padded)
    gt_valid: jnp.ndarray,  # [G]
    num_classes: int,
):
    """Multi-label one-hot + per-class instance counts (reference :158-174)."""
    oh = jax.nn.one_hot(jnp.where(gt_valid, gt_classes, num_classes), num_classes + 1)
    oh = oh[:, :num_classes]
    counts = jnp.sum(oh, axis=0)
    present = counts > 0
    return present.astype(jnp.float32), counts, present


def pgt_top_k(
    pred_boxes: jnp.ndarray,  # [P, 4] or [P, C, 4]
    pred_scores: jnp.ndarray,  # [P, C] (background column already dropped)
    proposal_valid: jnp.ndarray,  # [P]
    class_present: jnp.ndarray,  # [C] bool
    img_class_logits: jnp.ndarray,  # [C] image-level class scores (weights)
    top_k: int = 1,
    thres: float = 0.0,
    min_area: float = 20.0,
) -> PseudoGT:
    """Mine top-k boxes per present class. Output capacity C * top_k."""
    p, c = pred_scores.shape
    if pred_boxes.ndim == 2:
        boxes_pc = jnp.broadcast_to(pred_boxes[:, None, :], (p, c, 4))
    else:
        boxes_pc = pred_boxes

    area_ok = box_area(boxes_pc) > min_area  # [P, C]
    row_ok = proposal_valid[:, None] & area_ok  # [P, C]
    s = jnp.where(row_ok & class_present[None, :], pred_scores, -jnp.inf)

    k = min(top_k, p)
    top_s, top_i = jax.lax.top_k(s.T, k)  # [C, k]
    top_boxes = jnp.take_along_axis(
        jnp.transpose(boxes_pc, (1, 0, 2)), top_i[..., None], axis=1
    )  # [C, k, 4]

    valid = class_present[:, None] & jnp.isfinite(top_s)  # [C, k]
    if thres > 0:
        rank0 = jnp.arange(k)[None, :] == 0
        valid = valid & ((top_s >= thres) | rank0)

    classes = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[:, None], (c, k))
    weights = jnp.broadcast_to(img_class_logits[:, None], (c, k))

    g = c * k
    boxes = top_boxes.reshape(g, 4)
    scores = jnp.where(valid, top_s, 0.0).reshape(g)
    classes = classes.reshape(g)
    weights = weights.reshape(g).astype(jnp.float32)
    valid = valid.reshape(g)

    # empty-set fallback (reference :1188-1213): one entry, class 0, score 1
    any_valid = jnp.any(valid)
    fallback_box = jnp.array([-10000.0, -10000.0, 10000.0, 10000.0])
    boxes = jnp.where(any_valid, boxes, jnp.broadcast_to(fallback_box, boxes.shape))
    first = jnp.arange(g) == 0
    valid = jnp.where(any_valid, valid, first)
    scores = jnp.where(any_valid, scores, first.astype(scores.dtype))
    weights = jnp.where(any_valid, weights, first.astype(weights.dtype))
    classes = jnp.where(any_valid, classes, jnp.zeros_like(classes))

    boxes = jnp.where(valid[:, None], boxes, 0.0)
    return PseudoGT(boxes, classes, scores, weights, valid)


def pgt_mist(
    pred_boxes: jnp.ndarray,  # [P, 4] or [P, C, 4]
    pred_scores: jnp.ndarray,  # [P, C]
    proposal_valid: jnp.ndarray,
    class_present: jnp.ndarray,
    img_class_logits: jnp.ndarray,
    top_percent: float = 0.15,
    thres: float = 0.05,
    nms_thresh: float = 0.2,
    cap_per_class: int | None = None,
    min_area: float = 20.0,
    sam: bool = False,
    nms_cap: int = 2048,
) -> PseudoGT:
    """MIST mining (reference :909-1040): top-p% per class -> NMS -> union.

    Semantics matched to the reference:

    * per-class candidate count = ``int(p * top_percent)``
      (roi_heads.py:920-927 via ``get_pgt_top_k(top_k=0.15)``), here rounded
      up to a 64 bucket for shape reuse with the surplus ranks masked off;
    * the NMS is GLOBAL across classes — the reference passes all-zero ids to
      ``batched_nms`` (roi_heads.py:930-935 ``pgt_idxs = zeros_like``);
    * without SAM refinement the reference's Instances zip sets
      ``gt_weights = pgt_scores`` (roi_heads.py:1320-1328 zips ``pgt_scores``
      twice); with SAM it keeps the image-level logits (:1297). ``sam=True``
      selects the latter.

    ``nms_cap`` bounds the per-window IoU matrix at O(cap^2): candidate sets
    larger than the cap (many-class images: ~``#present_classes * p*0.15``
    candidates) run through the exact tiled greedy NMS
    (``nms_mask_tiled``), which processes score-sorted cap-size windows with
    carry-forward suppression — no candidates are dropped.
    """
    p, c = pred_scores.shape
    k_frac = max(int(p * top_percent), 1)
    k_bucket = -(-k_frac // 64) * 64  # round UP to a 64 bucket
    k = min(k_bucket if cap_per_class is None else min(k_bucket, cap_per_class), p)

    mined = pgt_top_k(
        pred_boxes,
        pred_scores,
        proposal_valid,
        class_present,
        img_class_logits,
        top_k=k,
        thres=thres,
        min_area=min_area,
    )
    # ranks beyond the reference's exact candidate count (columns are
    # score-sorted by top_k) are padding from the 64-bucket rounding
    g = c * k
    valid = mined.valid & (jnp.tile(jnp.arange(k), c) < k_frac)

    if g > nms_cap:
        from ..ops.nms import nms_mask_tiled

        keep = nms_mask_tiled(
            mined.boxes, mined.scores, nms_thresh, valid=valid,
            tile=nms_cap, carry_cap=nms_cap,
        )
    else:
        keep = nms_mask(mined.boxes, mined.scores, nms_thresh, valid=valid)

    weights = mined.weights if sam else mined.scores
    return PseudoGT(
        mined.boxes, mined.classes, mined.scores, weights, valid & keep
    )


class LabeledProposals(NamedTuple):
    gt_classes: jnp.ndarray  # [P] int32: class, C = background, -1 = ignore
    gt_boxes: jnp.ndarray  # [P, 4] matched pgt boxes
    gt_scores: jnp.ndarray  # [P]
    gt_weights: jnp.ndarray  # [P]


def label_and_sample_wsl(
    proposal_boxes: jnp.ndarray,  # [P, 4]
    proposal_valid: jnp.ndarray,  # [P]
    pgt: PseudoGT,
    matcher: Matcher,
    num_classes: int,
    batch_size_per_image: int,
    positive_fraction: float,
    key: jax.Array,
    cls_agnostic_bbox_known: bool = False,
) -> LabeledProposals:
    """Relabel proposals against mined pseudo GT (reference :1566-1825)."""
    iou = pairwise_iou(pgt.boxes, proposal_boxes)  # [G, P]
    matched_idx, match_labels = matcher(iou, gt_valid=pgt.valid)

    gt_classes = jnp.where(
        match_labels == 1,
        pgt.classes[matched_idx],
        jnp.int32(num_classes),  # background
    )
    gt_classes = jnp.where(match_labels == -1, -1, gt_classes)
    gt_classes = jnp.where(proposal_valid, gt_classes, -1)

    gt_boxes = pgt.boxes[matched_idx]
    gt_scores = pgt.scores[matched_idx]
    gt_weights = pgt.weights[matched_idx]

    # subsample: non-sampled rows become ignore(-1) but all rows are kept
    sample_labels = jnp.where(gt_classes == num_classes, 0, jnp.where(gt_classes >= 0, 1, -1))
    pos, neg = subsample_labels(
        sample_labels, batch_size_per_image, positive_fraction, key
    )
    sampled = pos | neg
    gt_classes = jnp.where(sampled, gt_classes, -1)

    # ignore rows get weight 0; background rows keep their matched weight for
    # the weighted CE (reference copies matched gt_weights for all rows and
    # the CE loss skips -1 labels, roi_heads.py:1688-1691)
    gt_weights = jnp.where(gt_classes == -1, 0.0, gt_weights)
    return LabeledProposals(gt_classes, gt_boxes, gt_scores, gt_weights)


def label_and_sample_plain(
    proposal_boxes: jnp.ndarray,  # [P, 4]
    proposal_valid: jnp.ndarray,  # [P]
    pgt: PseudoGT,
    matcher: Matcher,
    num_classes: int,
) -> LabeledProposals:
    """``WSOVOD.SAMPLING.SAMPLING_ON = False`` fallback: the plain d2
    ``label_and_sample_proposals`` (reference ``roi_heads.py:287-408``,
    selected at :810-815) with the ROI_HEADS matcher. The reference's
    ``_sample_proposals`` (:245-277) early-returns EVERY proposal — no
    subsampling — labeling matched rows with the pgt class, unmatched (0)
    as background and matcher-ignore (-1) as ignore, and copying
    gt_boxes/gt_scores/gt_weights through the match index."""
    iou = pairwise_iou(pgt.boxes, proposal_boxes)  # [G, P]
    matched_idx, match_labels = matcher(iou, gt_valid=pgt.valid)

    gt_classes = jnp.where(
        match_labels == 1, pgt.classes[matched_idx], jnp.int32(num_classes)
    )
    gt_classes = jnp.where(match_labels == -1, -1, gt_classes)
    gt_classes = jnp.where(proposal_valid, gt_classes, -1)

    gt_boxes = pgt.boxes[matched_idx]
    gt_scores = pgt.scores[matched_idx]
    gt_weights = jnp.where(gt_classes == -1, 0.0, pgt.weights[matched_idx])
    return LabeledProposals(gt_classes, gt_boxes, gt_scores, gt_weights)
