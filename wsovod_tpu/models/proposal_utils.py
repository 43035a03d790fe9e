"""Top-proposal selection (mask-aware, static shapes).

Ports ``wsovod/modeling/proposal_generator/proposal_utils.py``:

* ``find_top_rpn_proposals`` (:26-144): per level top-k by objectness, concat,
  clip to image, drop small/non-finite, level-aware NMS, keep post_nms_topk.
* ``find_top_rpn_proposals_group`` (:147-363): the MRRP variant — top-k per
  (level, anchor) group with ``level_ids = level_id * 1000 + anchor_id``
  (decoded by ``// 1000`` downstream to route pooler branches), NMS across
  groups.
* ``add_ground_truth_to_proposals`` (:366-432): append (pseudo-)GT boxes as
  proposals with logit such that sigmoid ~= 1.

Dynamic keep-lists become fixed-capacity tables + validity masks.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.nms import batched_nms_mask
from ..structures.boxes import clip_boxes, nonempty_boxes
from ..structures.instances import Instances, cat_instances


def _per_group_topk(scores: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k along the last axis; returns (values, indices)."""
    k = min(k, scores.shape[-1])
    return jax.lax.top_k(scores, k)


def find_top_rpn_proposals(
    proposals: Sequence[jnp.ndarray],  # per level [B, Hi*Wi*A, 4]
    objectness_logits: Sequence[jnp.ndarray],  # per level [B, Hi*Wi*A]
    image_sizes: jnp.ndarray,  # [B, 2] (h, w)
    nms_thresh: float,
    pre_nms_topk: int,
    post_nms_topk: int,
    min_box_size: float,
    group_ids: Sequence[int] | None = None,
) -> Instances:
    """Returns batched Instances with fields ``proposal_boxes [B, K, 4]``,
    ``objectness_logits [B, K]``, ``level_ids [B, K]`` and ``valid [B, K]``,
    K = post_nms_topk."""
    if group_ids is None:
        group_ids = list(range(len(proposals)))

    cand_boxes, cand_logits, cand_ids, cand_valid = [], [], [], []
    for boxes_l, logits_l, gid in zip(proposals, objectness_logits, group_ids):
        k = min(pre_nms_topk, logits_l.shape[1])
        # treat NaN logits as -inf so they sort last (reference replaces
        # non-finite boxes/scores during training, proposal_utils.py:113-121)
        safe = jnp.where(jnp.isfinite(logits_l), logits_l, -jnp.inf)
        topv, topi = jax.lax.top_k(safe, k)  # [B, k]
        cand_boxes.append(jnp.take_along_axis(boxes_l, topi[..., None], axis=1))
        cand_logits.append(topv)
        cand_ids.append(jnp.full(topv.shape, gid, jnp.int32))
        cand_valid.append(jnp.isfinite(topv))

    boxes = jnp.concatenate(cand_boxes, axis=1)  # [B, L*k, 4]
    logits = jnp.concatenate(cand_logits, axis=1)
    ids = jnp.concatenate(cand_ids, axis=1)
    valid = jnp.concatenate(cand_valid, axis=1)

    # clip to per-image size; drop tiny and non-finite boxes
    boxes = jax.vmap(lambda b, sz: clip_boxes(b, (sz[0], sz[1])))(boxes, image_sizes)
    valid = valid & nonempty_boxes(boxes, threshold=min_box_size)
    valid = valid & jnp.all(jnp.isfinite(boxes), axis=-1)

    def _nms_one(b, s, i, v):
        # stop_after: only the post_nms_topk best survivors are kept, so the
        # greedy scan may exit once that many survive (exact, ~halves steps)
        keep = batched_nms_mask(
            b, s, i, nms_thresh, valid=v, stop_after=post_nms_topk
        )
        kv = jnp.where(keep, s, -jnp.inf)
        topv, topi = jax.lax.top_k(kv, min(post_nms_topk, kv.shape[0]))
        return b[topi], topv, i[topi], topv > -jnp.inf

    b, s, i, v = jax.vmap(_nms_one)(boxes, logits, ids, valid)
    # zero out invalid rows so downstream ops see benign boxes
    b = jnp.where(v[..., None], b, 0.0)
    s = jnp.where(v, s, 0.0)
    return Instances(v, proposal_boxes=b, objectness_logits=s, level_ids=i)


def find_top_rpn_proposals_group(
    proposals: Sequence[jnp.ndarray],  # per level(+branch) [B, Hi*Wi*A, 4]
    objectness_logits: Sequence[jnp.ndarray],
    image_sizes: jnp.ndarray,
    num_anchors: int,
    nms_thresh: float,
    pre_nms_topk: int,
    post_nms_topk: int,
    min_box_size: float,
    cpgs: jnp.ndarray | None = None,  # [B, C, H, W] class heatmaps
    cpg_labels: jnp.ndarray | None = None,  # [B, C]
    cpg_preds: jnp.ndarray | None = None,  # [B, C]
) -> Instances:
    """MRRP variant: top-k per (level, anchor) group; group id = level*1000+a.

    Each level tensor is laid out position-major with A anchors minor, so
    anchor a occupies indices ``a::A``. When ``cpgs`` is given, objectness is
    rescored with CSC contrast weights before selection (the reference keeps
    this hook dormant — no call site passes cpgs,
    ``proposal_utils.py:272-302``).
    """
    if cpgs is not None:
        from ..ops.csc import csc

        def rescore(logits_l, boxes_l):
            def one(b_logits, b_boxes, b_cpg, b_lab, b_pred):
                w = csc(b_cpg, b_lab, b_pred, b_boxes)  # [P, C]
                return b_logits * jnp.max(jnp.maximum(w, 0.0), axis=-1)

            return jax.vmap(one)(logits_l, boxes_l, cpgs, cpg_labels, cpg_preds)

        objectness_logits = [
            rescore(l, b) for l, b in zip(objectness_logits, proposals)
        ]
    grp_boxes, grp_logits, grp_ids = [], [], []
    for lvl, (boxes_l, logits_l) in enumerate(zip(proposals, objectness_logits)):
        b, n, _ = boxes_l.shape
        hw = n // num_anchors
        boxes_r = boxes_l.reshape(b, hw, num_anchors, 4)
        logits_r = logits_l.reshape(b, hw, num_anchors)
        for a in range(num_anchors):
            grp_boxes.append(boxes_r[:, :, a])
            grp_logits.append(logits_r[:, :, a])
            grp_ids.append(lvl * 1000 + a)
    per_group_k = max(1, math.ceil(pre_nms_topk / max(len(grp_ids), 1)))
    return find_top_rpn_proposals(
        grp_boxes,
        grp_logits,
        image_sizes,
        nms_thresh,
        per_group_k,
        post_nms_topk,
        min_box_size,
        group_ids=grp_ids,
    )


def add_ground_truth_to_proposals(gt: Instances, proposals: Instances) -> Instances:
    """Append gt boxes as proposals with logit ~ logit(1) (reference
    ``proposal_utils.py:366-432``)."""
    gt_logit = math.log((1.0 - 1e-10) / (1.0 - (1.0 - 1e-10)))
    gt_as_prop = Instances(
        gt.valid,
        proposal_boxes=gt.gt_boxes,
        objectness_logits=jnp.full(gt.valid.shape, gt_logit, jnp.float32),
        level_ids=jnp.zeros(gt.valid.shape, jnp.int32),
    )
    return cat_instances(proposals, gt_as_prop)
