"""Detection production: masked, static-shape fast_rcnn_inference.

Reference ``wsovod/modeling/roi_heads/fast_rcnn_open_vocabulary.py:52-217``:
drop the background column, clip boxes, keep (proposal, class) pairs with
score > thresh, class-wise NMS, global top-k. The reference materialises a
ragged R' x 2 index list; here everything is fixed-size:

* per class, the top ``per_class_topk`` scoring proposals are NMS candidates
  (an exactness knob: candidates below that rank can only enter the final
  top-k in degenerate cases);
* NMS runs per class in a single vmapped batch (classes never interact in
  ``batched_nms``, so per-class NMS is exactly equivalent);
* survivors across all classes compete for the global ``topk_per_image``.

Returns padded ``[topk]`` detections with a validity mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.nms import nms_mask
from ..structures.boxes import clip_boxes


class Detections(NamedTuple):
    boxes: jnp.ndarray  # [B, K, 4]
    scores: jnp.ndarray  # [B, K]
    classes: jnp.ndarray  # [B, K] int32
    valid: jnp.ndarray  # [B, K] bool
    pred_inds: jnp.ndarray  # [B, K] int32 index into the input proposals


def _single_image(
    boxes, scores, valid, image_size, score_thresh, nms_thresh, topk, per_class_topk
):
    p, c1 = scores.shape
    c = c1 - 1
    cls_scores = scores[:, :c]  # drop background column
    boxes = clip_boxes(boxes, (image_size[0], image_size[1]))

    finite = jnp.all(jnp.isfinite(boxes), axis=-1) & jnp.all(
        jnp.isfinite(scores), axis=-1
    )
    ok = valid & finite  # [P]

    m = min(per_class_topk, p)
    # [C, P] -> top-M proposals per class
    s_t = jnp.where(ok[None, :], cls_scores.T, -jnp.inf)
    top_s, top_i = jax.lax.top_k(s_t, m)  # [C, M]
    cand_boxes = boxes[top_i]  # [C, M, 4]
    cand_ok = top_s > score_thresh  # [C, M] (also kills -inf padding)

    keep = jax.vmap(lambda b, s, v: nms_mask(b, s, nms_thresh, valid=v))(
        cand_boxes, top_s, cand_ok
    )  # [C, M]

    flat_scores = jnp.where(keep, top_s, -jnp.inf).reshape(-1)  # [C*M]
    flat_boxes = cand_boxes.reshape(-1, 4)
    flat_cls = jnp.repeat(jnp.arange(c, dtype=jnp.int32), m)
    flat_inds = top_i.reshape(-1).astype(jnp.int32)

    k = min(topk, c * m)
    best_s, best_i = jax.lax.top_k(flat_scores, k)
    return (
        flat_boxes[best_i],
        best_s,
        flat_cls[best_i],
        best_s > -jnp.inf,
        flat_inds[best_i],
    )


@partial(
    jax.jit,
    static_argnames=("score_thresh", "nms_thresh", "topk_per_image", "per_class_topk"),
)
def fast_rcnn_inference_batched(
    boxes: jnp.ndarray,  # [B, P, 4] class-agnostic predicted boxes
    scores: jnp.ndarray,  # [B, P, C+1] probabilities (bg last)
    valid: jnp.ndarray,  # [B, P]
    image_sizes: jnp.ndarray,  # [B, 2] (h, w)
    score_thresh: float = 1e-5,
    nms_thresh: float = 0.3,
    topk_per_image: int = 100,
    per_class_topk: int = 256,
) -> Detections:
    out = jax.vmap(
        lambda b, s, v, sz: _single_image(
            b, s, v, sz, score_thresh, nms_thresh, topk_per_image, per_class_topk
        )
    )(boxes, scores, valid, image_sizes)
    return Detections(*out)
