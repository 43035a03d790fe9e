"""Box operations as pure JAX functions over ``[..., 4]`` XYXY arrays.

TPU-native replacement for detectron2's ``Boxes`` object methods and WSOVOD's
box utilities (reference ``wsovod/modeling/roi_heads/roi_heads.py:39-78``
``pairwise_iou_wsl``). Boxes are plain arrays — no wrapper class — so they
compose with vmap/jit/shard_map. All ops are static-shape and mask-friendly:
padded (invalid) boxes are conventionally all-zero rows, which have zero area
and never win an IoU match.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of XYXY boxes. [..., 4] -> [...]."""
    wh = jnp.maximum(boxes[..., 2:4] - boxes[..., 0:2], 0.0)
    return wh[..., 0] * wh[..., 1]


def clip_boxes(boxes: jnp.ndarray, image_size) -> jnp.ndarray:
    """Clip boxes to ``(h, w)``. ``image_size`` may be a tuple or [..., 2] array (h, w)."""
    if isinstance(image_size, (tuple, list)):
        h, w = image_size
    else:
        h = image_size[..., 0:1]
        w = image_size[..., 1:2]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_boxes(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Mask of boxes with both sides > threshold. [..., 4] -> [...] bool."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def box_centers(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 0:2] + boxes[..., 2:4]) * 0.5


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas of all N x M pairs. [N,4],[M,4] -> [N,M]."""
    lt = jnp.maximum(boxes1[:, None, 0:2], boxes2[None, :, 0:2])
    rb = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU of all N x M pairs. Zero where union is empty. [N,4],[M,4] -> [N,M]."""
    inter = pairwise_intersection(boxes1, boxes2)
    area1 = box_area(boxes1)[:, None]
    area2 = box_area(boxes2)[None, :]
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_ioa(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection over the area of boxes2 (d2 `pairwise_ioa`). [N,M]."""
    inter = pairwise_intersection(boxes1, boxes2)
    area2 = box_area(boxes2)[None, :]
    return jnp.where(area2 > 0, inter / jnp.where(area2 > 0, area2, 1.0), 0.0)


def pairwise_iou_wsl(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Signed inner/outer box ratio used by WSOVOD's WSL matcher.

    Semantics per reference ``roi_heads.py:39-78``: for each pair, ``outer`` is
    the area of the smallest enclosing box, ``inter`` is |dx|*|dy| of the
    inner (overlap) extents; the ratio is positive when boxes truly overlap in
    both axes and negative otherwise — a repulsion signal for disjoint pairs.
    """
    outer_wh = jnp.abs(
        jnp.maximum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
        - jnp.minimum(boxes1[:, None, 0:2], boxes2[None, :, 0:2])
    )
    inner_wh = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4]) - jnp.maximum(
        boxes1[:, None, 0:2], boxes2[None, :, 0:2]
    )
    outer = outer_wh[..., 0] * outer_wh[..., 1]
    # sign: +1 only if strictly positive overlap along BOTH axes, else -1.
    # (zero-extent overlap along an axis contributes factor 0 -> sign -1,
    # matching the reference's `sign[sign == 0] = -1`.)
    pos = (inner_wh[..., 0] > 0) & (inner_wh[..., 1] > 0)
    sign = jnp.where(pos, 1.0, -1.0)
    inter = jnp.abs(inner_wh[..., 0]) * jnp.abs(inner_wh[..., 1])
    return jnp.where(outer > 0, inter / jnp.where(outer > 0, outer, 1.0) * sign, 0.0)


def matched_pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Element-wise IoU of matched box pairs. [N,4],[N,4] -> [N]."""
    lt = jnp.maximum(boxes1[..., 0:2], boxes2[..., 0:2])
    rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


# ---------------------------------------------------------------------------
# Box <-> delta transforms (d2 Box2BoxTransform / Box2BoxTransformLinear)
# ---------------------------------------------------------------------------

import math

_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


def get_deltas(
    src_boxes: jnp.ndarray,
    target_boxes: jnp.ndarray,
    weights=(1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Faster-R-CNN (dx, dy, dw, dh) deltas mapping src -> target."""
    src_w = src_boxes[..., 2] - src_boxes[..., 0]
    src_h = src_boxes[..., 3] - src_boxes[..., 1]
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h
    tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
    tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

    wx, wy, ww, wh = weights
    safe_w = jnp.where(src_w > 0, src_w, 1.0)
    safe_h = jnp.where(src_h > 0, src_h, 1.0)
    dx = wx * (tgt_cx - src_cx) / safe_w
    dy = wy * (tgt_cy - src_cy) / safe_h
    dw = ww * jnp.log(jnp.maximum(tgt_w, 1e-8) / safe_w)
    dh = wh * jnp.log(jnp.maximum(tgt_h, 1e-8) / safe_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(
    deltas: jnp.ndarray,
    boxes: jnp.ndarray,
    weights=(1.0, 1.0, 1.0, 1.0),
    scale_clamp: float = _DEFAULT_SCALE_CLAMP,
) -> jnp.ndarray:
    """Apply (dx, dy, dw, dh) deltas to boxes.

    ``deltas`` may be [..., K*4] for K classes; boxes are broadcast per class.
    """
    orig_shape = deltas.shape
    k4 = orig_shape[-1]
    assert k4 % 4 == 0, f"deltas last dim {k4} not divisible by 4"
    d = deltas.reshape(orig_shape[:-1] + (k4 // 4, 4))

    w = (boxes[..., 2] - boxes[..., 0])[..., None]
    h = (boxes[..., 3] - boxes[..., 1])[..., None]
    cx = boxes[..., 0][..., None] + 0.5 * w[..., 0][..., None]
    cy = boxes[..., 1][..., None] + 0.5 * h[..., 0][..., None]

    wx, wy, ww, wh = weights
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, scale_clamp)
    dh = jnp.minimum(d[..., 3] / wh, scale_clamp)

    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(orig_shape)


def get_deltas_linear(
    src_boxes: jnp.ndarray, target_boxes: jnp.ndarray, normalize_by_size: bool = True
) -> jnp.ndarray:
    """d2 ``Box2BoxTransformLinear``: (left, top, right, bottom) distances from
    the source box center to the target box sides, optionally normalized by the
    source box size. Used by the anchor-free WSOVODRPN head."""
    src_cx = 0.5 * (src_boxes[..., 0] + src_boxes[..., 2])
    src_cy = 0.5 * (src_boxes[..., 1] + src_boxes[..., 3])
    l = src_cx - target_boxes[..., 0]
    t = src_cy - target_boxes[..., 1]
    r = target_boxes[..., 2] - src_cx
    b = target_boxes[..., 3] - src_cy
    deltas = jnp.stack([l, t, r, b], axis=-1)
    if normalize_by_size:
        w = (src_boxes[..., 2] - src_boxes[..., 0])[..., None]
        h = (src_boxes[..., 3] - src_boxes[..., 1])[..., None]
        stride = jnp.concatenate([w, h, w, h], axis=-1)
        deltas = deltas / jnp.where(stride > 0, stride, 1.0)
    return deltas


def apply_deltas_linear(
    deltas: jnp.ndarray, boxes: jnp.ndarray, normalize_by_size: bool = True
) -> jnp.ndarray:
    """Inverse of :func:`get_deltas_linear` (deltas are relu'd as in d2)."""
    d = jnp.maximum(deltas, 0.0)
    if normalize_by_size:
        w = (boxes[..., 2] - boxes[..., 0])[..., None]
        h = (boxes[..., 3] - boxes[..., 1])[..., None]
        stride = jnp.concatenate([w, h, w, h], axis=-1)
        d = d * stride
    cx = 0.5 * (boxes[..., 0] + boxes[..., 2])
    cy = 0.5 * (boxes[..., 1] + boxes[..., 3])
    return jnp.stack(
        [cx - d[..., 0], cy - d[..., 1], cx + d[..., 2], cy + d[..., 3]], axis=-1
    )


def scale_boxes(boxes: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    return boxes * jnp.stack(
        [
            jnp.asarray(scale_x),
            jnp.asarray(scale_y),
            jnp.asarray(scale_x),
            jnp.asarray(scale_y),
        ]
    )


def expand_boxes(boxes: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """Scale each box about its own center by ``ratio`` (SAM prompt expansion)."""
    c = box_centers(boxes)
    half_wh = (boxes[..., 2:4] - boxes[..., 0:2]) * 0.5 * ratio
    return jnp.concatenate([c - half_wh, c + half_wh], axis=-1)


def giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Element-wise generalized IoU of matched pairs [..., 4] -> [...]."""
    iou = matched_pairwise_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., 0:2], boxes2[..., 0:2])
    rb = jnp.maximum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    enclose = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(boxes1[..., 0:2], boxes2[..., 0:2])
    inter_rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    inter_wh = jnp.maximum(inter_rb - inter_lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return iou - jnp.where(enclose > 0, (enclose - union) / jnp.where(enclose > 0, enclose, 1.0), 0.0)
