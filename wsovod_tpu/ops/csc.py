"""CSC — Contextual Suppression/CPG scoring, batched jnp op.

Port of the native op in ``wsovod/layers/csc/csc_cuda.cu:98-554`` +
``wsovod/layers/csc.py:9-144``. Given per-class CPG heatmaps, image labels and
predictions, and ROIs, scores each (roi, class):

  ``score = sum(frame) / sqrt(area_frame) - sum(context) / sqrt(area_context)``

where frame = ROI minus the inner box (ROI / context_scale), context = outer
box (ROI * context_scale) minus ROI, sums come from an integral image of the
CPG binarized at ``fg_threshold`` (max_val fixed at 1.0 in the reference),
then per-class normalization to [-1, 1] (positives / max, negatives / -min;
degenerate cases -> all ones) and blending with the class prediction
confidence ``W = pred * W + (1 - pred)``. Classes with label < 0.5 keep W=1.

The integral image is two cumsums — pure XLA, no custom kernel needed. The
op is dormant in the shipped training path (its only call site passes no
CPGs, reference ``proposal_utils.py:272-302``) but is part of the public
surface.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def integral_image(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive 2D prefix sums over the last two dims."""
    return jnp.cumsum(jnp.cumsum(x, axis=-1), axis=-2)


def _box_sum(ii: jnp.ndarray, x1, y1, x2, y2) -> jnp.ndarray:
    """Sum over [y1, y2] x [x1, x2] (inclusive ints) from integral image."""
    h, w = ii.shape[-2], ii.shape[-1]

    def at(y, x, valid):
        y = jnp.clip(y, 0, h - 1)
        x = jnp.clip(x, 0, w - 1)
        return jnp.where(valid, ii[..., y, x], 0.0)

    a1 = at(y2, x2, True)
    a2 = at(y2, x1 - 1, x1 - 1 >= 0)
    a3 = at(y1 - 1, x2, y1 - 1 >= 0)
    a4 = at(y1 - 1, x1 - 1, (y1 - 1 >= 0) & (x1 - 1 >= 0))
    return a1 - a2 - a3 + a4


def _score_rois(ii, rois, h, w, area_sqrt, context_scale):
    """ii [H, W] integral image; rois [P, 4] XYXY -> [P] scores."""
    r = jnp.round(rois).astype(jnp.int32)
    x1 = jnp.clip(r[:, 0], 0, w - 1)
    y1 = jnp.clip(r[:, 1], 0, h - 1)
    x2 = jnp.clip(r[:, 2], 0, w - 1)
    y2 = jnp.clip(r[:, 3], 0, h - 1)

    wr = (x2 - x1).astype(jnp.float32)
    hr = (y2 - y1).astype(jnp.float32)
    cx = (x2 + x1).astype(jnp.float32) / 2.0
    cy = (y2 + y1).astype(jnp.float32) / 2.0

    def rnd(v):
        return jnp.round(v).astype(jnp.int32)

    xi1 = rnd(cx - wr / context_scale / 2.0)
    yi1 = rnd(cy - hr / context_scale / 2.0)
    xi2 = rnd(cx + wr / context_scale / 2.0)
    yi2 = rnd(cy + hr / context_scale / 2.0)
    xo1 = rnd(jnp.maximum(cx - wr * context_scale / 2.0, 0.0))
    yo1 = rnd(jnp.maximum(cy - hr * context_scale / 2.0, 0.0))
    xo2 = rnd(jnp.minimum(cx + wr * context_scale / 2.0, w - 1.0))
    yo2 = rnd(jnp.minimum(cy + hr * context_scale / 2.0, h - 1.0))

    area_roi = (y2 - y1 + 1) * (x2 - x1 + 1)
    area_inner = (yi2 - yi1 + 1) * (xi2 - xi1 + 1)
    area_outer = (yo2 - yo1 + 1) * (xo2 - xo1 + 1)
    area_frame = jnp.maximum(area_roi - area_inner, 1).astype(jnp.float32)
    area_ctx = jnp.maximum(area_outer - area_roi, 1).astype(jnp.float32)

    sum_fn = jax.vmap(lambda a, b, c, d: _box_sum(ii, a, b, c, d))
    s_roi = sum_fn(x1, y1, x2, y2)
    s_inner = sum_fn(xi1, yi1, xi2, yi2)
    s_outer = sum_fn(xo1, yo1, xo2, yo2)

    sum_frame = s_roi - s_inner
    sum_ctx = s_outer - s_roi
    if area_sqrt:
        return sum_frame / jnp.sqrt(area_frame) - sum_ctx / jnp.sqrt(area_ctx)
    return sum_frame / area_frame - sum_ctx / area_ctx


def _normalize_and_blend(scores, label, pred, roi_valid):
    """Per-class [-1, 1] normalization + confidence blend (cuda host loop)."""
    s = jnp.where(roi_valid, scores, 0.0)
    max_v = jnp.maximum(jnp.max(s), 0.0)
    min_v = jnp.minimum(jnp.min(s), 0.0)

    both = (max_v > 0) & (min_v < 0)
    pos_only = (max_v > 0) & (min_v == 0)

    norm_both = jnp.where(scores > 0, scores / jnp.where(max_v > 0, max_v, 1.0),
                          scores / jnp.where(min_v < 0, -min_v, 1.0))
    norm_pos = scores / jnp.where(max_v > 0, max_v, 1.0)
    w = jnp.where(both, norm_both, jnp.where(pos_only, norm_pos, 1.0))
    w = pred * w + (1.0 - pred)
    return jnp.where(label >= 0.5, w, 1.0)


@partial(jax.jit, static_argnames=("fg_threshold", "area_sqrt", "context_scale"))
def csc(
    cpgs: jnp.ndarray,  # [C, H, W] per-class heatmaps (one image)
    labels: jnp.ndarray,  # [C] image-level labels
    preds: jnp.ndarray,  # [C] image-level predictions
    rois: jnp.ndarray,  # [P, 4] XYXY image coords
    roi_valid: jnp.ndarray | None = None,  # [P]
    fg_threshold: float = 0.1,
    area_sqrt: bool = True,
    context_scale: float = 1.8,
) -> jnp.ndarray:
    """Returns W [P, C] roi-class weights."""
    c, h, w = cpgs.shape
    p = rois.shape[0]
    if roi_valid is None:
        roi_valid = jnp.ones((p,), bool)

    binary = (cpgs >= fg_threshold).astype(jnp.float32)
    ii = integral_image(binary)  # [C, H, W]

    def per_class(ii_c, label, pred):
        scores = _score_rois(ii_c, rois, h, w, area_sqrt, context_scale)
        return _normalize_and_blend(scores, label, pred, roi_valid)

    w_cls = jax.vmap(per_class)(ii, labels, preds)  # [C, P]
    return w_cls.T


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def csc_constraint(x: jnp.ndarray, w: jnp.ndarray, polar: bool = True):
    """Clamp-mask multiply with straight-through-ish backward
    (``csc.py:102-131``): dX = dY * W_ — W treated as constant."""
    w_ = jnp.maximum(w, 0.0) if polar else -jnp.minimum(w, 0.0)
    return x * w_


def _cc_fwd(x, w, polar):
    w_ = jnp.maximum(w, 0.0) if polar else -jnp.minimum(w, 0.0)
    return x * w_, w_


def _cc_bwd(polar, w_, dy):
    return (dy * w_, jnp.zeros_like(w_))


csc_constraint.defvjp(_cc_fwd, _cc_bwd)
