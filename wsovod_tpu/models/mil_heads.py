"""Multiple-instance-learning output layers: object mining + instance
refinement — the WSOVOD core.

Reference ``wsovod/modeling/roi_heads/fast_rcnn_open_vocabulary.py:220-1058``.
Everything here is batched over images with a proposal validity mask —
the reference's per-image ragged lists and ``.split(num_per_image)`` become
``[B, P, ...]`` tensors with masked softmaxes:

* Object mining (WSDDN): ``scores = softmax_cls(dim=classes) *
  softmax_det(dim=proposals-within-image)``; image-level class logits are the
  per-image sum of proposal scores, clamped to [1e-6, 1-1e-6], trained with
  BCE against the image-level one-hot labels (the ONLY supervision).
  The proposal softmax masks padded rows with -inf so image sums match the
  reference's ragged semantics exactly.
* Instance refinement head k: class scores from an OpenVocabularyClassifier
  (C+1 with background), optional class-agnostic box deltas; weighted CE with
  -1 ignore labels, normalized by the sum of valid weights; box loss
  ``smooth_l1_weighted`` on foreground rows.
* K-head inference: mean softmax and mean deltas over the K refinement heads
  (``predict_probs_K`` / ``predict_boxes_K``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..structures.boxes import apply_deltas, get_deltas
from .class_heads import OpenVocabularyClassifier

NEG_INF = -1e30


def masked_softmax(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Softmax over ``axis`` treating ``mask==False`` entries as -inf."""
    x = jnp.where(mask, x, NEG_INF)
    x = x - jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x) * mask.astype(x.dtype)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-12)


class ObjectMiningOutputLayers(nn.Module):
    """WSDDN-style object-mining head (reference ``fast_rcnn...:220-618``)."""

    num_classes: int
    mean_loss: bool = True
    loss_weight: float = 1.0
    context: bool = False  # ContextLocNet variant for ROILoopPool inputs
    dtype: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, P, F]; if context: stacked (roi, frame, ctx) [3, B, P, F]
        valid: jnp.ndarray,  # [B, P] bool
    ) -> jnp.ndarray:
        """Returns MIL scores [B, P, C] (padded rows are exactly 0)."""
        if self.context:
            roi, frame, ctx = x[0], x[1], x[2]
            c_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="cls")(roi)
            det = nn.Dense(self.num_classes, dtype=self.dtype, name="det")
            d_logits = det(frame) - det(ctx)
        else:
            c_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="cls")(x)
            d_logits = nn.Dense(self.num_classes, dtype=self.dtype, name="det")(x)

        if self.num_classes == 1:
            # reference appends a zero column before the softmaxes
            c_logits = jnp.concatenate([c_logits, jnp.zeros_like(c_logits)], axis=-1)
            d_logits = jnp.concatenate([d_logits, jnp.zeros_like(d_logits)], axis=-1)

        c_sm = nn.softmax(c_logits.astype(jnp.float32), axis=-1)
        d_sm = masked_softmax(d_logits.astype(jnp.float32), valid[..., None], axis=1)
        scores = c_sm * d_sm

        if self.num_classes == 1:
            scores = scores[..., :1]
        return scores * valid[..., None].astype(scores.dtype)

    def predict_probs_img(self, scores: jnp.ndarray) -> jnp.ndarray:
        """Image-level class logits: clamp(sum_p scores, 1e-6, 1-1e-6). [B, C]."""
        s = jnp.sum(scores, axis=1)
        return jnp.clip(s, 1e-6, 1.0 - 1e-6)

    def losses(
        self, scores: jnp.ndarray, gt_classes_img_oh: jnp.ndarray
    ) -> dict:
        """BCE of image-level scores vs the one-hot image labels.

        ``mean_loss=True`` -> mean over all B*C elements (torch
        ``binary_cross_entropy(reduction='mean')``); else sum / B.
        """
        p = self.predict_probs_img(scores).astype(jnp.float32)
        t = gt_classes_img_oh.astype(jnp.float32)
        bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
        if self.mean_loss:
            loss = jnp.mean(bce)
        else:
            loss = jnp.sum(bce) / p.shape[0]
        return {"loss_cls_object_mining": loss * self.loss_weight}


class InstanceRefinementOutputLayers(nn.Module):
    """Refinement head k (reference ``fast_rcnn...:621-1058``)."""

    num_classes: int
    refine_k: int = 0
    refine_reg: bool = False
    cross_entropy_weighted: bool = True
    loss_weight: float = 1.0
    box_reg_loss_weight: float = 1.0
    box_reg_loss_type: str = "smooth_l1_weighted"
    smooth_l1_beta: float = 0.0
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    # OV classifier config
    weight_dim: int = 512
    use_bias: float = 0.0
    norm_weight: bool = True
    norm_temperature: float = 50.0
    random_weight: bool = False
    dtype: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, P, F]
        classifier: Optional[jnp.ndarray] = None,  # [C', D] runtime classifier
        append_background: bool = True,
        embeddings: Optional[jnp.ndarray] = None,  # [C, D] stored default
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (scores [B, P, C(+1)], deltas [B, P, 4])."""
        scores = OpenVocabularyClassifier(
            num_classes=self.num_classes,
            weight_dim=self.weight_dim,
            use_bias=self.use_bias,
            norm_weight=self.norm_weight,
            norm_temperature=self.norm_temperature,
            random_weight=self.random_weight,
            dtype=self.dtype,
            name="cls",
        )(x, classifier=classifier, append_background=append_background, embeddings=embeddings)
        if self.refine_reg:
            deltas = nn.Dense(
                4,
                kernel_init=nn.initializers.normal(0.001),
                bias_init=nn.initializers.zeros,
                name="bbox_pred",
            )(x)
        else:
            deltas = jnp.zeros(x.shape[:-1] + (4,), scores.dtype)
        return scores, deltas

    # ------------------------------------------------------------- losses
    def losses(
        self,
        scores: jnp.ndarray,  # [B, P, C+1]
        deltas: jnp.ndarray,  # [B, P, 4]
        proposal_boxes: jnp.ndarray,  # [B, P, 4]
        gt_classes: jnp.ndarray,  # [B, P] int32; -1 = ignore; C = background
        gt_boxes: jnp.ndarray,  # [B, P, 4] matched pseudo-GT boxes
        gt_weights: jnp.ndarray,  # [B, P] float
        valid: jnp.ndarray,  # [B, P] proposal validity
        num_classes: Optional[int] = None,
    ) -> dict:
        c = num_classes if num_classes is not None else self.num_classes
        k = self.refine_k
        scores = scores.astype(jnp.float32)

        ignore = (gt_classes < 0) | (~valid)
        weights = jnp.where(ignore, 0.0, gt_weights.astype(jnp.float32))
        valid_w = (weights > 1e-12).astype(jnp.float32)

        # weighted CE with ignore
        num_cols = scores.shape[-1]
        tgt = jnp.clip(gt_classes, 0, num_cols - 1)
        logp = nn.log_softmax(scores, axis=-1)
        ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        ce = jnp.where(ignore, 0.0, ce)
        if self.cross_entropy_weighted:
            loss_cls = jnp.sum(ce * weights) / jnp.maximum(jnp.sum(valid_w), 1.0)
        else:
            keep = (~ignore).astype(jnp.float32)
            loss_cls = jnp.sum(ce * keep) / jnp.maximum(jnp.sum(keep), 1.0)

        out = {f"loss_cls_r{k}": loss_cls * self.loss_weight}
        if not self.refine_reg:
            return out

        # class-agnostic box regression on foreground rows
        fg = (~ignore) & (gt_classes >= 0) & (gt_classes < c) & valid
        fg_f = fg.astype(jnp.float32)
        gt_deltas = get_deltas(proposal_boxes, gt_boxes, weights=self.bbox_reg_weights)
        gt_deltas = jnp.nan_to_num(gt_deltas, nan=0.0, posinf=0.0, neginf=0.0)
        diff = jnp.abs(deltas.astype(jnp.float32) - gt_deltas)
        if self.smooth_l1_beta > 1e-12:
            l1 = jnp.where(
                diff < self.smooth_l1_beta,
                0.5 * diff * diff / self.smooth_l1_beta,
                diff - 0.5 * self.smooth_l1_beta,
            )
        else:
            l1 = diff
        if self.box_reg_loss_type in ("giou", "diou", "ciou"):
            # decode predicted boxes and penalise 1 - gIoU on foreground rows
            # (reference supports giou/diou/ciou; giou implemented, the d/c
            # variants fall back to giou)
            from ..structures.boxes import giou as _giou

            pred_boxes = apply_deltas(
                deltas.astype(jnp.float32), proposal_boxes, weights=self.bbox_reg_weights
            )
            g = 1.0 - _giou(pred_boxes, gt_boxes)
            loss_reg = jnp.sum(g * fg_f)
        else:
            if self.box_reg_loss_type == "smooth_l1_weighted":
                l1 = l1 * weights[..., None]
            elif self.box_reg_loss_type != "smooth_l1":
                raise NotImplementedError(self.box_reg_loss_type)
            loss_reg = jnp.sum(l1 * fg_f[..., None])
        # normalized by total rows R per image batch (reference divides by
        # gt_classes.numel(), the flattened count across the batch)
        total = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        out[f"loss_box_reg_r{k}"] = loss_reg / total * self.box_reg_loss_weight
        return out


def predict_probs_K(scores_list) -> jnp.ndarray:
    """Mean softmax over the K refinement heads. [B, P, C+1]."""
    probs = None
    for s in scores_list:
        p = nn.softmax(s.astype(jnp.float32), axis=-1)
        probs = p if probs is None else probs + p
    return probs / len(scores_list)


def predict_boxes_K(deltas_list, proposal_boxes, bbox_reg_weights) -> jnp.ndarray:
    """Mean deltas over K heads applied to the proposal boxes. [B, P, 4]."""
    d = None
    for dk in deltas_list:
        d = dk.astype(jnp.float32) if d is None else d + dk.astype(jnp.float32)
    d = d / len(deltas_list)
    return apply_deltas(d, proposal_boxes, weights=bbox_reg_weights)
