"""GeneralizedRCNN_WSOVOD meta-architecture.

Reference ``wsovod/modeling/meta_arch/rcnn_wsovod.py:28-344``. One functional
module: normalize -> backbone -> RPN -> objectness ramp -> fuse SAM proposals
-> data-aware head -> ROI heads; the RPN losses are computed afterwards from
the ROI heads' mined pseudo GT (deferred-loss dance, reference :222-225, here
explicit dataflow through ``RPNAux``).

Batch convention (all padded, static shapes):
  images        [B, H, W, 3] raw pixels (BGR to match the reference stats)
  image_sizes   [B, 2] true (h, w)
  sam_boxes     [B, S, 4], sam_scores [B, S], sam_valid [B, S]
  gt_classes    [B, G], gt_valid [B, G]  (image-level supervision source)

Objectness ramp (reference :180-184,269-271): during training RPN proposal
scores are ``sigmoid(logits) * (iter / max_iter)``; at test plain sigmoid.
SAM proposals keep their own scores; when MRRP is on they are routed to
random branches via random ``level_ids`` (reference :185-204).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..structures.instances import Instances, cat_instances
from .class_heads import DataAwareFeaturesHead, build_data_aware_head
from .fast_rcnn_inference import Detections
from .roi_heads import WSOVODROIHeads, build_roi_heads
from .rpn import WSOVODRPN_V2, build_proposal_generator


class GeneralizedRCNN_WSOVOD(nn.Module):
    backbone: nn.Module
    proposal_generator: Optional[WSOVODRPN_V2]
    roi_heads: WSOVODROIHeads
    data_aware_head: Optional[DataAwareFeaturesHead]
    pixel_mean: Tuple[float, ...] = (102.9801, 115.9465, 122.7717)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    max_iter: int = 200000
    proposal_pad: int = 4096  # SAM proposals per image after padding
    compute_dtype: str = "float32"
    in_feature: str = "res5"
    # FREEZE_AT >= 5 freezes the whole backbone in every shipped config;
    # stop_gradient here lets XLA drop the entire backbone backward pass
    # (the optimizer already zeroes those updates — this saves the compute
    # and activation memory too).
    freeze_backbone: bool = False

    def _normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        x = (images - mean) / std
        return x.astype(jnp.dtype(self.compute_dtype))

    def _proposals(
        self,
        features: Dict[str, jnp.ndarray],
        batch: Dict[str, jnp.ndarray],
        train: bool,
        iteration: Optional[jnp.ndarray],
        rng: Optional[jax.Array],
    ):
        """RPN proposals (ramped) fused with loaded SAM proposals."""
        b = batch["images"].shape[0]
        rpn_aux = None
        parts = []
        if self.proposal_generator is not None:
            rpn_proposals, rpn_aux = self.proposal_generator(
                features, batch["image_sizes"], train=train
            )
            logits = rpn_proposals.objectness_logits
            score = jax.nn.sigmoid(logits)
            if train:
                ramp = (
                    jnp.asarray(iteration, jnp.float32) / float(self.max_iter)
                    if iteration is not None
                    else 1.0
                )
                score = score * ramp
            score = jnp.where(rpn_proposals.valid, score, 0.0)
            parts.append(rpn_proposals.replace(objectness_logits=score))

        if "sam_boxes" in batch and batch["sam_boxes"] is not None:
            sam_valid = batch["sam_valid"]
            if self.proposal_generator is not None and self.roi_heads.mrrp_on:
                n_groups = self.roi_heads.mrrp_num_branch
                lk = (
                    jax.random.randint(rng, sam_valid.shape, 0, n_groups) * 1000
                    if rng is not None
                    else jnp.zeros(sam_valid.shape, jnp.int32)
                )
            else:
                lk = jnp.zeros(sam_valid.shape, jnp.int32)
            sam = Instances(
                sam_valid,
                proposal_boxes=batch["sam_boxes"],
                objectness_logits=jnp.where(sam_valid, batch["sam_scores"], 0.0),
                level_ids=lk,
            )
            parts.append(sam)

        assert parts, "need an RPN or loaded proposals"
        proposals = parts[0] if len(parts) == 1 else cat_instances(*parts)
        return proposals, rpn_aux

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        train: bool = False,
        iteration: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        embeddings: Optional[jnp.ndarray] = None,  # [C, D] train classifier
        classifier: Optional[jnp.ndarray] = None,  # [C', D] runtime override
        append_background: bool = True,
        return_proposals: bool = False,  # inference: also return proposal set
    ):
        images = self._normalize(batch["images"])
        features = self.backbone(images, train=train)
        if self.freeze_backbone and train:
            features = jax.tree_util.tree_map(jax.lax.stop_gradient, features)

        if rng is not None:
            rng, rng_sam, rng_roi = jax.random.split(rng, 3)
        else:
            rng_sam = rng_roi = None

        proposals, rpn_aux = self._proposals(features, batch, train, iteration, rng_sam)

        daf = None
        if self.data_aware_head is not None:
            feat = features[self.in_feature]
            stride_h = batch["images"].shape[1] // feat.shape[1]
            pixel_valid = None
            if "image_sizes" in batch:
                sizes = batch["image_sizes"] // max(stride_h, 1)
                h_idx = jnp.arange(feat.shape[1])[None, :, None]
                w_idx = jnp.arange(feat.shape[2])[None, None, :]
                b = batch["images"].shape[0]
                pixel_valid = (h_idx < sizes[:b, 0, None, None]) & (
                    w_idx < sizes[:b, 1, None, None]
                )
            daf = self.data_aware_head(feat, pixel_valid=pixel_valid)

        if train:
            out = self.roi_heads(
                features,
                proposals,
                batch["gt_classes"],
                batch["gt_valid"],
                data_aware_features=daf,
                classifier=classifier,
                embeddings=embeddings,
                append_background=append_background,
                rng=rng_roi,
                sam_embed=batch.get("sam_embed"),
                sam_scale=batch.get("sam_scale"),
            )
            losses = dict(out.losses)
            if self.proposal_generator is not None and out.proposal_targets is not None:
                rng, rng_rpn = jax.random.split(rng) if rng is not None else (None, jax.random.PRNGKey(0))
                pt = out.proposal_targets
                rpn_losses = self.proposal_generator.losses(
                    rpn_aux, pt.boxes, pt.valid, rng_rpn
                )
                losses.update(rpn_losses)
            return losses

        detections, all_scores, all_boxes = self.roi_heads.inference(
            features,
            proposals,
            batch["image_sizes"],
            data_aware_features=daf,
            classifier=classifier,
            embeddings=embeddings,
            append_background=append_background,
        )
        if return_proposals:
            # the post-NMS proposal set the ROI heads consumed, for the
            # evaluator's proposal-recall branch (reference
            # coco_evaluation.py:172-173 collects output["proposals"])
            return detections, all_scores, all_boxes, (
                proposals.proposal_boxes,
                proposals.objectness_logits,
                proposals.valid,
            )
        return detections, all_scores, all_boxes


class GeneralizedRCNN_WSOVOD_MixedDatasets(GeneralizedRCNN_WSOVOD):
    """Mixed-dataset meta-arch (reference
    ``wsovod/modeling/meta_arch/rcnn_wsovod_mixed_datasets.py:28-367``):
    homogeneous per-dataset batches select the per-dataset classifier and the
    per-dataset mining head via a STATIC ``source_id`` (one compiled program
    per dataset, matching each dataset's class-count shapes)."""

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        train: bool = False,
        iteration: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        embeddings: Optional[jnp.ndarray] = None,  # this dataset's C_i x D matrix
        classifier: Optional[jnp.ndarray] = None,
        append_background: bool = True,
        source_id: int = 0,
        return_proposals: bool = False,
    ):
        images = self._normalize(batch["images"])
        features = self.backbone(images, train=train)
        if self.freeze_backbone and train:
            features = jax.tree_util.tree_map(jax.lax.stop_gradient, features)
        if rng is not None:
            rng, rng_sam, rng_roi = jax.random.split(rng, 3)
        else:
            rng_sam = rng_roi = None
        proposals, rpn_aux = self._proposals(features, batch, train, iteration, rng_sam)

        daf = None
        if self.data_aware_head is not None:
            feat = features[self.in_feature]
            daf = self.data_aware_head(feat)

        if train:
            out = self.roi_heads(
                features,
                proposals,
                batch["gt_classes"],
                batch["gt_valid"],
                source_id=source_id,
                data_aware_features=daf,
                classifier=embeddings,
                append_background=append_background,
                rng=rng_roi,
                sam_embed=batch.get("sam_embed"),
                sam_scale=batch.get("sam_scale"),
            )
            losses = dict(out.losses)
            if self.proposal_generator is not None and out.proposal_targets is not None:
                rng, rng_rpn = (
                    jax.random.split(rng) if rng is not None else (None, jax.random.PRNGKey(0))
                )
                pt = out.proposal_targets
                losses.update(
                    self.proposal_generator.losses(rpn_aux, pt.boxes, pt.valid, rng_rpn)
                )
            return losses

        detections, all_scores, all_boxes = self.roi_heads.inference(
            features,
            proposals,
            batch["image_sizes"],
            data_aware_features=daf,
            classifier=classifier,
            embeddings=embeddings,
            append_background=append_background,
        )
        if return_proposals:
            return detections, all_scores, all_boxes, (
                proposals.proposal_boxes,
                proposals.objectness_logits,
                proposals.valid,
            )
        return detections, all_scores, all_boxes


def postprocess_detections(
    det: Detections, image_sizes, output_sizes
) -> Detections:
    """Rescale detections from network input size to the original image size
    (reference ``postprocessing.py:8-82``): scale boxes by orig/input ratio
    and clip."""
    scale = (
        jnp.asarray(output_sizes, jnp.float32)
        / jnp.maximum(jnp.asarray(image_sizes, jnp.float32), 1.0)
    )  # [B, 2] (h_ratio, w_ratio)
    sy = scale[:, 0][:, None]
    sx = scale[:, 1][:, None]
    boxes = det.boxes * jnp.stack([sx, sy, sx, sy], axis=-1)
    h = jnp.asarray(output_sizes, jnp.float32)[:, 0][:, None]
    w = jnp.asarray(output_sizes, jnp.float32)[:, 1][:, None]
    boxes = jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )
    return det._replace(boxes=boxes)


def build_model(cfg):
    """Explicit model builder (replaces d2 META_ARCH_REGISTRY)."""
    from .backbones import build_backbone

    backbone = build_backbone(cfg)
    strides = list(backbone.output_strides().values())
    proposal_generator = build_proposal_generator(cfg, strides)
    from .poolers import build_pooler

    pooler = build_pooler(cfg, strides)
    mixed = cfg.MODEL.META_ARCHITECTURE == "GeneralizedRCNN_WSOVOD_MixedDatasets"
    if mixed:
        from .roi_heads_mixed import build_mixed_roi_heads

        roi_heads = build_mixed_roi_heads(cfg, pooler)
    else:
        roi_heads = build_roi_heads(cfg, pooler)
    data_aware = (
        build_data_aware_head(cfg)
        if cfg.MODEL.ROI_BOX_HEAD.OPEN_VOCABULARY.DATA_AWARE
        else None
    )
    arch = GeneralizedRCNN_WSOVOD_MixedDatasets if mixed else GeneralizedRCNN_WSOVOD
    return arch(
        backbone=backbone,
        proposal_generator=proposal_generator,
        roi_heads=roi_heads,
        data_aware_head=data_aware,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        max_iter=cfg.SOLVER.MAX_ITER,
        proposal_pad=cfg.TPU.PROPOSAL_PAD,
        compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        in_feature=cfg.MODEL.ROI_HEADS.IN_FEATURES[0],
        freeze_backbone=cfg.MODEL.BACKBONE.FREEZE_AT >= 5,
    )
