"""Location-oriented weakly-supervised RPN (WSOVODRPN_V2 + heads).

Reference ``wsovod/modeling/proposal_generator/rpn.py``:

* ``StandardRPNHead``: shared 3x3 conv + ReLU, then 1x1 objectness (A) and
  1x1 anchor deltas (A*4) — the head used by WSOVODRPN_V2 in every shipped
  config (V2 unpacks two outputs, ``rpn.py:404``).
* ``WSOVODRPNHead`` (:32-87): 3x3 conv + ReLU + channel L2-normalize, then
  cls (1), reg (4), centerness-style objectness (1); used by the anchor-free
  ``WSOVODRPN`` variant.
* ``WSOVODRPN_V2`` (:91-514): anchor-based RPN whose losses are computed
  AFTER the ROI heads from mined pseudo ground truth (the reference stashes
  activations in module state, ``rpn.py:424-428``, and the meta-arch calls
  ``get_losses`` later, ``rcnn_wsovod.py:222-225``). Functionally re-expressed
  here: ``__call__`` returns (proposals, aux) where aux carries the anchors /
  logits / deltas, and ``losses(aux, pseudo_gt, rng)`` is a pure function —
  gradients still flow to the head through aux.

Matching uses IoU thresholds [0.2, 0.6] with allow_low_quality_matches and
512@0.5 subsampling; objectness is BCE, localisation smooth-L1 on positives,
both normalized by ``batch_size_per_image * num_images``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.matcher import Matcher
from ..ops.sampling import subsample_labels
from ..structures.boxes import (
    apply_deltas,
    apply_deltas_linear,
    get_deltas,
    get_deltas_linear,
    pairwise_iou,
)
from ..structures.instances import Instances
from .anchors import AnchorGenerator
from .class_heads import l2_normalize
from .layers import QuantizableConv3x3
from .proposal_utils import find_top_rpn_proposals, find_top_rpn_proposals_group


class StandardRPNHead(nn.Module):
    num_anchors: int
    box_dim: int = 4
    conv_quant: str = "none"  # "int8": shifted-GEMM conv (inference only)

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        """Per-level NHWC features -> (logits [B,H,W,A], deltas [B,H,W,A*4])."""
        conv = QuantizableConv3x3(
            features[0].shape[-1], quant=self.conv_quant,
            kernel_init=nn.initializers.normal(0.01), name="conv",
        )
        cls = nn.Conv(
            self.num_anchors, (1, 1),
            kernel_init=nn.initializers.normal(0.01), name="objectness_logits",
        )
        reg = nn.Conv(
            self.num_anchors * self.box_dim, (1, 1),
            kernel_init=nn.initializers.normal(0.01), name="anchor_deltas",
        )
        logits, deltas = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(cls(t))
            deltas.append(reg(t))
        return logits, deltas


class WSOVODRPNHead(nn.Module):
    """3-output head with channel L2 normalization (reference rpn.py:32-87)."""

    conv_dim: int

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        conv = nn.Conv(
            self.conv_dim, (3, 3), padding="SAME",
            kernel_init=nn.initializers.normal(0.01), name="rpn_conv",
        )
        cls = nn.Conv(1, (1, 1), kernel_init=nn.initializers.normal(0.01), name="rpn_cls")
        reg = nn.Conv(4, (1, 1), kernel_init=nn.initializers.normal(0.01), name="rpn_reg")
        obj = nn.Conv(
            1, (3, 3), padding="SAME",
            kernel_init=nn.initializers.normal(0.01), name="rpn_obj",
        )
        logits, bbox_reg, objectness = [], [], []
        for f in features:
            t = nn.relu(conv(f))
            t = l2_normalize(t, axis=-1)  # L2-normalize over channels
            logits.append(cls(t))
            bbox_reg.append(reg(t))
            objectness.append(obj(t))
        return logits, bbox_reg, objectness


class RPNAux(NamedTuple):
    """Stash replacing the reference's module-state side channel."""

    anchors: jnp.ndarray  # [R, 4] all-level anchors (trace-time constant)
    logits: jnp.ndarray  # [B, R] objectness logits (differentiable)
    deltas: jnp.ndarray  # [B, R, 4] anchor deltas (differentiable)


class WSOVODRPN_V2(nn.Module):
    """Anchor-based RPN with deferred pseudo-GT losses."""

    in_features: Sequence[str] = ("res5",)
    strides: Sequence[int] = (8,)
    anchor_sizes: Sequence = ((32, 64, 128, 256, 512),)
    anchor_aspect_ratios: Sequence = ((0.5, 1.0, 2.0),)
    anchor_offset: float = 0.0
    nms_thresh: float = 0.7
    min_box_size: float = 0.0
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    pre_nms_topk_train: int = 2048
    pre_nms_topk_test: int = 2048
    post_nms_topk_train: int = 1024
    post_nms_topk_test: int = 1024
    iou_thresholds: Sequence[float] = (0.3, 0.7)
    iou_labels: Sequence[int] = (0, -1, 1)
    bbox_reg_weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    smooth_l1_beta: float = 0.0
    loss_weight_cls: float = 1.0
    loss_weight_loc: float = 1.0
    boundary_thresh: float = -1.0
    mrrp_on: bool = False
    mrrp_num_branch: int = 3
    mrrp_fast: bool = True
    conv_quant: str = "none"  # TPU.RPN_CONV_QUANT: int8 head conv at inference

    def _anchor_generator(self) -> AnchorGenerator:
        n_lvl = len(self.in_features) * (self.mrrp_num_branch if self.mrrp_on else 1)
        strides = list(self.strides) * (self.mrrp_num_branch if self.mrrp_on else 1)
        return AnchorGenerator(
            sizes=list(self.anchor_sizes),
            aspect_ratios=list(self.anchor_aspect_ratios),
            strides=strides[:n_lvl] if len(strides) >= n_lvl else strides * n_lvl,
            offset=self.anchor_offset,
        )

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        image_sizes: jnp.ndarray,  # [B, 2]
        train: bool = False,
    ) -> Tuple[Instances, RPNAux]:
        feats = [features[f] for f in self.in_features]
        if self.mrrp_on:
            # branch-concat along batch -> split back into per-branch "levels"
            n_br = self.mrrp_num_branch if (train or not self.mrrp_fast) else 1
            feats = [
                chunk
                for f in feats
                for chunk in jnp.split(f, n_br, axis=0)
            ]

        gen = self._anchor_generator()
        a_per_loc = gen.num_anchors[0]
        head = StandardRPNHead(
            num_anchors=a_per_loc,
            # quantized conv is inference-only (train keeps exact gradients)
            conv_quant="none" if train else self.conv_quant,
            name="rpn_head",
        )
        logits_l, deltas_l = head(feats)

        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors_np = gen.grid_anchors(grid_sizes)

        flat_logits, flat_deltas, proposals_l = [], [], []
        for lg, dl, anc in zip(logits_l, deltas_l, anchors_np):
            b = lg.shape[0]
            lg = lg.reshape(b, -1)  # [B, H*W*A] position-major, anchor-minor
            dl = dl.reshape(b, -1, 4)
            anchors = jnp.asarray(anc)
            boxes = apply_deltas(
                jax.lax.stop_gradient(dl), anchors[None], weights=self.bbox_reg_weights
            )
            flat_logits.append(lg)
            flat_deltas.append(dl)
            proposals_l.append(boxes)

        pre = self.pre_nms_topk_train if train else self.pre_nms_topk_test
        post = self.post_nms_topk_train if train else self.post_nms_topk_test
        if self.mrrp_on:
            proposals = find_top_rpn_proposals_group(
                proposals_l,
                [jax.lax.stop_gradient(l) for l in flat_logits],
                image_sizes,
                a_per_loc,
                self.nms_thresh,
                pre,
                post,
                self.min_box_size,
            )
        else:
            proposals = find_top_rpn_proposals(
                proposals_l,
                [jax.lax.stop_gradient(l) for l in flat_logits],
                image_sizes,
                self.nms_thresh,
                pre,
                post,
                self.min_box_size,
            )

        aux = RPNAux(
            anchors=jnp.concatenate([jnp.asarray(a) for a in anchors_np], axis=0),
            logits=jnp.concatenate(flat_logits, axis=1),
            deltas=jnp.concatenate(flat_deltas, axis=1),
        )
        return proposals, aux

    # ------------------------------------------------------------- losses
    def losses(
        self,
        aux: RPNAux,
        gt_boxes: jnp.ndarray,  # [B, G, 4] pseudo ground truth
        gt_valid: jnp.ndarray,  # [B, G]
        rng: jax.Array,
    ) -> Dict[str, jnp.ndarray]:
        """The deferred RPN loss (reference ``get_losses``, rpn.py:439-445)."""
        matcher = Matcher(
            list(self.iou_thresholds), list(self.iou_labels), allow_low_quality_matches=True
        )
        b = aux.logits.shape[0]

        def label_one(gt_b, gt_v, key):
            iou = pairwise_iou(gt_b, aux.anchors)  # [G, R]
            matched_idx, labels = matcher(iou, gt_valid=gt_v)
            # no valid gt at all -> every anchor is background
            any_gt = jnp.any(gt_v)
            labels = jnp.where(any_gt, labels, jnp.zeros_like(labels))
            pos, neg = subsample_labels(
                labels.astype(jnp.int32),
                self.batch_size_per_image,
                self.positive_fraction,
                key,
            )
            sampled_labels = jnp.where(
                pos, 1, jnp.where(neg, 0, -1)
            ).astype(jnp.int32)
            matched_boxes = gt_b[matched_idx]
            return sampled_labels, matched_boxes

        keys = jax.random.split(rng, b)
        labels, matched_boxes = jax.vmap(label_one)(gt_boxes, gt_valid, keys)

        pos_mask = labels == 1
        valid_mask = labels >= 0

        gt_deltas = get_deltas(
            aux.anchors[None], matched_boxes, weights=self.bbox_reg_weights
        )
        finite = jnp.all(jnp.isfinite(gt_deltas), axis=-1) & pos_mask
        # NaN/Inf guard (reference rpn.py:339-344 zeroes the loss)
        gt_deltas = jnp.nan_to_num(gt_deltas, nan=0.0, posinf=0.0, neginf=0.0)
        diff = jnp.abs(aux.deltas - gt_deltas)
        if self.smooth_l1_beta > 1e-12:
            l1 = jnp.where(
                diff < self.smooth_l1_beta,
                0.5 * diff * diff / self.smooth_l1_beta,
                diff - 0.5 * self.smooth_l1_beta,
            )
        else:
            l1 = diff
        loc_loss = jnp.sum(l1 * finite[..., None].astype(l1.dtype))

        logits = aux.logits.astype(jnp.float32)
        tgt = pos_mask.astype(jnp.float32)
        bce = jnp.maximum(logits, 0) - logits * tgt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        cls_loss = jnp.sum(bce * valid_mask.astype(jnp.float32))

        normalizer = self.batch_size_per_image * b
        return {
            "loss_rpn_cls": cls_loss / normalizer * self.loss_weight_cls,
            "loss_rpn_loc": loc_loss / normalizer * self.loss_weight_loc,
        }


def _nest(v):
    """d2 `_broadcast_params` convention: a flat list means one shared entry."""
    if len(v) and not isinstance(v[0], (list, tuple)):
        return (tuple(v),)
    return tuple(tuple(x) for x in v)


def build_proposal_generator(cfg, strides: Sequence[int]) -> WSOVODRPN_V2:
    """Config-driven builder for the shipped proposal generators."""
    name = cfg.MODEL.PROPOSAL_GENERATOR.NAME
    if name == "PrecomputedProposals":
        return None
    assert name in ("WSOVODRPN_V2", "WSOVODRPN"), name
    rpn = cfg.MODEL.RPN
    if name == "WSOVODRPN":
        return WSOVODRPN(
            in_features=tuple(rpn.IN_FEATURES),
            strides=tuple(strides),
            nms_thresh=rpn.NMS_THRESH,
            min_box_size=cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE,
            batch_size_per_image=rpn.BATCH_SIZE_PER_IMAGE,
            positive_fraction=rpn.POSITIVE_FRACTION,
            pre_nms_topk_train=rpn.PRE_NMS_TOPK_TRAIN,
            pre_nms_topk_test=rpn.PRE_NMS_TOPK_TEST,
            post_nms_topk_train=rpn.POST_NMS_TOPK_TRAIN,
            post_nms_topk_test=rpn.POST_NMS_TOPK_TEST,
            iou_thresholds=tuple(rpn.IOU_THRESHOLDS),
            iou_labels=tuple(rpn.IOU_LABELS),
            smooth_l1_beta=rpn.SMOOTH_L1_BETA,
            loss_weight_cls=rpn.LOSS_WEIGHT,
            loss_weight_loc=rpn.BBOX_REG_LOSS_WEIGHT * rpn.LOSS_WEIGHT,
            mrrp_on=cfg.MODEL.MRRP.MRRP_ON,
            mrrp_num_branch=cfg.MODEL.MRRP.NUM_BRANCH,
            mrrp_fast=cfg.MODEL.MRRP.TEST_BRANCH_IDX != -1,
        )
    return WSOVODRPN_V2(
        in_features=tuple(rpn.IN_FEATURES),
        strides=tuple(strides),
        anchor_sizes=_nest(cfg.MODEL.ANCHOR_GENERATOR.SIZES),
        anchor_aspect_ratios=_nest(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS),
        anchor_offset=cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        nms_thresh=rpn.NMS_THRESH,
        min_box_size=cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE,
        batch_size_per_image=rpn.BATCH_SIZE_PER_IMAGE,
        positive_fraction=rpn.POSITIVE_FRACTION,
        pre_nms_topk_train=rpn.PRE_NMS_TOPK_TRAIN,
        pre_nms_topk_test=rpn.PRE_NMS_TOPK_TEST,
        post_nms_topk_train=rpn.POST_NMS_TOPK_TRAIN,
        post_nms_topk_test=rpn.POST_NMS_TOPK_TEST,
        iou_thresholds=tuple(rpn.IOU_THRESHOLDS),
        iou_labels=tuple(rpn.IOU_LABELS),
        bbox_reg_weights=tuple(rpn.BBOX_REG_WEIGHTS),
        smooth_l1_beta=rpn.SMOOTH_L1_BETA,
        loss_weight_cls=rpn.LOSS_WEIGHT,
        loss_weight_loc=rpn.BBOX_REG_LOSS_WEIGHT * rpn.LOSS_WEIGHT,
        boundary_thresh=rpn.BOUNDARY_THRESH,
        mrrp_on=cfg.MODEL.MRRP.MRRP_ON,
        mrrp_num_branch=cfg.MODEL.MRRP.NUM_BRANCH,
        mrrp_fast=cfg.MODEL.MRRP.TEST_BRANCH_IDX != -1,
        conv_quant=cfg.TPU.RPN_CONV_QUANT,
    )


class WSOVODRPN(nn.Module):
    """Anchor-free location-oriented RPN (reference ``rpn.py:517-947``).

    One size-of-stride anchor per location; the 3-output ``WSOVODRPNHead``
    predicts cls / linear box distances / centerness-style objectness.
    Losses (deferred, like V2): BCE on cls with the main matcher, smooth-L1
    box regression via ``Box2BoxTransformLinear``, and L1 between
    sigmoid(objectness) and sqrt-centerness targets under a second matcher
    (IOU [0.1, 0.3], sampled at positive_fraction 1). Proposal score =
    sqrt(sigmoid(cls) * sigmoid(obj)) (:913-916).
    """

    in_features: Sequence[str] = ("res5",)
    strides: Sequence[int] = (8,)
    nms_thresh: float = 0.7
    min_box_size: float = 0.0
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    pre_nms_topk_train: int = 2048
    pre_nms_topk_test: int = 2048
    post_nms_topk_train: int = 1024
    post_nms_topk_test: int = 1024
    iou_thresholds: Sequence[float] = (0.2, 0.6)
    iou_labels: Sequence[int] = (0, -1, 1)
    objectness_iou_thresholds: Sequence[float] = (0.1, 0.3)
    objectness_iou_labels: Sequence[int] = (0, -1, 1)
    smooth_l1_beta: float = 0.0
    loss_weight_cls: float = 1.0
    loss_weight_loc: float = 1.0
    loss_weight_obj: float = 1.0
    mrrp_on: bool = False
    mrrp_num_branch: int = 3
    mrrp_fast: bool = True

    def _anchors(self, grid_sizes):
        gen = AnchorGenerator(
            sizes=[(s,) for s in self.strides],
            aspect_ratios=[(1.0,)] * len(self.strides),
            strides=list(self.strides),
            offset=0.5,
        )
        return gen.grid_anchors(grid_sizes)

    @nn.compact
    def __call__(self, features, image_sizes, train: bool = False):
        feats = [features[f] for f in self.in_features]
        if self.mrrp_on:
            n_br = self.mrrp_num_branch if (train or not self.mrrp_fast) else 1
            feats = [c for f in feats for c in jnp.split(f, n_br, axis=0)]

        head = WSOVODRPNHead(conv_dim=feats[0].shape[-1], name="rpn_head")
        logits_l, reg_l, obj_l = head(feats)
        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors_np = self._anchors(grid_sizes)

        flat_logits, flat_obj, flat_deltas, proposals_l, scores_l = [], [], [], [], []
        for lg, rg, ob, anc in zip(logits_l, reg_l, obj_l, anchors_np):
            b = lg.shape[0]
            lg = lg.reshape(b, -1)
            ob = ob.reshape(b, -1)
            rg = rg.reshape(b, -1, 4)
            anchors = jnp.asarray(anc)
            boxes = apply_deltas_linear(jax.lax.stop_gradient(rg), anchors[None])
            flat_logits.append(lg)
            flat_obj.append(ob)
            flat_deltas.append(rg)
            proposals_l.append(boxes)
            scores_l.append(
                jnp.sqrt(
                    jax.nn.sigmoid(jax.lax.stop_gradient(lg))
                    * jax.nn.sigmoid(jax.lax.stop_gradient(ob))
                )
            )

        pre = self.pre_nms_topk_train if train else self.pre_nms_topk_test
        post = self.post_nms_topk_train if train else self.post_nms_topk_test
        proposals = find_top_rpn_proposals(
            proposals_l, scores_l, image_sizes,
            self.nms_thresh, pre, post, self.min_box_size,
        )
        aux = RPNAux(
            anchors=jnp.concatenate([jnp.asarray(a) for a in anchors_np], axis=0),
            logits=jnp.concatenate(flat_logits, axis=1),
            deltas=jnp.concatenate(flat_deltas, axis=1),
        )
        # objectness predictions travel alongside via a widened aux tuple
        aux = aux._replace(
            logits=jnp.stack(
                [jnp.concatenate(flat_logits, axis=1), jnp.concatenate(flat_obj, axis=1)],
                axis=0,
            )
        )
        return proposals, aux

    def losses(self, aux: RPNAux, gt_boxes, gt_valid, rng):
        cls_logits = aux.logits[0]
        obj_logits = aux.logits[1]
        b = cls_logits.shape[0]

        main_matcher = Matcher(
            list(self.iou_thresholds), list(self.iou_labels), allow_low_quality_matches=True
        )
        obj_matcher = Matcher(
            list(self.objectness_iou_thresholds),
            list(self.objectness_iou_labels),
            allow_low_quality_matches=True,
        )

        def label_one(gt_b, gt_v, key):
            iou = pairwise_iou(gt_b, aux.anchors)
            k1, k2 = jax.random.split(key)
            m_idx, m_lab = main_matcher(iou, gt_valid=gt_v)
            o_idx, o_lab = obj_matcher(iou, gt_valid=gt_v)
            any_gt = jnp.any(gt_v)
            m_lab = jnp.where(any_gt, m_lab, jnp.zeros_like(m_lab))
            o_lab = jnp.where(any_gt, o_lab, jnp.zeros_like(o_lab))
            pos, neg = subsample_labels(
                m_lab.astype(jnp.int32), self.batch_size_per_image,
                self.positive_fraction, k1,
            )
            m_s = jnp.where(pos, 1, jnp.where(neg, 0, -1)).astype(jnp.int32)
            pos2, neg2 = subsample_labels(
                o_lab.astype(jnp.int32), self.batch_size_per_image, 1.0, k2
            )
            o_s = jnp.where(pos2, 1, jnp.where(neg2, 0, -1)).astype(jnp.int32)
            return m_s, gt_b[m_idx], o_s, gt_b[o_idx]

        keys = jax.random.split(rng, b)
        m_lab, m_box, o_lab, o_box = jax.vmap(label_one)(gt_boxes, gt_valid, keys)

        pos = m_lab == 1
        valid = m_lab >= 0

        # cls BCE
        lg = cls_logits.astype(jnp.float32)
        tgt = pos.astype(jnp.float32)
        bce = jnp.maximum(lg, 0) - lg * tgt + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        cls_loss = jnp.sum(bce * valid.astype(jnp.float32))

        # linear-delta smooth-l1 box loss on positives
        gt_d = get_deltas_linear(aux.anchors[None], m_box)
        gt_d = jnp.nan_to_num(gt_d, nan=0.0, posinf=0.0, neginf=0.0)
        diff = jnp.abs(aux.deltas - gt_d)
        if self.smooth_l1_beta > 1e-12:
            l1 = jnp.where(
                diff < self.smooth_l1_beta,
                0.5 * diff * diff / self.smooth_l1_beta,
                diff - 0.5 * self.smooth_l1_beta,
            )
        else:
            l1 = diff
        loc_loss = jnp.sum(l1 * pos[..., None].astype(l1.dtype))

        # centerness L1 on objectness positives
        reg_t = get_deltas_linear(aux.anchors[None], o_box, normalize_by_size=False)
        lr = reg_t[..., jnp.array([0, 2])]
        tb = reg_t[..., jnp.array([1, 3])]
        ctr = (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-12)) * (
            jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-12)
        )
        ctr_t = jnp.sqrt(jnp.maximum(ctr, 0.0))
        ok = (o_lab == 1) & jnp.isfinite(ctr_t)
        obj_loss = jnp.sum(
            jnp.abs(jax.nn.sigmoid(obj_logits.astype(jnp.float32)) - ctr_t)
            * ok.astype(jnp.float32)
        )

        normalizer = self.batch_size_per_image * b
        return {
            "loss_rpn_cls": cls_loss / normalizer * self.loss_weight_cls,
            "loss_rpn_bbox": loc_loss / normalizer * self.loss_weight_loc,
            "loss_rpn_obj": obj_loss / normalizer * self.loss_weight_obj,
        }
