"""WSOVODROIHeads — the proposal-concept-synchronized MIL core.

Reference ``wsovod/modeling/roi_heads/roi_heads.py:430-1857``. Train flow:

1. pool per-proposal features (ROIPool / ROILoopPool; MRRP branch routing);
2. objectness gating: pooled features are scaled by ``objectness + 1``
   (tripled row-wise for ROILoopPool) (:727-744);
3. DAN box head; ROILoopPool output chunks 3-ways into ROI/frame/context;
   the data-aware feature vector is added to each (:746-765);
4. object-mining (WSDDN) head -> BCE against image-level one-hots (:767);
5. K instance-refinement rounds (:786-839): mine pseudo GT from the previous
   round's scores (``get_pgt_top_k``/``get_pgt_mist``), relabel proposals via
   the per-stage matcher + WSL subsampling, run refinery k on the SAME pooled
   features, weighted CE + optional class-agnostic box regression;
6. if an RPN is present, a final ``get_pgt_top_k(top_k=1)`` from the last
   refinery becomes the RPN's deferred pseudo GT (:841-881) — returned
   explicitly here instead of stashed in module state.

Inference (:893-907): all K refineries run; scores/deltas are averaged across
K and decoded with a single static-shape fast_rcnn_inference.

Everything is batched ``[B, P, ...]`` with validity masks; per-image vmap
covers mining and labeling.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.matcher import Matcher
from ..structures.instances import Instances
from .box_head import DiscriminativeAdaptationNeck
from .fast_rcnn_inference import Detections, fast_rcnn_inference_batched
from .mil_heads import (
    InstanceRefinementOutputLayers,
    ObjectMiningOutputLayers,
    predict_boxes_K,
    predict_probs_K,
)
from .mining import (
    LabeledProposals,
    PseudoGT,
    get_image_level_gt,
    label_and_sample_wsl,
    pgt_mist,
    pgt_top_k,
)
from .poolers import ROIPooler


class ROIHeadsOutput(NamedTuple):
    losses: Dict[str, jnp.ndarray]
    proposal_targets: Optional[PseudoGT]  # batched pseudo GT for the RPN loss
    pred_class_img_logits: jnp.ndarray  # [B, C]


class WSOVODROIHeads(nn.Module):
    num_classes: int
    pooler: ROIPooler
    in_features: Sequence[str] = ("res5",)
    dan_conv_dims: Sequence[int] = ()
    dan_fc_dims: Sequence[int] = (4096, 4096)
    dan_conv_norm: str = ""
    refine_k: int = 1
    refine_reg: Sequence[bool] = (True,)
    refine_mist: bool = False
    cross_entropy_weighted: bool = True
    sampling_on: bool = True
    sampling_iou_thresholds: Sequence[Sequence[float]] = ((0.5,),)
    sampling_iou_labels: Sequence[Sequence[int]] = ((0, 1),)
    sampling_batch_size: Sequence[int] = (4096,)
    sampling_pos_fraction: Sequence[float] = (1.0,)
    # sampling_on=False fallback matcher (MODEL.ROI_HEADS.IOU_*, reference
    # roi_heads.py:810-815 -> label_and_sample_proposals)
    roi_matcher_iou_thresholds: Sequence[float] = (0.5,)
    roi_matcher_iou_labels: Sequence[int] = (0, 1)
    object_mining_weight: float = 1.0
    object_mining_mean_loss: bool = True
    instance_refinement_weight: float = 1.0
    box_reg_loss_weight: float = 1.0
    box_reg_loss_type: str = "smooth_l1_weighted"
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    smooth_l1_beta: float = 0.0
    # OV classifier config (per refinery)
    ov_weight_dim: int = 512
    ov_use_bias: float = 0.0
    ov_norm_weight: bool = True
    ov_norm_temp: float = 50.0
    ov_random_weight: bool = False
    # inference
    test_score_thresh: float = 1e-5
    test_nms_thresh: float = 0.3
    test_topk_per_image: int = 100
    test_per_class_topk: int = 128
    rpn_on: bool = True
    mrrp_on: bool = False
    mrrp_num_branch: int = 3
    cls_agnostic_bbox_known: bool = False
    dtype: str | None = None
    dan_fc1_quant: str = "none"
    # unfused pool->DAN paths process ROIs in chunks of this size so the
    # pooled tensor never fully materializes (0 = no chunking)
    unfused_roi_chunk: int = 512
    # WSOVOD.BBOX_REFINE: SAM box-prompted refinement of mined pseudo GT
    bbox_refine: bool = False
    sam_img_size: int = 1024
    sam_refine_max_boxes: int = 32

    def setup(self):
        self.box_head = DiscriminativeAdaptationNeck(
            conv_dims=tuple(self.dan_conv_dims),
            fc_dims=tuple(self.dan_fc_dims),
            conv_norm=self.dan_conv_norm,
            dtype=self.dtype,
            fc1_quant=self.dan_fc1_quant,
            name=None,
        )
        self.object_miner = ObjectMiningOutputLayers(
            num_classes=self.num_classes,
            mean_loss=self.object_mining_mean_loss,
            loss_weight=self.object_mining_weight,
            context=self.pooler.triple,
            dtype=self.dtype,
        )
        self.box_refinery = [
            InstanceRefinementOutputLayers(
                num_classes=self.num_classes,
                refine_k=k,
                refine_reg=bool(self.refine_reg[k]) if k < len(self.refine_reg) else False,
                cross_entropy_weighted=self.cross_entropy_weighted,
                loss_weight=self.instance_refinement_weight,
                box_reg_loss_weight=self.box_reg_loss_weight,
                box_reg_loss_type=self.box_reg_loss_type,
                smooth_l1_beta=self.smooth_l1_beta,
                bbox_reg_weights=tuple(self.bbox_reg_weights),
                weight_dim=self.ov_weight_dim,
                use_bias=self.ov_use_bias,
                norm_weight=self.ov_norm_weight,
                norm_temperature=self.ov_norm_temp,
                random_weight=self.ov_random_weight,
                dtype=self.dtype,
                name=f"box_refinery_{k}",
            )
            for k in range(self.refine_k)
        ]
        if self.bbox_refine:
            from .sam_refine import SAMRefiner

            self.sam_refiner = SAMRefiner(sam_img_size=self.sam_img_size)

    def _sam_refine(self, pgt, sam_embed, sam_scale):
        """Refine mined boxes with SAM (reference roi_heads.py:1215-1284);
        static python loop over the (small) batch dim.

        The mined-pgt table is padded to C*top_k rows (80 for COCO) but only
        the present classes are valid (~3-8/image), so prompts are capped to
        the valid-first ``sam_refine_max_boxes`` rows and the refined boxes
        scattered back — uncapped rows keep their original box, the same
        fallback the reference uses for degenerate masks."""
        if not self.bbox_refine or sam_embed is None:
            return pgt
        g = pgt.boxes.shape[1]
        cap = min(self.sam_refine_max_boxes, g) if self.sam_refine_max_boxes else g
        refined = []
        for b in range(pgt.boxes.shape[0]):
            if cap < g:
                order = jnp.argsort(~pgt.valid[b], stable=True)  # valid first
                idx = order[:cap]
                sub = self.sam_refiner(
                    sam_embed[b], pgt.boxes[b][idx], pgt.valid[b][idx],
                    sam_scale[b],
                )
                refined.append(pgt.boxes[b].at[idx].set(sub))
            else:
                refined.append(
                    self.sam_refiner(
                        sam_embed[b], pgt.boxes[b], pgt.valid[b], sam_scale[b]
                    )
                )
        boxes = jnp.stack(refined)
        boxes = jax.lax.stop_gradient(boxes)
        return pgt._replace(boxes=jnp.where(pgt.valid[..., None], boxes, 0.0))

    # ------------------------------------------------------------ features
    def _pooled_box_features(
        self,
        features: Dict[str, jnp.ndarray],
        proposals: Instances,
        data_aware_features: Optional[jnp.ndarray],
        train: bool,
    ):
        feats = [features[f] for f in self.in_features]
        level_ids = proposals.get("level_ids")
        # fused pool+gate+fc1 streaming path (single-level ROIAlignV2 on TPU):
        # the kernel folds the (objectness+1)*valid gate in and emits channel
        # chunks that the DAN contracts into fc1 without materializing the
        # [B, P, S, S, C] pooled tensor
        chunks, unsort_idx = (
            self.pooler.fused_chunk_pool(
                feats,
                proposals.proposal_boxes,
                proposals.objectness_logits,
                proposals.valid,
                train=train,
                level_ids=level_ids,
            )
            if not self.dan_conv_dims
            else (None, None)
        )
        if chunks is not None:
            from .poolers import SegmentedChunks

            layout_kw = dict(
                chunk_layout=getattr(self.pooler, "chunk_layout_used", "hwnc"),
                pooled_hw=(self.pooler.output_size, self.pooler.output_size),
                # train: the (objectness+1) gate moves to the fc1 output so
                # the pooled-tensor cotangent dies (see poolers/box_head)
                row_gate=getattr(self.pooler, "train_row_gate", None),
            )
            if isinstance(chunks, SegmentedChunks):
                # width-split segments: fc per segment, concat on the cheap
                # [B, P_seg, F] outputs, then unsort below. The train fc1
                # row gate arrives in segment-concatenated order ([B, N'],
                # see poolers) and must be sliced to each segment's rows.
                gate_full = layout_kw.pop("row_gate")
                outs, o = [], 0
                for s, n_s in zip(chunks.segments, chunks.sizes):
                    g_s = (
                        gate_full[..., o : o + n_s]
                        if gate_full is not None
                        else None
                    )
                    outs.append(
                        self.box_head(
                            s, train=train, row_gate=g_s, **layout_kw
                        )
                    )
                    o += n_s
                box_features = jnp.concatenate(outs, axis=-2)
            else:
                box_features = self.box_head(
                    chunks, train=train, **layout_kw
                )  # [(3,) B, P', F]
            if unsort_idx is not None:
                # MRRP branch-sorted rows -> proposal order (cheap on the
                # [B, P, F] fc output; prohibitive on the pooled tensor)
                idx = unsort_idx[..., None]
                if self.pooler.triple:
                    idx = idx[None]
                box_features = jnp.take_along_axis(
                    box_features, idx, axis=-2
                )
        else:
            # ROI-chunked pool -> gate -> DAN: the full pooled tensor
            # ([(3,) B, P, 7, 7, C] — ~12 GB at the MRRP/ROILoopPool COCO
            # budget) never materializes; only a chunk of ROIs is live at a
            # time. Per-chunk dropout draws fresh masks, which is fine.
            n = proposals.proposal_boxes.shape[1]
            step = self.unfused_roi_chunk if self.unfused_roi_chunk > 0 else n

            def _pool_chunk(mdl, boxes_sl, valid_sl, obj_sl, lvl_sl):
                pooled = mdl.pooler(
                    feats, boxes_sl, valid_sl, level_ids=lvl_sl,
                    mask_invalid=False,
                )
                # objectness gating (reference :727-744): scale by
                # (objectness+1); invalid zeroing folds into the gate
                gate = (
                    (obj_sl + 1.0) * valid_sl.astype(obj_sl.dtype)
                ).astype(pooled.dtype)
                if mdl.pooler.triple:
                    pooled = pooled * gate[None, :, :, None, None, None]
                else:
                    pooled = pooled * gate[:, :, None, None, None]
                return mdl.box_head(pooled, train=train)

            # remat in training: the pre-gate pooled chunk would otherwise be
            # saved as a backward residual for the gate gradient — at the
            # MRRP/COCO budget that is ~2 GB per chunk
            chunk_fn = (
                nn.remat(_pool_chunk) if (train and n > step) else _pool_chunk
            )
            parts = []
            for i in range(0, n, step):
                sl = slice(i, min(i + step, n))
                parts.append(
                    chunk_fn(
                        self,
                        proposals.proposal_boxes[:, sl],
                        proposals.valid[:, sl],
                        proposals.objectness_logits[:, sl],
                        None if level_ids is None else level_ids[:, sl],
                    )
                )
            box_features = (
                parts[0]
                if len(parts) == 1
                else jnp.concatenate(parts, axis=2 if self.pooler.triple else 1)
            )  # [(3,) B, P, F]

        if self.pooler.triple:
            roi, frame, ctx = box_features[0], box_features[1], box_features[2]
            if data_aware_features is not None:
                daf = data_aware_features[:, None, :].astype(roi.dtype)
                roi, frame, ctx = roi + daf, frame + daf, ctx + daf
            return roi, jnp.stack([roi, frame, ctx])
        if data_aware_features is not None:
            box_features = box_features + data_aware_features[:, None, :].astype(
                box_features.dtype
            )
        return box_features, box_features

    # -------------------------------------------------------------- train
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        proposals: Instances,  # batched [B, P]
        gt_classes: jnp.ndarray,  # [B, G] instance classes (image-level source)
        gt_valid: jnp.ndarray,  # [B, G]
        data_aware_features: Optional[jnp.ndarray] = None,
        classifier: Optional[jnp.ndarray] = None,
        embeddings: Optional[jnp.ndarray] = None,
        append_background: bool = True,
        rng: Optional[jax.Array] = None,
        num_classes_override: Optional[int] = None,
        sam_embed: Optional[jnp.ndarray] = None,  # [B, Gh, Gw, 256]
        sam_scale: Optional[jnp.ndarray] = None,  # [B]
    ) -> ROIHeadsOutput:
        num_classes = num_classes_override or self.num_classes
        oh, _, present = jax.vmap(
            lambda c, v: get_image_level_gt(c, v, num_classes)
        )(gt_classes, gt_valid)

        roi_feats, miner_feats = self._pooled_box_features(
            features, proposals, data_aware_features, train=True
        )

        mil_scores = self.object_miner(miner_feats, proposals.valid)  # [B, P, C]
        losses = dict(self.object_miner.losses(mil_scores, oh))
        img_logits = self.object_miner.predict_probs_img(mil_scores)  # [B, C]

        # seed mining with the miner's scores (zero bg column appended)
        prev_scores = jnp.concatenate(
            [mil_scores, jnp.zeros(mil_scores.shape[:-1] + (1,), mil_scores.dtype)],
            axis=-1,
        )
        prev_scores = jax.lax.stop_gradient(prev_scores)
        proposal_boxes = proposals.proposal_boxes
        # mining feed: starts at the raw proposal boxes (the object miner's
        # predict_boxes returns them verbatim, reference
        # fast_rcnn_open_vocabulary.py:552-567); after each box-supervised
        # refinery the feed becomes that refinery's REGRESSED boxes
        # (predict_boxes = apply_deltas(deltas_k, proposal_boxes),
        # :961-985), which reach stage-(k+1) mining and the final RPN
        # pgt_top_k (reference roi_heads.py:823-829,872-881)
        mining_boxes = proposal_boxes

        if rng is None:
            rng = jax.random.PRNGKey(0)

        last_pgt = None
        for k in range(self.refine_k):
            sam_applies = (
                k < len(self.refine_reg)
                and self.refine_reg[k]
                and self.bbox_refine
                and sam_embed is not None
            )
            if self.refine_mist:
                # reference get_pgt_mist: weights follow the sam/no-sam zip
                # (roi_heads.py:1297,1320-1328)
                pgt_fn = lambda *a: pgt_mist(*a, sam=sam_applies)
            else:
                pgt_fn = pgt_top_k
            mine = jax.vmap(
                lambda b, s, v, p, w: pgt_fn(b, s[:, :num_classes], v, p, w)
            )(
                mining_boxes,
                prev_scores,
                proposals.valid,
                present,
                jax.lax.stop_gradient(img_logits),
            )
            # SAM refinement on box-supervised stages (reference passes
            # sam=self.sam iff refine_reg[k], roi_heads.py:795-808)
            if k < len(self.refine_reg) and self.refine_reg[k]:
                mine = self._sam_refine(mine, sam_embed, sam_scale)
            last_pgt = mine

            if self.sampling_on:
                stage = min(k, len(self.sampling_iou_thresholds) - 1)
                matcher = Matcher(
                    list(self.sampling_iou_thresholds[stage]),
                    list(self.sampling_iou_labels[stage]),
                    allow_low_quality_matches=False,
                )
                rng, krng = jax.random.split(rng)
                keys = jax.random.split(krng, proposal_boxes.shape[0])
                labeled: LabeledProposals = jax.vmap(
                    lambda pb, pv, pg, key: label_and_sample_wsl(
                        pb,
                        pv,
                        pg,
                        matcher,
                        num_classes,
                        self.sampling_batch_size[stage],
                        self.sampling_pos_fraction[stage],
                        key,
                        cls_agnostic_bbox_known=self.cls_agnostic_bbox_known,
                    )
                )(proposal_boxes, proposals.valid, mine, keys)
            else:
                # SAMPLING_ON=False: plain d2 labeling, ROI_HEADS matcher,
                # no subsampling (reference roi_heads.py:810-815)
                from .mining import label_and_sample_plain

                matcher = Matcher(
                    list(self.roi_matcher_iou_thresholds),
                    list(self.roi_matcher_iou_labels),
                    allow_low_quality_matches=False,
                )
                labeled = jax.vmap(
                    lambda pb, pv, pg: label_and_sample_plain(
                        pb, pv, pg, matcher, num_classes
                    )
                )(proposal_boxes, proposals.valid, mine)

            scores_k, deltas_k = self.box_refinery[k](
                roi_feats,
                classifier=classifier,
                append_background=append_background,
                embeddings=embeddings,
            )
            losses_k = self.box_refinery[k].losses(
                scores_k,
                deltas_k,
                proposal_boxes,
                labeled.gt_classes,
                labeled.gt_boxes,
                labeled.gt_weights,
                proposals.valid,
                num_classes=num_classes,
            )
            losses.update(losses_k)

            prev_scores = jax.lax.stop_gradient(
                nn.softmax(scores_k.astype(jnp.float32), axis=-1)
            )
            # next mining round (and the RPN targets) consume this
            # refinery's regressed boxes; with refine_reg[k]=False the
            # deltas are zeros, so decoding reproduces the proposal boxes
            # (matching the reference's zero-delta predict_boxes)
            if k < len(self.refine_reg) and self.refine_reg[k]:
                from ..structures.boxes import apply_deltas

                mining_boxes = jax.lax.stop_gradient(
                    apply_deltas(
                        deltas_k.astype(jnp.float32),
                        proposal_boxes,
                        weights=self.bbox_reg_weights,
                    )
                )
            else:
                mining_boxes = proposal_boxes

        # VIS_PERIOD debug dumps (reference roi_heads.py:1345-1425): the last
        # refinement round's mined pseudo GT is sown into the "vis" collection
        # (tiny [B, G, .] arrays); the trainer fetches it every VIS_PERIOD
        # iters and draws it host-side (utils/visualization.vis_pgt). sow is
        # a no-op unless the caller applies with mutable=["vis"] — and must
        # be skipped at init or the collection leaks into the param pytree
        # (init makes every collection mutable) and breaks checkpoint
        # templates.
        if last_pgt is not None and not self.is_initializing():
            self.sow(
                "vis",
                "pgt",
                {
                    "boxes": last_pgt.boxes,
                    "classes": last_pgt.classes,
                    "scores": last_pgt.scores,
                    "valid": last_pgt.valid,
                },
            )

        proposal_targets = None
        if self.rpn_on:
            proposal_targets = jax.vmap(
                lambda b, s, v, p, w: pgt_top_k(b, s[:, :num_classes], v, p, w, top_k=1)
            )(
                mining_boxes,
                prev_scores,
                proposals.valid,
                present,
                jax.lax.stop_gradient(img_logits),
            )
            # reference always refines the RPN pseudo targets with SAM
            # (roi_heads.py:872-881, sam=self.sam)
            proposal_targets = self._sam_refine(proposal_targets, sam_embed, sam_scale)

        return ROIHeadsOutput(losses, proposal_targets, img_logits)

    # ---------------------------------------------------------- inference
    def inference(
        self,
        features: Dict[str, jnp.ndarray],
        proposals: Instances,
        image_sizes: jnp.ndarray,  # [B, 2]
        data_aware_features: Optional[jnp.ndarray] = None,
        classifier: Optional[jnp.ndarray] = None,
        embeddings: Optional[jnp.ndarray] = None,
        append_background: bool = True,
    ) -> Tuple[Detections, jnp.ndarray, jnp.ndarray]:
        roi_feats, _ = self._pooled_box_features(
            features, proposals, data_aware_features, train=False
        )
        scores_K, deltas_K = [], []
        for k in range(self.refine_k):
            s, d = self.box_refinery[k](
                roi_feats,
                classifier=classifier,
                append_background=append_background,
                embeddings=embeddings,
            )
            scores_K.append(s)
            deltas_K.append(d)
        probs = predict_probs_K(scores_K)  # [B, P, C+1]
        boxes = predict_boxes_K(deltas_K, proposals.proposal_boxes, self.bbox_reg_weights)
        detections = fast_rcnn_inference_batched(
            boxes,
            probs,
            proposals.valid,
            image_sizes,
            score_thresh=self.test_score_thresh,
            nms_thresh=self.test_nms_thresh,
            topk_per_image=self.test_topk_per_image,
            per_class_topk=self.test_per_class_topk,
        )
        return detections, probs, boxes


def build_roi_heads(cfg, pooler: ROIPooler) -> WSOVODROIHeads:
    ws = cfg.WSOVOD
    rb = cfg.MODEL.ROI_BOX_HEAD
    return WSOVODROIHeads(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        pooler=pooler,
        in_features=tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES),
        dan_conv_dims=tuple([rb.CONV_DIM] * rb.NUM_CONV),
        dan_fc_dims=tuple(rb.DAN_DIM),
        dan_conv_norm=rb.NORM,
        refine_k=ws.INSTANCE_REFINEMENT.REFINE_NUM,
        refine_reg=tuple(ws.INSTANCE_REFINEMENT.REFINE_REG),
        refine_mist=ws.INSTANCE_REFINEMENT.REFINE_MIST,
        cross_entropy_weighted=ws.INSTANCE_REFINEMENT.CROSS_ENTROPY_WEIGHTED,
        sampling_on=ws.SAMPLING.SAMPLING_ON,
        roi_matcher_iou_thresholds=tuple(cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS),
        roi_matcher_iou_labels=tuple(cfg.MODEL.ROI_HEADS.IOU_LABELS),
        sampling_iou_thresholds=tuple(tuple(t) for t in ws.SAMPLING.IOU_THRESHOLDS),
        sampling_iou_labels=tuple(tuple(t) for t in ws.SAMPLING.IOU_LABELS),
        sampling_batch_size=tuple(ws.SAMPLING.BATCH_SIZE_PER_IMAGE),
        sampling_pos_fraction=tuple(ws.SAMPLING.POSITIVE_FRACTION),
        object_mining_weight=ws.OBJECT_MINING.WEIGHT,
        object_mining_mean_loss=ws.OBJECT_MINING.MEAN_LOSS,
        instance_refinement_weight=ws.INSTANCE_REFINEMENT.WEIGHT,
        box_reg_loss_weight=rb.BBOX_REG_LOSS_WEIGHT,
        box_reg_loss_type=rb.BBOX_REG_LOSS_TYPE,
        bbox_reg_weights=tuple(rb.BBOX_REG_WEIGHTS),
        smooth_l1_beta=rb.SMOOTH_L1_BETA,
        ov_weight_dim=rb.OPEN_VOCABULARY.WEIGHT_DIM,
        ov_use_bias=rb.OPEN_VOCABULARY.USE_BIAS,
        ov_norm_weight=rb.OPEN_VOCABULARY.NORM_WEIGHT,
        ov_norm_temp=rb.OPEN_VOCABULARY.NORM_TEMP,
        ov_random_weight=rb.OPEN_VOCABULARY.WEIGHT_PATH_TRAIN == "rand",
        test_score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        test_nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
        test_topk_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        rpn_on=cfg.MODEL.PROPOSAL_GENERATOR.NAME != "PrecomputedProposals",
        mrrp_on=cfg.MODEL.MRRP.MRRP_ON,
        mrrp_num_branch=cfg.MODEL.MRRP.NUM_BRANCH,
        cls_agnostic_bbox_known=ws.CLS_AGNOSTIC_BBOX_KNOWN,
        dtype=cfg.TPU.COMPUTE_DTYPE if cfg.TPU.COMPUTE_DTYPE != "float32" else None,
        dan_fc1_quant=cfg.TPU.DAN_FC1_QUANT,
        unfused_roi_chunk=cfg.TPU.UNFUSED_ROI_CHUNK,
        bbox_refine=ws.BBOX_REFINE.ENABLE,
        sam_refine_max_boxes=ws.BBOX_REFINE.MAX_BOXES,
    )
