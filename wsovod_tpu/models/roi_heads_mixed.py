"""WSOVODMixedDatasetsROIHeads — multi-dataset MIL heads.

Reference ``wsovod/modeling/roi_heads/roi_heads.py:1860-3324``: one
object-mining head per dataset *family* ('voc'/'coco'/'lvis' keys dedup,
:2021-2040), per-dataset ``num_classes``; the K refinement heads are shared
across datasets (their open-vocabulary classifier takes the per-dataset CLIP
text matrix at call time); refinement losses take the per-dataset class count
explicitly (:2286).

Batches are homogeneous in ``dataset_id`` (the multi-dataset loader
guarantees it, reference ``engine/trainer.py:253-255``), so ``source_id`` is
a STATIC argument — each dataset gets its own compiled program, which also
gives each dataset its natural static class-count shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mil_heads import ObjectMiningOutputLayers
from .roi_heads import ROIHeadsOutput, WSOVODROIHeads


def dataset_family(name: str) -> str:
    """'voc'/'coco'/'lvis' family key (reference :2021-2040)."""
    lname = name.lower()
    for fam in ("voc", "lvis", "coco", "ilsvrc"):
        if fam in lname:
            return fam
    return lname


class WSOVODMixedDatasetsROIHeads(WSOVODROIHeads):
    dataset_names: Sequence[str] = ()
    num_classes_list: Sequence[int] = ()

    def setup(self):
        super().setup()
        families = []
        miner_index = []
        for n in self.dataset_names:
            fam = dataset_family(n)
            if fam not in families:
                families.append(fam)
            miner_index.append(families.index(fam))
        self._miner_index = tuple(miner_index)
        fam_classes = {}
        for i, n in enumerate(self.dataset_names):
            fam_classes.setdefault(miner_index[i], self.num_classes_list[i])
        self.object_miners = [
            ObjectMiningOutputLayers(
                num_classes=fam_classes[fi],
                mean_loss=self.object_mining_mean_loss,
                loss_weight=self.object_mining_weight,
                context=self.pooler.triple,
                name=f"object_miner_{fi}",
            )
            for fi in sorted(fam_classes)
        ]

    def __call__(
        self,
        features,
        proposals,
        gt_classes,
        gt_valid,
        source_id: int = 0,
        data_aware_features=None,
        classifier: Optional[jnp.ndarray] = None,
        embeddings: Optional[jnp.ndarray] = None,
        append_background: bool = True,
        rng: Optional[jax.Array] = None,
        sam_embed: Optional[jnp.ndarray] = None,  # [B, Gh, Gw, 256]
        sam_scale: Optional[jnp.ndarray] = None,  # [B]
    ) -> ROIHeadsOutput:
        from .mining import get_image_level_gt, label_and_sample_wsl, pgt_mist, pgt_top_k
        from ..ops.matcher import Matcher

        num_classes = self.num_classes_list[source_id]
        miner = self.object_miners[self._miner_index[source_id]]

        oh, _, present = jax.vmap(
            lambda c, v: get_image_level_gt(c, v, num_classes)
        )(gt_classes, gt_valid)

        roi_feats, miner_feats = self._pooled_box_features(
            features, proposals, data_aware_features, train=True
        )

        if self.is_initializing():
            # touch every per-dataset miner so init creates all their params
            # (apply() later selects one statically per compiled program)
            for m in self.object_miners:
                _ = m(miner_feats, proposals.valid)

        mil_scores = miner(miner_feats, proposals.valid)
        losses = dict(miner.losses(mil_scores, oh))
        # prefix losses with the dataset id for observability
        img_logits = miner.predict_probs_img(mil_scores)

        prev_scores = jnp.concatenate(
            [mil_scores, jnp.zeros(mil_scores.shape[:-1] + (1,), mil_scores.dtype)],
            axis=-1,
        )
        prev_scores = jax.lax.stop_gradient(prev_scores)
        proposal_boxes = proposals.proposal_boxes
        # refined-box mining feed + SAM refinement, matching the plain heads
        # (reference mixed loop is structurally identical:
        # roi_heads.py:2253-2347 — sam=self.sam iff refine_reg[k] per stage,
        # sam=self.sam unconditionally for the RPN targets, and
        # prev_pred_boxes = box_refinery[k].predict_boxes after each stage)
        mining_boxes = proposal_boxes
        if rng is None:
            rng = jax.random.PRNGKey(0)

        for k in range(self.refine_k):
            sam_applies = (
                k < len(self.refine_reg)
                and self.refine_reg[k]
                and self.bbox_refine
                and sam_embed is not None
            )
            if self.refine_mist:
                # mist weights follow the sam/no-sam zip (reference
                # roi_heads.py:2377-2507, same nuance as the plain heads)
                pgt_fn = lambda *a: pgt_mist(*a, sam=sam_applies)
            else:
                pgt_fn = pgt_top_k
            mine = jax.vmap(
                lambda b, s, v, p, w: pgt_fn(b, s[:, :num_classes], v, p, w)
            )(mining_boxes, prev_scores, proposals.valid, present,
              jax.lax.stop_gradient(img_logits))
            if k < len(self.refine_reg) and self.refine_reg[k]:
                mine = self._sam_refine(mine, sam_embed, sam_scale)
            if self.sampling_on:
                stage = min(k, len(self.sampling_iou_thresholds) - 1)
                matcher = Matcher(
                    list(self.sampling_iou_thresholds[stage]),
                    list(self.sampling_iou_labels[stage]),
                    allow_low_quality_matches=False,
                )
                rng, krng = jax.random.split(rng)
                keys = jax.random.split(krng, proposal_boxes.shape[0])
                labeled = jax.vmap(
                    lambda pb, pv, pg, key: label_and_sample_wsl(
                        pb, pv, pg, matcher, num_classes,
                        self.sampling_batch_size[stage],
                        self.sampling_pos_fraction[stage],
                        key,
                        cls_agnostic_bbox_known=self.cls_agnostic_bbox_known,
                    )
                )(proposal_boxes, proposals.valid, mine, keys)
            else:
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
                roi_feats, classifier=classifier,
                append_background=append_background, embeddings=embeddings,
            )
            losses_k = self.box_refinery[k].losses(
                scores_k, deltas_k, proposal_boxes,
                labeled.gt_classes, labeled.gt_boxes, labeled.gt_weights,
                proposals.valid, num_classes=num_classes,
            )
            losses.update(losses_k)
            prev_scores = jax.lax.stop_gradient(
                nn.softmax(scores_k.astype(jnp.float32), axis=-1)
            )
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
            if k == self.refine_k - 1 and not self.is_initializing():
                # VIS_PERIOD dump hook (see roi_heads.py): last round's pgt
                self.sow(
                    "vis",
                    "pgt",
                    {
                        "boxes": mine.boxes,
                        "classes": mine.classes,
                        "scores": mine.scores,
                        "valid": mine.valid,
                    },
                )

        proposal_targets = None
        if self.rpn_on:
            proposal_targets = jax.vmap(
                lambda b, s, v, p, w: pgt_top_k(b, s[:, :num_classes], v, p, w, top_k=1)
            )(mining_boxes, prev_scores, proposals.valid, present,
              jax.lax.stop_gradient(img_logits))
            # reference refines the mixed RPN pseudo targets with SAM too
            # (roi_heads.py:2344, sam=self.sam)
            proposal_targets = self._sam_refine(
                proposal_targets, sam_embed, sam_scale
            )

        return ROIHeadsOutput(losses, proposal_targets, img_logits)


def build_mixed_roi_heads(cfg, pooler):
    from .roi_heads import build_roi_heads

    base = build_roi_heads(cfg, pooler)
    kwargs = {f.name: getattr(base, f.name) for f in base.__dataclass_fields__.values()
              if f.name not in ("parent", "name")}
    kwargs["dataset_names"] = tuple(cfg.DATASETS.MIXED_DATASETS.NAMES)
    kwargs["num_classes_list"] = tuple(cfg.DATASETS.MIXED_DATASETS.NUM_CLASSES)
    return WSOVODMixedDatasetsROIHeads(**kwargs)
