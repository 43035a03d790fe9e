"""Dataset evaluation driver (d2 ``inference_on_dataset`` + trainer
``test_WSL`` equivalents, reference ``wsovod/engine/trainer.py:86-207`` and
``engine/defaults.py:368-420``).

Runs the jitted inference forward over a test loader, rescales detections to
original image sizes on host, feeds an evaluator, and reports its metrics.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def build_evaluator(cfg, dataset_name: str, output_dir: Optional[str] = None):
    """Evaluator dispatch by dataset type (reference ``trainer.py:86-111``)."""
    from ..data.catalog import MetadataCatalog
    from ..evaluation.coco_evaluation import COCOEvaluator, OVCOCOEvaluator
    from ..evaluation.pascal_voc_evaluation import PascalVOCDetectionEvaluator_WSL

    ev_type = MetadataCatalog.get(dataset_name).get("evaluator_type", "coco")
    if ev_type == "pascal_voc":
        return PascalVOCDetectionEvaluator_WSL(dataset_name)
    if ev_type == "coco":
        return COCOEvaluator(dataset_name, output_dir)
    if ev_type == "ov_coco":
        return OVCOCOEvaluator(dataset_name, output_dir)
    raise ValueError(f"no evaluator for type {ev_type}")


def inference_on_dataset(
    model,
    params,
    loader: Iterator[Dict],
    evaluator,
    embeddings=None,
    classifier=None,
    eval_proposals: bool = False,
    vis_test_dir: Optional[str] = None,
) -> Dict:
    """Feed every batch through the jitted forward; evaluator consumes
    host-side rescaled results. With ``eval_proposals`` the model's post-NMS
    proposal set is also routed to the evaluator (proposal-recall AR branch,
    reference ``coco_evaluation.py:172-173``). ``vis_test_dir`` dumps each
    image's proposal boxes/scores as .npy there (VIS_TEST, reference
    ``roi_heads.py:1528-1564`` ``_save_proposal_test``)."""
    want_props = eval_proposals or vis_test_dir is not None

    @jax.jit
    def forward(params, batch):
        out = model.apply(
            params,
            batch,
            train=False,
            embeddings=embeddings,
            classifier=classifier,
            return_proposals=want_props,
        )
        if want_props:
            det, _, _, props = out
            return det, props
        det, _, _ = out
        return det, None

    def consume(batch, det, props):
        nonlocal n_images
        det = jax.tree_util.tree_map(np.asarray, det)
        if props is not None:
            props = jax.tree_util.tree_map(np.asarray, props)
        image_sizes = np.asarray(batch["image_sizes"])
        orig_sizes = np.asarray(batch["orig_size"])
        batch_valid = np.asarray(
            batch.get("batch_valid", np.ones(len(image_sizes), bool))
        )
        for i in range(len(image_sizes)):
            if not batch_valid[i]:
                continue
            n_images += 1
            v = det.valid[i]
            boxes = det.boxes[i][v]
            # rescale network-input coords -> original image coords
            sy = orig_sizes[i][0] / max(image_sizes[i][0], 1)
            sx = orig_sizes[i][1] / max(image_sizes[i][1], 1)
            boxes = boxes * np.array([sx, sy, sx, sy])
            boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, orig_sizes[i][1])
            boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, orig_sizes[i][0])
            evaluator.process(
                batch["image_id"][i], boxes, det.scores[i][v], det.classes[i][v]
            )
            if props is not None:
                pb, po, pv = props[0][i], props[1][i], props[2][i]
                pb = pb[pv] * np.array([sx, sy, sx, sy])
                pb[:, 0::2] = np.clip(pb[:, 0::2], 0, orig_sizes[i][1])
                pb[:, 1::2] = np.clip(pb[:, 1::2], 0, orig_sizes[i][0])
                if eval_proposals and hasattr(evaluator, "process_proposals"):
                    evaluator.process_proposals(batch["image_id"][i], pb, po[pv])
                if vis_test_dir is not None:
                    from ..utils.visualization import save_proposals_npy

                    save_proposals_npy(
                        vis_test_dir, batch["image_id"][i], pb, po[pv]
                    )

    n_images = 0
    t0 = time.perf_counter()
    # double-buffered dispatch: fetch batch i's detections only after batch
    # i+1 is dispatched, so the host-side fetch + evaluator bookkeeping
    # overlaps device compute instead of serializing with it
    pending = None
    for batch in loader:
        device_batch = {
            k: jnp.asarray(v)
            for k, v in batch.items()
            if k
            in ("images", "image_sizes", "sam_boxes", "sam_scores", "sam_valid")
        }
        det, props = forward(params, device_batch)
        if pending is not None:
            consume(*pending)
        pending = (batch, det, props)
    if pending is not None:
        consume(*pending)
    dt = time.perf_counter() - t0
    if n_images:
        logger.info("inference done: %d images in %.1fs (%.2f img/s)", n_images, dt, n_images / dt)
    return evaluator.evaluate()


def register_gt_with_evaluator(dataset_dicts, evaluator):
    """Feed ground truth (original-size coords) to the evaluator."""
    for rec in dataset_dicts:
        anns = rec.get("annotations", [])
        boxes = np.array([a["bbox"] for a in anns], np.float64).reshape(-1, 4)
        classes = np.array([a["category_id"] for a in anns], np.int32)
        crowd = np.array([a.get("iscrowd", 0) for a in anns], np.int32)
        if hasattr(evaluator, "process_gt"):
            try:
                evaluator.process_gt(rec["image_id"], boxes, classes, crowd)
            except TypeError:
                evaluator.process_gt(rec["image_id"], boxes, classes)


def test_WSL(cfg, model, params, embeddings=None, classifier=None) -> Dict[str, Dict]:
    """Evaluate on every cfg.DATASETS.TEST split (optionally prepending the
    TRAIN splits when TEST.EVAL_TRAIN, reference ``trainer.py:172-207``)."""
    from ..data.catalog import DatasetCatalog
    from ..data.loader import build_detection_test_loader, get_detection_dataset_dicts

    names = list(cfg.DATASETS.TEST)
    if cfg.TEST.EVAL_TRAIN:
        names = list(cfg.DATASETS.TRAIN) + names
    results = {}
    for name in names:
        evaluator = build_evaluator(cfg, name, cfg.OUTPUT_DIR)
        dicts = get_detection_dataset_dicts([name], filter_empty=False)
        register_gt_with_evaluator(dicts, evaluator)
        loader = build_detection_test_loader(cfg, name)
        results[name] = inference_on_dataset(
            model, params, loader, evaluator, embeddings=embeddings,
            classifier=classifier,
            eval_proposals=cfg.TEST.EVAL_PROPOSALS,
            vis_test_dir=cfg.OUTPUT_DIR if cfg.VIS_TEST else None,
        )
        logger.info("%s: %s", name, results[name])
    return results


def test_with_TTA_WSL(cfg, model, params, embeddings=None, classifier=None):
    """TTA evaluation (reference ``engine/trainer.py:130-170``): AVG merge for
    precomputed-proposal models, UNION for RPN models, 8 scales x flip."""
    from ..data.catalog import DatasetCatalog
    from ..data.dataset_mapper import default_image_buckets, read_image_bgr
    from ..data.loader import get_detection_dataset_dicts
    from ..data.proposals import load_proposals_into_dataset
    from ..models.tta import make_tta_inputs, tta_avg_merge, tta_union_merge

    mode = (
        "avg"
        if cfg.MODEL.PROPOSAL_GENERATOR.NAME == "PrecomputedProposals"
        else "union"
    )
    min_sizes = tuple(cfg.TEST.AUG.MIN_SIZES)
    max_size = cfg.TEST.AUG.MAX_SIZE
    flip = cfg.TEST.AUG.FLIP
    buckets = default_image_buckets(max(min_sizes), max_size)

    @jax.jit
    def forward(params, batch):
        det, all_scores, all_boxes = model.apply(
            params, batch, train=False, embeddings=embeddings, classifier=classifier
        )
        return det, all_scores, all_boxes

    results = {}
    names = list(cfg.DATASETS.TEST)
    for di, name in enumerate(names):
        evaluator = build_evaluator(cfg, name, cfg.OUTPUT_DIR)
        pfs = list(cfg.DATASETS.PROPOSAL_FILES_TEST)
        dicts = get_detection_dataset_dicts([name], filter_empty=False)
        if cfg.MODEL.LOAD_PROPOSALS and di < len(pfs) and pfs[di]:
            dicts = load_proposals_into_dataset(dicts, pfs[di])
        register_gt_with_evaluator(dicts, evaluator)

        for rec in dicts:
            image = read_image_bgr(rec["file_name"])
            pb = np.asarray(rec.get("proposal_boxes", np.zeros((0, 4))), np.float32)
            ps = np.asarray(
                rec.get("proposal_objectness_logits", np.zeros((0,))), np.float32
            )
            topk = cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
            pb, ps = pb[:topk], ps[:topk]
            pv = np.ones((len(pb),), bool)
            inputs = make_tta_inputs(
                image, pb, ps, pv, min_sizes, max_size, flip, buckets,
                cfg.TPU.PROPOSAL_PAD,
            )
            invs = [b.pop("inv") for b in inputs]
            if mode == "avg":
                scores_l, boxes_l = [], []
                for b in inputs:
                    device_batch = {k: jnp.asarray(v) for k, v in b.items()}
                    _, s, bx = forward(params, device_batch)
                    scores_l.append(np.asarray(s[0]))
                    boxes_l.append(np.asarray(bx[0]))
                valid = inputs[0]["sam_valid"][0]
                det = tta_avg_merge(
                    scores_l, boxes_l, invs, valid,
                    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
                    cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                    cfg.TEST.DETECTIONS_PER_IMAGE,
                )
                v = np.asarray(det.valid[0])
                evaluator.process(
                    rec["image_id"],
                    np.asarray(det.boxes[0])[v],
                    np.asarray(det.scores[0])[v],
                    np.asarray(det.classes[0])[v],
                )
            else:
                db, ds, dc = [], [], []
                for b in inputs:
                    device_batch = {k: jnp.asarray(v) for k, v in b.items()}
                    det, _, _ = forward(params, device_batch)
                    v = np.asarray(det.valid[0])
                    db.append(np.asarray(det.boxes[0])[v])
                    ds.append(np.asarray(det.scores[0])[v])
                    dc.append(np.asarray(det.classes[0])[v])
                boxes, scores, classes = tta_union_merge(
                    db, ds, dc, invs,
                    cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                    cfg.TEST.DETECTIONS_PER_IMAGE,
                )
                evaluator.process(rec["image_id"], boxes, scores, classes)
        # keyed name_TTA so an eval-only res.update() never clobbers the
        # plain pass (reference trainer.py:127,162 OrderedDict k+"_TTA")
        results[name + "_TTA"] = evaluator.evaluate()
        logger.info("TTA %s: %s", name, results[name + "_TTA"])
    return results
