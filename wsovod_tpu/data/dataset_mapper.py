"""DatasetMapper: dataset dict -> padded, static-shape training/eval example.

Reference ``wsovod/data/dataset_mapper.py:20-191``: EXIF-aware image read,
augmentations, proposal transformation (dedup + topk) and annotation ->
instances conversion. The TPU-specific addition is static padding: proposals
pad to ``TPU.PROPOSAL_PAD``, ground truth to ``TPU.MAX_GT_PAD``, and images
to a small set of shape buckets so XLA compiles a bounded number of programs.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .proposals import unique_boxes
from .transforms import TestAugmentations, TrainAugmentations


def read_image_bgr(path: str) -> np.ndarray:
    """EXIF-aware read -> HWC float32 BGR (reference uses d2 read_image with
    format BGR)."""
    from PIL import Image, ImageOps

    with Image.open(path) as img:
        img = ImageOps.exif_transpose(img)
        img = img.convert("RGB")
        arr = np.asarray(img, dtype=np.float32)
    return arr[:, :, ::-1].copy()  # RGB -> BGR


def default_image_buckets(min_size: int, max_size: int, divisibility: int = 32):
    """A small ladder of padded shapes covering shortest-edge ``min_size``
    images of common aspect ratios, both orientations."""
    d = divisibility

    def r(x):
        return int(np.ceil(x / d) * d)

    s = r(min_size)
    ladder = sorted(
        {
            (s, s),
            (s, r(min_size * 4 / 3)),
            (s, r(min_size * 1.5)),
            (s, r(min_size * 2)),
            (r(min_size * 4 / 3), s),
            (r(min_size * 1.5), s),
            (r(min_size * 2), s),
        }
    )
    return ladder


def fit_to_bucket(
    image: np.ndarray, buckets: List[Tuple[int, int]]
) -> Tuple[np.ndarray, Tuple[int, int], float]:
    """Pick the smallest bucket that fits; if none fits, downscale to the
    largest-area bucket. Returns (padded image, true size, extra box scale)."""
    import cv2

    h, w = image.shape[:2]
    fitting = [b for b in buckets if b[0] >= h and b[1] >= w]
    if fitting:
        bh, bw = min(fitting, key=lambda b: b[0] * b[1])
        scale = 1.0
    else:
        bh, bw = max(buckets, key=lambda b: b[0] * b[1])
        scale = min(bh / h, bw / w)
        nh, nw = int(h * scale), int(w * scale)
        image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        h, w = nh, nw
    out = np.zeros((bh, bw, image.shape[2]), dtype=np.float32)
    out[:h, :w] = image
    return out, (h, w), scale


class DatasetMapper:
    def __init__(self, cfg, is_train: bool = True):
        self.is_train = is_train
        self.augs = TrainAugmentations(cfg) if is_train else TestAugmentations(cfg)
        self.load_proposals = cfg.MODEL.LOAD_PROPOSALS
        self.proposal_topk = (
            cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN
            if is_train
            else cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
        )
        self.proposal_pad = cfg.TPU.PROPOSAL_PAD
        self.gt_pad = cfg.TPU.MAX_GT_PAD
        self.divisibility = cfg.TPU.IMAGE_SIZE_DIVISIBILITY
        min_size = (
            max(cfg.INPUT.MIN_SIZE_TRAIN) if is_train else cfg.INPUT.MIN_SIZE_TEST
        )
        max_size = cfg.INPUT.MAX_SIZE_TRAIN if is_train else cfg.INPUT.MAX_SIZE_TEST
        self.buckets = (
            [tuple(b) for b in cfg.TPU.IMAGE_BUCKETS]
            if cfg.TPU.IMAGE_BUCKETS
            else default_image_buckets(min_size, max_size, self.divisibility)
        )

    def __call__(self, record: Dict, rng: Optional[np.random.RandomState] = None) -> Dict:
        rng = rng or np.random.RandomState()
        image = read_image_bgr(record["file_name"])
        image, box_fn = self.augs(image, rng)
        image, true_size, extra_scale = fit_to_bucket(image, self.buckets)

        def map_boxes(boxes):
            boxes = box_fn(boxes)
            if boxes is not None and len(boxes):
                boxes = boxes * extra_scale
                boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, true_size[1])
                boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, true_size[0])
            return boxes

        out = {
            "images": image,
            "image_sizes": np.array(true_size, np.int32),
            "image_id": record.get("image_id", -1),
            "file_name": record.get("file_name", ""),
            "orig_size": np.array(
                [record.get("height", true_size[0]), record.get("width", true_size[1])],
                np.int32,
            ),
        }

        # proposals
        sp = self.proposal_pad
        sam_boxes = np.zeros((sp, 4), np.float32)
        sam_scores = np.zeros((sp,), np.float32)
        sam_valid = np.zeros((sp,), bool)
        if self.load_proposals and "proposal_boxes" in record:
            boxes = map_boxes(np.asarray(record["proposal_boxes"], np.float32).copy())
            logits = np.asarray(record["proposal_objectness_logits"], np.float32)
            keep = unique_boxes(boxes)
            boxes, logits = boxes[keep], logits[keep]
            wh = boxes[:, 2:] - boxes[:, :2]
            ok = (wh > 0).all(axis=1)
            boxes, logits = boxes[ok], logits[ok]
            order = np.argsort(-logits)[: min(self.proposal_topk, sp)]
            boxes, logits = boxes[order], logits[order]
            n = len(boxes)
            sam_boxes[:n] = boxes
            sam_scores[:n] = logits
            sam_valid[:n] = True
        out.update(sam_boxes=sam_boxes, sam_scores=sam_scores, sam_valid=sam_valid)

        # ground truth (image-level supervision source + eval reference)
        g = self.gt_pad
        gt_boxes = np.zeros((g, 4), np.float32)
        gt_classes = np.zeros((g,), np.int32)
        gt_valid = np.zeros((g,), bool)
        anns = record.get("annotations", [])
        anns = [a for a in anns if not a.get("iscrowd", 0)]
        if anns:
            boxes = map_boxes(np.array([a["bbox"] for a in anns], np.float32))
            classes = np.array([a["category_id"] for a in anns], np.int32)
            wh = boxes[:, 2:] - boxes[:, :2]
            ok = (wh > 0).all(axis=1) if self.is_train else np.ones(len(boxes), bool)
            boxes, classes = boxes[ok], classes[ok]
            n = min(len(boxes), g)
            gt_boxes[:n] = boxes[:n]
            gt_classes[:n] = classes[:n]
            gt_valid[:n] = True
        out.update(gt_boxes=gt_boxes, gt_classes=gt_classes, gt_valid=gt_valid)
        return out
