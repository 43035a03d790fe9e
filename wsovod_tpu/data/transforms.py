"""Host-side image/box augmentations (numpy; no torch/d2).

Reference ``wsovod/data/detection_utils.py:586-617`` (``build_augmentation``):
ResizeShortestEdge (multiscale choice at train, fixed at test) + RandomFlip,
plus RandomBrightness(1/1.5, 1.5) and RandomSaturation(1/1.5, 1.5) at train;
RandomCrop("relative_range", [0.9, 0.9]) when INPUT.CROP.ENABLED
(``dataset_mapper.py:20-191``).

Each transform returns (image, apply_box_fn) so the same geometric transform
maps annotation and proposal boxes.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np

BoxFn = Callable[[np.ndarray], np.ndarray]


def _identity_boxes(boxes: np.ndarray) -> np.ndarray:
    return boxes


def resize_shortest_edge(
    image: np.ndarray, short: int, max_size: int
) -> Tuple[np.ndarray, BoxFn]:
    import cv2

    h, w = image.shape[:2]
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    out = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    sy, sx = nh / h, nw / w

    def boxes_fn(boxes):
        if boxes is None or len(boxes) == 0:
            return boxes
        b = boxes.astype(np.float32).copy()
        b[:, 0::2] *= sx
        b[:, 1::2] *= sy
        return b

    return out, boxes_fn


def hflip(image: np.ndarray) -> Tuple[np.ndarray, BoxFn]:
    out = image[:, ::-1].copy()
    w = image.shape[1]

    def boxes_fn(boxes):
        if boxes is None or len(boxes) == 0:
            return boxes
        b = boxes.astype(np.float32).copy()
        x1 = w - b[:, 2]
        x2 = w - b[:, 0]
        b[:, 0], b[:, 2] = x1, x2
        return b

    return out, boxes_fn


def random_crop_relative_range(
    image: np.ndarray, crop_size, rng: np.random.RandomState
) -> Tuple[np.ndarray, BoxFn]:
    h, w = image.shape[:2]
    cs = np.asarray(crop_size, dtype=np.float32)
    frac = cs + rng.rand(2) * (1.0 - cs)
    ch, cw = int(h * frac[0] + 0.5), int(w * frac[1] + 0.5)
    y0 = rng.randint(h - ch + 1)
    x0 = rng.randint(w - cw + 1)
    out = image[y0 : y0 + ch, x0 : x0 + cw].copy()

    def boxes_fn(boxes):
        if boxes is None or len(boxes) == 0:
            return boxes
        b = boxes.astype(np.float32).copy()
        b[:, 0::2] = np.clip(b[:, 0::2] - x0, 0, cw)
        b[:, 1::2] = np.clip(b[:, 1::2] - y0, 0, ch)
        return b

    return out, boxes_fn


def random_brightness(image: np.ndarray, lo: float, hi: float, rng) -> np.ndarray:
    f = rng.uniform(lo, hi)
    return np.clip(image.astype(np.float32) * f, 0, 255)


def random_saturation(image: np.ndarray, lo: float, hi: float, rng) -> np.ndarray:
    """BGR saturation jitter (d2 semantics: blend with grayscale)."""
    f = rng.uniform(lo, hi)
    img = image.astype(np.float32)
    # ITU-R 601 luma; image is BGR
    gray = img @ np.array([0.114, 0.587, 0.299], np.float32)
    out = img * f + gray[..., None] * (1.0 - f)
    return np.clip(out, 0, 255)


class TrainAugmentations:
    def __init__(self, cfg):
        self.min_sizes = list(cfg.INPUT.MIN_SIZE_TRAIN)
        self.max_size = cfg.INPUT.MAX_SIZE_TRAIN
        self.flip = cfg.INPUT.RANDOM_FLIP != "none"
        self.crop_enabled = cfg.INPUT.CROP.ENABLED
        self.crop_size = list(cfg.INPUT.CROP.SIZE)

    def __call__(self, image: np.ndarray, rng: np.random.RandomState):
        box_fns: List[BoxFn] = []
        if self.crop_enabled:
            image, fn = random_crop_relative_range(image, self.crop_size, rng)
            box_fns.append(fn)
        short = self.min_sizes[rng.randint(len(self.min_sizes))]
        image, fn = resize_shortest_edge(image, short, self.max_size)
        box_fns.append(fn)
        if self.flip and rng.rand() < 0.5:
            image, fn = hflip(image)
            box_fns.append(fn)
        image = random_brightness(image, 1.0 / 1.5, 1.5, rng)
        image = random_saturation(image, 1.0 / 1.5, 1.5, rng)

        def apply_boxes(boxes):
            for f in box_fns:
                boxes = f(boxes)
            return boxes

        return image, apply_boxes


class TestAugmentations:
    def __init__(self, cfg):
        self.min_size = cfg.INPUT.MIN_SIZE_TEST
        self.max_size = cfg.INPUT.MAX_SIZE_TEST

    def __call__(self, image: np.ndarray, rng=None):
        image, fn = resize_shortest_edge(image, self.min_size, self.max_size)
        return image, fn
