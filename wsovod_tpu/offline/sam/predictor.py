"""SAM predictor with per-image embedding cache + training-time box refine.

Replaces ``wsovod/utils/sam_predictor_with_buffer.py:7-265``
(SamPredictorBuffer): the ViT image encoder runs once per image per epoch
(cache keyed by ``file_name``), the box-prompted mask decoder runs per step.
The in-training pseudo-GT refinement (reference ``roi_heads.py:1215-1284``)
expands mined boxes 1.1x, prompts SAM, and replaces each box by the bounding
box of the predicted mask — computed as a pure max/min mask-coordinate
reduction (equivalent output to the reference's cv2 contour->polygon->bbox
path for bbox purposes), so it stays on device.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .modeling import SAM, SAM_PIXEL_MEAN, SAM_PIXEL_STD


def preprocess_image_for_sam(image_bgr: np.ndarray, img_size: int = 1024):
    """HWC BGR float -> padded [1, S, S, 3] normalized RGB + scale."""
    import cv2

    h, w = image_bgr.shape[:2]
    scale = img_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = cv2.resize(image_bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)
    img = img[:, :, ::-1].astype(np.float32)  # BGR -> RGB
    img = (img - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
    out = np.zeros((img_size, img_size, 3), np.float32)
    out[:nh, :nw] = img
    return out[None], scale, (nh, nw)


def mask_to_box(mask: jnp.ndarray, fallback: jnp.ndarray) -> jnp.ndarray:
    """Binary mask [H, W] -> XYXY box of its support; ``fallback`` when empty."""
    h, w = mask.shape
    any_row = jnp.any(mask, axis=1)
    any_col = jnp.any(mask, axis=0)
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    y1 = jnp.min(jnp.where(any_row, rows, h))
    y2 = jnp.max(jnp.where(any_row, rows, -1))
    x1 = jnp.min(jnp.where(any_col, cols, w))
    x2 = jnp.max(jnp.where(any_col, cols, -1))
    ok = jnp.any(mask)
    box = jnp.stack(
        [x1.astype(jnp.float32), y1.astype(jnp.float32),
         (x2 + 1).astype(jnp.float32), (y2 + 1).astype(jnp.float32)]
    )
    return jnp.where(ok, box, fallback)


class SamPredictorBuffer:
    """Box-prompted SAM with an embedding cache keyed by file name."""

    def __init__(self, model_type: str = "vit_b", params=None, img_size: int = 1024,
                 max_cache: int = 64):
        self.sam = SAM(model_type=model_type, img_size=img_size)
        self.params = params
        self.img_size = img_size
        self.max_cache = max_cache
        self._cache: Dict[str, Tuple[jnp.ndarray, float, Tuple[int, int]]] = {}

        self._encode = jax.jit(
            lambda p, x: self.sam.apply(p, x, method=self.sam.encode_image)
        )
        self._decode = jax.jit(
            lambda p, emb, boxes: self.sam.apply(
                p, emb, boxes, method=self.sam.decode_boxes
            )
        )

    def reset_buffer(self):
        self._cache.clear()

    def _embed(self, file_name: str, image_bgr: np.ndarray):
        if file_name in self._cache:
            return self._cache[file_name]
        x, scale, hw = preprocess_image_for_sam(image_bgr, self.img_size)
        emb = self._encode(self.params, jnp.asarray(x))
        if len(self._cache) >= self.max_cache:
            self._cache.pop(next(iter(self._cache)))
        self._cache[file_name] = (emb, scale, hw)
        return emb, scale, hw

    def predict_boxes(
        self, file_name: str, image_bgr: np.ndarray, boxes_xyxy: np.ndarray,
        expand: float = 1.1,
    ) -> np.ndarray:
        """Refine boxes via box-prompted masks. boxes in original image coords;
        returns refined boxes in the same coords (falls back to input box when
        the mask is empty/non-finite, reference ``roi_heads.py:1262-1284``)."""
        emb, scale, (nh, nw) = self._embed(file_name, image_bgr)
        b = np.asarray(boxes_xyxy, np.float32)
        c = (b[:, :2] + b[:, 2:]) / 2
        half = (b[:, 2:] - b[:, :2]) / 2 * expand
        eb = np.concatenate([c - half, c + half], axis=1) * scale
        eb[:, 0::2] = np.clip(eb[:, 0::2], 0, nw)
        eb[:, 1::2] = np.clip(eb[:, 1::2], 0, nh)

        masks, iou = self._decode(self.params, emb, jnp.asarray(eb))
        best = jnp.argmax(iou, axis=1)
        sel = masks[jnp.arange(masks.shape[0]), best] > 0.0  # [B, 4H', 4W']
        # mask grid is 1/4 of input resolution relative scale: masks are
        # decoded at img_size/4; upscale factor to input coords:
        mh = sel.shape[1]
        up = self.img_size / mh
        fallback = jnp.asarray(eb)
        refined = jax.vmap(mask_to_box)(sel, fallback / up) * up
        refined = np.asarray(refined) / scale
        bad = ~np.isfinite(refined).all(axis=1)
        refined[bad] = b[bad]
        return refined
