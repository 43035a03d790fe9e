"""Debug visualization: pseudo-GT / proposal / prediction dumps.

Reference ``wsovod/modeling/roi_heads/roi_heads.py:1345-1564``
(``_vis_pgt``/``_vis_prediction``/``_vis_proposal``/``_vis_box`` write
annotated PNGs under OUTPUT_DIR every VIS_PERIOD iterations, and
``_save_proposal_test`` dumps per-image proposal .npy when VIS_TEST).

Host-side (cv2) — called from the trainer on fetched arrays, never inside
jit.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

_COLORS = [
    (0, 113, 188), (216, 82, 24), (236, 176, 31), (125, 46, 141),
    (118, 171, 47), (76, 189, 237), (161, 19, 46), (76, 76, 76),
]


def draw_boxes(
    image_bgr: np.ndarray,
    boxes: np.ndarray,
    scores: Optional[np.ndarray] = None,
    classes: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    top_k: int = 100,
) -> np.ndarray:
    import cv2

    img = np.ascontiguousarray(image_bgr.astype(np.uint8))
    order = np.argsort(-scores)[:top_k] if scores is not None else range(min(len(boxes), top_k))
    for i in order:
        b = boxes[i].astype(int)
        c = int(classes[i]) if classes is not None else 0
        color = _COLORS[c % len(_COLORS)]
        cv2.rectangle(img, (b[0], b[1]), (b[2], b[3]), color, 2)
        label = ""
        if class_names is not None and classes is not None:
            label = class_names[c]
        if scores is not None:
            label += f" {float(scores[i]):.2f}"
        if label:
            cv2.putText(img, label, (b[0], max(b[1] - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1)
    return img


def vis_pgt(
    output_dir: str,
    prefix: str,
    suffix: str,
    iteration: int,
    image_bgr: np.ndarray,
    boxes: np.ndarray,
    scores: Optional[np.ndarray] = None,
    classes: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
):
    import cv2

    d = os.path.join(output_dir, prefix + suffix)
    os.makedirs(d, exist_ok=True)
    img = draw_boxes(image_bgr, boxes, scores, classes, class_names)
    cv2.imwrite(os.path.join(d, f"i{iteration:07d}.png"), img)


def save_proposals_npy(output_dir: str, image_id, boxes: np.ndarray, scores: np.ndarray):
    """VIS_TEST proposal dump (reference ``_save_proposal_test``)."""
    d = os.path.join(output_dir, "proposals_test")
    os.makedirs(d, exist_ok=True)
    np.save(os.path.join(d, f"{image_id}_boxes.npy"), boxes)
    np.save(os.path.join(d, f"{image_id}_scores.npy"), scores)
