"""Anchor generation (d2 ``DefaultAnchorGenerator`` semantics).

Anchors are a pure function of static feature-map shape, stride, sizes and
aspect ratios, so they are computed in numpy at trace time and embedded as
constants — no device compute. Ordering parity with d2 matters because the
RPN head's A output channels pair positionally with the cell anchors:
cell anchors are size-major/aspect-minor, grid anchors are position-major
(row-major H, W) with the A cell anchors minor.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def generate_cell_anchors(
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """XYXY anchors centered at (0, 0). [len(sizes)*len(aspect_ratios), 4]."""
    anchors = []
    for size in sizes:
        area = size ** 2.0
        for ar in aspect_ratios:
            w = float(np.sqrt(area / ar))
            h = w * ar
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.array(anchors, dtype=np.float32)


class AnchorGenerator:
    """Per-level grid anchors; one entry of ``sizes``/``aspect_ratios`` per
    feature level (broadcast if a single entry is given, as in d2)."""

    def __init__(
        self,
        sizes,
        aspect_ratios,
        strides: Sequence[int],
        offset: float = 0.0,
    ):
        self.strides = list(strides)
        n = len(self.strides)
        sizes = list(sizes)
        aspect_ratios = list(aspect_ratios)
        if len(sizes) == 1:
            sizes = sizes * n
        if len(aspect_ratios) == 1:
            aspect_ratios = aspect_ratios * n
        assert len(sizes) == n and len(aspect_ratios) == n
        self.cell_anchors = [
            generate_cell_anchors(s, a) for s, a in zip(sizes, aspect_ratios)
        ]
        self.offset = offset

    @property
    def num_anchors(self) -> List[int]:
        return [c.shape[0] for c in self.cell_anchors]

    def grid_anchors(self, grid_sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
        """[(H, W)] -> list of [H*W*A, 4] float32 arrays."""
        out = []
        for (h, w), stride, cell in zip(grid_sizes, self.strides, self.cell_anchors):
            shifts_x = (np.arange(w, dtype=np.float32) + self.offset) * stride
            shifts_y = (np.arange(h, dtype=np.float32) + self.offset) * stride
            sx, sy = np.meshgrid(shifts_x, shifts_y)  # [H, W]
            shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
            anchors = (shifts + cell[None]).reshape(-1, 4)
            out.append(anchors.astype(np.float32))
        return out


def build_anchor_generator(cfg, strides: Sequence[int]) -> AnchorGenerator:
    return AnchorGenerator(
        sizes=cfg.MODEL.ANCHOR_GENERATOR.SIZES,
        aspect_ratios=cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
        strides=strides,
        offset=cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
    )
