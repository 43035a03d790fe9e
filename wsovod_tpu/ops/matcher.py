"""Proposal-to-GT matcher (d2 ``Matcher`` semantics, mask-aware).

Given an [M, N] match-quality matrix (M padded ground truths x N padded
predictions), assigns each prediction its best GT and a label derived from
threshold bands, with optional ``allow_low_quality_matches`` that force-labels,
for every GT, the predictions tying its best quality (reference usage:
``rpn.py:269-271`` with IOU_THRESHOLDS [0.2, 0.6] and WSL sampling matchers
``roi_heads.py:592-607``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


class Matcher:
    def __init__(
        self,
        thresholds: Sequence[float],
        labels: Sequence[int],
        allow_low_quality_matches: bool = False,
    ):
        thresholds = list(thresholds)
        assert thresholds == sorted(thresholds)
        assert len(labels) == len(thresholds) + 1
        assert all(l in (-1, 0, 1) for l in labels)
        self.thresholds = [-float("inf")] + thresholds + [float("inf")]
        self.labels = list(labels)
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(
        self,
        match_quality: jnp.ndarray,
        gt_valid: jnp.ndarray | None = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Args:
          match_quality: [M, N] quality (e.g. IoU) of each (gt, pred) pair.
          gt_valid: optional [M] bool mask of real ground truths.

        Returns:
          matches: [N] int32 index of best gt per prediction (0 if no gt).
          match_labels: [N] int8 in {-1, 0, 1}.
        """
        m, n = match_quality.shape
        if gt_valid is not None:
            # Invalid gt rows must never win an argmax nor define thresholds.
            neg = jnp.asarray(-1.0, match_quality.dtype)
            match_quality = jnp.where(gt_valid[:, None], match_quality, neg)

        if m == 0:
            return (
                jnp.zeros((n,), jnp.int32),
                jnp.full((n,), self.labels[0], jnp.int8),
            )

        matched_vals = jnp.max(match_quality, axis=0)  # [N]
        matches = jnp.argmax(match_quality, axis=0).astype(jnp.int32)

        match_labels = jnp.full((n,), 1, dtype=jnp.int8)
        for lo, hi, label in zip(self.thresholds[:-1], self.thresholds[1:], self.labels):
            band = (matched_vals >= lo) & (matched_vals < hi)
            match_labels = jnp.where(band, jnp.int8(label), match_labels)

        if self.allow_low_quality_matches:
            # For each gt, its best quality; predictions achieving it get label 1.
            highest_per_gt = jnp.max(match_quality, axis=1, keepdims=True)  # [M,1]
            is_best = (match_quality == highest_per_gt) & (highest_per_gt > 0)
            if gt_valid is not None:
                is_best = is_best & gt_valid[:, None]
            pred_is_low_quality = jnp.any(is_best, axis=0)  # [N]
            match_labels = jnp.where(pred_is_low_quality, jnp.int8(1), match_labels)

        return matches, match_labels
