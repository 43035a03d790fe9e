"""Pallas kernel vs jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wsovod_tpu.ops.pallas.roi_pool_kernel import roi_loop_pool_pallas, roi_pool_pallas
from wsovod_tpu.ops.roi_pool import roi_loop_pool, roi_pool


def _feat_rois(seed=0, h=20, w=24, c=8, n=10, scale=0.5):
    rng = np.random.RandomState(seed)
    feat = rng.uniform(0, 1, (h, w, c)).astype(np.float32)
    x1 = rng.uniform(0, w / scale * 0.6, (n, 1))
    y1 = rng.uniform(0, h / scale * 0.6, (n, 1))
    x2 = x1 + rng.uniform(3, w / scale * 0.35, (n, 1))
    y2 = y1 + rng.uniform(3, h / scale * 0.35, (n, 1))
    rois = np.concatenate([x1, y1, x2, y2], 1).astype(np.float32)
    return jnp.asarray(feat), jnp.asarray(rois)


def test_roi_pool_kernel_matches_reference():
    feat, rois = _feat_rois()
    ref = roi_pool(feat, rois, 7, 0.5)
    out = roi_pool_pallas(feat, rois, 7, 0.5, c_tile=8, roi_block=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_roi_pool_kernel_degenerate_rois():
    feat = jnp.ones((8, 8, 4))
    rois = jnp.asarray(
        np.array([[0, 0, 0, 0], [100, 100, 130, 130], [2, 2, 30, 30]], np.float32)
    )
    ref = roi_pool(feat, rois, 7, 0.25)
    out = roi_pool_pallas(feat, rois, 7, 0.25, c_tile=4, roi_block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_roi_loop_pool_kernel_matches_reference():
    feat, rois = _feat_rois(seed=3, h=16, w=20, c=4, n=6)
    ref = roi_loop_pool(feat, rois, 7, 0.5)
    out = roi_loop_pool_pallas(
        feat, rois, 7, 0.5, c_tile=4, roi_block=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_roi_align_kernel_matches_reference():
    from wsovod_tpu.ops.pallas.roi_align_kernel import roi_align_pallas
    from wsovod_tpu.ops.roi_pool import roi_align

    feat, rois = _feat_rois(seed=5, h=24, w=28, c=8, n=8)
    ref = roi_align(feat, rois, 7, 0.5, sampling_ratio=2, aligned=True)
    out = roi_align_pallas(
        feat, rois, 7, 0.5, sampling_ratio=2, win=24, c_tile=8, roi_block=4,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_roi_align_exact_kernel_fuzz():
    """Exact multi-pass kernel == gather roi_align for every ROI size,
    including right/bottom-edge boxes and an unaligned feature width."""
    from wsovod_tpu.ops.pallas.roi_align_kernel import roi_align_pallas_exact
    from wsovod_tpu.ops.roi_pool import roi_align

    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(61, 100, 256).astype(np.float32))
    n = 48
    r = rng.rand(n, 4)
    cx, cy = r[:, 0] * 800, r[:, 1] * 488
    sz = rng.choice([15, 50, 120, 300, 700], n)
    w2, h2 = sz * (0.5 + r[:, 2]), sz * (0.5 + r[:, 3])
    rois = np.stack(
        [np.clip(cx - w2, 0, 799.9), np.clip(cy - h2, 0, 487.9),
         np.clip(cx + w2, 0, 799.9), np.clip(cy + h2, 0, 487.9)], 1
    ).astype(np.float32)
    rois = jnp.asarray(rois)
    ref = roi_align(feat, rois, output_size=7, spatial_scale=0.125,
                    sampling_ratio=2)
    out = roi_align_pallas_exact(
        feat, rois, output_size=7, spatial_scale=0.125, sampling_ratio=2,
        c_tile=128, roi_block=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
