"""Fused image-batched resident-tile ROIAlign kernel vs the gather reference.

Runs the Pallas kernel in interpret mode on CPU; the same code path runs
compiled on TPU. Checks: exactness across ROI sizes (narrow/wide split),
gate folding, channel chunking (c_base/c_take), and degenerate ROIs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsovod_tpu.ops.pallas.roi_align_fused import roi_align_fused_batched
from wsovod_tpu.ops.roi_pool import roi_align


def _ref_pool(feat, rois, gate, scale, sampling_ratio=2):
    outs = []
    for b in range(feat.shape[0]):
        o = roi_align(
            feat[b], rois[b], output_size=7, spatial_scale=scale,
            sampling_ratio=sampling_ratio, aligned=True,
        )
        outs.append(o * gate[b][:, None, None, None])
    return jnp.stack(outs)


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_matches_gather(seed):
    rng = np.random.RandomState(seed)
    b, h, w, c = 2, 24, 33, 256  # W not a multiple of 8 (pad path)
    scale = 0.25
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    n = 24
    # sizes spanning the narrow/wide split (ext 54 feature px = 216 img px)
    xy = rng.uniform(0, 100, (b, n, 2))
    wh = rng.uniform(4, 130, (b, n, 2))
    rois = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    # edge cases: out-of-bounds, full-frame, degenerate, right-edge
    rois[0, 0] = [-20, -10, 40, 40]
    rois[0, 1] = [0, 0, w / scale, h / scale]
    rois[0, 2] = [50, 50, 50, 50]
    rois[0, 3] = [w / scale - 30, 4, w / scale + 10, 60]
    rois[1, 0] = [w / scale - 250, h / scale - 40, w / scale, h / scale]
    gate = rng.uniform(0.5, 2.0, (b, n)).astype(np.float32)
    gate[0, 4] = 0.0  # invalid ROI

    got = roi_align_fused_batched(
        feat, jnp.asarray(rois), jnp.asarray(gate),
        spatial_scale=scale, roi_block=8, interpret=True,
    )
    want = _ref_pool(feat, jnp.asarray(rois), jnp.asarray(gate), scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_fused_channel_chunking():
    rng = np.random.RandomState(2)
    b, h, w, c = 1, 16, 16, 512
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    rois = jnp.asarray(rng.uniform(0, 40, (b, 8, 2)))
    rois = jnp.concatenate([rois, rois + 20.0], -1).astype(jnp.float32)
    gate = jnp.ones((b, 8), jnp.float32)

    full = roi_align_fused_batched(
        feat, rois, gate, spatial_scale=0.25, interpret=True
    )
    lo = roi_align_fused_batched(
        feat, rois, gate, c_base=0, c_take=256, spatial_scale=0.25, interpret=True
    )
    hi = roi_align_fused_batched(
        feat, rois, gate, c_base=256, c_take=256, spatial_scale=0.25, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(jnp.concatenate([lo, hi], axis=-1)),
        rtol=1e-5, atol=1e-6,
    )


def test_fused_narrow_image():
    # W smaller than the narrow window: wide-only static path
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(1, 12, 9, 128).astype(np.float32))
    rois = jnp.asarray([[[2.0, 3.0, 30.0, 40.0], [0.0, 0.0, 36.0, 48.0]]])
    gate = jnp.ones((1, 2), jnp.float32)
    got = roi_align_fused_batched(feat, rois, gate, spatial_scale=0.25, interpret=True)
    want = _ref_pool(feat, rois, gate, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
