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


def test_fused_ad_wrapper_grads():
    """roi_align_fused_ad: forward matches, grads match the gather-path
    autodiff on valid rows (invalid rows' gate grad is immaterial — the
    (objectness+1)*valid chain multiplies it by 0)."""
    from wsovod_tpu.ops.pallas import roi_align_fused as raf

    raf._INTERPRET = True
    try:
        rng = np.random.RandomState(4)
        b, h, w, c = 2, 16, 20, 128
        scale = 0.25
        feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        n = 8
        xy = rng.uniform(0, 40, (b, n, 2))
        wh = rng.uniform(4, 30, (b, n, 2))
        rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
        valid = jnp.asarray(rng.rand(b, n) > 0.25)
        gate = (jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32)) + 1.0) * valid
        rois = jnp.where(valid[..., None], rois, 0.0)
        cot = jnp.asarray(rng.randn(b, n, 7, 7, c).astype(np.float32))

        def f_fused(f, g):
            o = raf.roi_align_fused_ad(f, rois, g, 0, None, 7, scale, 2)
            return jnp.sum(o * cot)

        def f_ref(f, g):
            o = _ref_pool(f, rois, g, scale)
            return jnp.sum(o * cot)

        assert np.allclose(f_fused(feat, gate), f_ref(feat, gate), rtol=1e-4, atol=1e-4)
        gf1, gg1 = jax.grad(f_fused, (0, 1))(feat, gate)
        gf2, gg2 = jax.grad(f_ref, (0, 1))(feat, gate)
        np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2), rtol=1e-4, atol=1e-4)
        v = np.asarray(valid)
        np.testing.assert_allclose(
            np.asarray(gg1)[v], np.asarray(gg2)[v], rtol=1e-4, atol=1e-4
        )
        assert np.all(np.asarray(gg1)[~v] == 0.0)
    finally:
        raf._INTERPRET = False


def test_chunked_fc1_matches_dense_general():
    """ChunkedDenseGeneral == nn.DenseGeneral over (h,w,c) with shared params."""
    import flax.linen as nn

    from wsovod_tpu.models.box_head import ChunkedDenseGeneral

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(3, 11, 7, 7, 256).astype(np.float32))
    dg = nn.DenseGeneral(
        64, axis=(-3, -2, -1),
        kernel_init=nn.initializers.normal(0.005),
        bias_init=nn.initializers.constant(0.1),
    )
    params = dg.init(jax.random.PRNGKey(0), x)
    want = dg.apply(params, x)
    ch = ChunkedDenseGeneral(64, in_shape=(7, 7, 256))
    got = ch.apply(params, [x[..., :128], x[..., 128:]])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_hwnc_layout():
    """hwnc_out=True returns [B, P, P, N, C] == transpose of the nhwc output;
    AD wrapper grads agree between layouts."""
    from wsovod_tpu.ops.pallas import roi_align_fused as raf

    rng = np.random.RandomState(6)
    b, h, w, c = 2, 16, 20, 128
    scale = 0.25
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    n = 8
    xy = rng.uniform(0, 40, (b, n, 2))
    wh = rng.uniform(4, 30, (b, n, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2.0, (b, n)).astype(np.float32))

    o_nhwc = raf.roi_align_fused_batched(
        feat, rois, gate, spatial_scale=scale, interpret=True
    )
    o_hwnc = raf.roi_align_fused_batched(
        feat, rois, gate, spatial_scale=scale, interpret=True, hwnc_out=True
    )
    np.testing.assert_allclose(
        np.asarray(o_hwnc), np.asarray(jnp.transpose(o_nhwc, (0, 2, 3, 1, 4))),
        rtol=1e-6, atol=1e-6,
    )

    raf._INTERPRET = True
    try:
        cot = jnp.asarray(rng.randn(b, 7, 7, n, c).astype(np.float32))

        def f_hwnc(f, g):
            o = raf.roi_align_fused_ad(f, rois, g, 0, None, 7, scale, 2, True)
            return jnp.sum(o * cot)

        def f_nhwc(f, g):
            o = raf.roi_align_fused_ad(f, rois, g, 0, None, 7, scale, 2, False)
            return jnp.sum(o * jnp.transpose(cot, (0, 3, 1, 2, 4)))

        gf1, gg1 = jax.grad(f_hwnc, (0, 1))(feat, gate)
        gf2, gg2 = jax.grad(f_nhwc, (0, 1))(feat, gate)
        np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gg1), np.asarray(gg2), rtol=1e-5, atol=1e-5)
    finally:
        raf._INTERPRET = False


def test_chunked_fc1_hwnc_layout():
    import flax.linen as nn

    from wsovod_tpu.models.box_head import ChunkedDenseGeneral

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(3, 11, 7, 7, 256).astype(np.float32))  # [B,N,7,7,C]
    dg = nn.DenseGeneral(
        64, axis=(-3, -2, -1),
        kernel_init=nn.initializers.normal(0.005),
        bias_init=nn.initializers.constant(0.1),
    )
    params = dg.init(jax.random.PRNGKey(0), x)
    want = dg.apply(params, x)
    x_hwnc = jnp.transpose(x, (0, 2, 3, 1, 4))  # [B,7,7,N,C]
    ch = ChunkedDenseGeneral(64, in_shape=(7, 7, 256), chunk_layout="hwnc")
    got = ch.apply(params, [x_hwnc[..., :128], x_hwnc[..., 128:]])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_bf16_slab_path():
    """The bf16 MXU-slab path (guard-row reads, wy folded into the LHS) must
    match the f32 gather reference within bf16 tolerance, including ROIs
    touching the bottom/right edges."""
    rng = np.random.RandomState(8)
    b, h, w, c = 2, 20, 28, 128
    scale = 0.25
    feat32 = rng.randn(b, h, w, c).astype(np.float32)
    n = 12
    xy = rng.uniform(0, 60, (b, n, 2))
    wh = rng.uniform(4, 60, (b, n, 2))
    rois = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    rois[0, 0] = [0, h / scale - 10, 30, h / scale]      # bottom edge
    rois[0, 1] = [w / scale - 25, 0, w / scale, 40]       # right edge
    rois[0, 2] = [0, 0, w / scale, h / scale]             # full frame
    rois[0, 3] = [10, h / scale - 2, 30, h / scale + 6]   # past the bottom
    gate = rng.uniform(0.5, 2.0, (b, n)).astype(np.float32)

    got = roi_align_fused_batched(
        jnp.asarray(feat32).astype(jnp.bfloat16), jnp.asarray(rois),
        jnp.asarray(gate), spatial_scale=scale, roi_block=8, interpret=True,
    )
    want = _ref_pool(jnp.asarray(feat32), jnp.asarray(rois), jnp.asarray(gate), scale)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=3e-2, atol=3e-2
    )


def test_chunked_fc1_int8_quant_accuracy():
    """int8 dynamic-quant fc1 vs full precision: small relative error, same
    params (quant is a pure compute-path switch)."""
    import flax.linen as nn

    from wsovod_tpu.models.box_head import ChunkedDenseGeneral

    rng = np.random.RandomState(9)
    x = jnp.asarray(np.abs(rng.randn(2, 7, 7, 33, 256)).astype(np.float32))
    dg = nn.DenseGeneral(
        64, axis=(-3, -2, -1),
        kernel_init=nn.initializers.normal(0.005),
        bias_init=nn.initializers.constant(0.1),
    )
    params = dg.init(jax.random.PRNGKey(0), jnp.transpose(x, (0, 3, 1, 2, 4)))
    want = np.asarray(dg.apply(params, jnp.transpose(x, (0, 3, 1, 2, 4))))
    ch = ChunkedDenseGeneral(64, in_shape=(7, 7, 256), chunk_layout="hwnc", quant="int8")
    got = np.asarray(ch.apply(params, [x[..., :128], x[..., 128:]]))
    denom = np.abs(want).max()
    rel = np.abs(got - want) / max(denom, 1e-8)
    assert np.percentile(rel, 99) < 0.02, np.percentile(rel, 99)
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-9)
    assert cos > 0.999, cos
