"""Fused image-batched resident-tile max-pool kernels (ROIPool/ROILoopPool)
vs the jnp references, plus the int8 emission path and the model-level
fused-chunk wiring.

Interpret mode on CPU; the same code paths run compiled on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsovod_tpu.ops.pallas import roi_pool_fused as rpf
from wsovod_tpu.ops.roi_pool import roi_loop_pool, roi_pool


def _mk(seed, b=2, h=20, w=29, c=128, n=24, wide_frac=0.3):
    rng = np.random.RandomState(seed)
    feat = rng.randn(b, h, w, c).astype(np.float32)
    xy = rng.uniform(0, 90, (b, n, 2))
    wh = rng.uniform(2, 40, (b, n, 2))
    wide = rng.rand(b, n, 1) < wide_frac
    wh = np.where(wide, rng.uniform(60, 140, (b, n, 2)), wh)
    rois = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    # edge cases: full-frame, degenerate, right/bottom edge, pad rows
    rois[0, 0] = [0, 0, 4 * w, 4 * h]
    rois[0, 1] = [50, 50, 50, 50]
    rois[0, 2] = [4 * w - 30, 4, 4 * w - 1, 60]
    rois[0, 3] = [3, 4 * h - 20, 40, 4 * h - 1]
    gate = rng.uniform(0.5, 2.0, (b, n)).astype(np.float32)
    gate[:, -2:] = 0.0
    rois[:, -2:] = 0.0
    return jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(gate)


def _ref_plain(feat, rois, gate, scale):
    ref = jnp.stack(
        [roi_pool(feat[b], rois[b], 7, scale) for b in range(feat.shape[0])]
    )
    return np.asarray(ref * gate[:, :, None, None, None])


def _ref_loop(feat, rois, gate, scale):
    ref = jnp.stack(
        [roi_loop_pool(feat[b], rois[b], 7, scale) for b in range(feat.shape[0])],
        axis=1,
    )
    return np.asarray(ref * gate[None, :, :, None, None, None])


@pytest.mark.parametrize("scale", [0.25, 0.125])
def test_fused_roi_pool_exact(scale):
    feat, rois, gate = _mk(0)
    out = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=scale, interpret=True
    )
    got = np.transpose(np.asarray(out), (0, 3, 1, 2, 4))
    want = _ref_plain(feat, rois, gate, scale)
    np.testing.assert_array_equal(got, want)


def test_fused_roi_pool_bf16_exact():
    # max is exact in bf16: fused bf16 == reference over the same bf16 values
    feat, rois, gate = _mk(1)
    fb = feat.astype(jnp.bfloat16)
    out = rpf.roi_pool_fused_batched(
        fb, rois, gate, spatial_scale=0.25, interpret=True
    )
    got = np.transpose(np.asarray(out, np.float32), (0, 3, 1, 2, 4))
    want = _ref_plain(fb.astype(jnp.float32), rois, gate, 0.25)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("scale", [0.25])
def test_fused_roi_loop_pool_exact(scale):
    feat, rois, gate = _mk(2)
    out = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=scale, loop_pool=True, interpret=True
    )
    got = np.transpose(np.asarray(out), (0, 1, 4, 2, 3, 5))
    want = _ref_loop(feat, rois, gate, scale)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", [14, 6, 8])
def test_fused_roi_pool_nondefault_resolution(p):
    """Pooled resolutions where p*5 is NOT 8-aligned (d2-default 14, odd 6)
    must be exact through the wide pyramid stage B — the round-4 kr_pad
    rounding to 8 alone crashed the reshape-by-S at p=14 (70 -> 72)."""
    feat, rois, gate = _mk(23, w=60, n=16, wide_frac=0.6)
    out = rpf.roi_pool_fused_batched(
        feat, rois, gate, output_size=p, spatial_scale=0.25, interpret=True
    )
    got = np.transpose(np.asarray(out), (0, 3, 1, 2, 4))
    ref = jnp.stack(
        [roi_pool(feat[b], rois[b], p, 0.25) for b in range(feat.shape[0])]
    )
    want = np.asarray(ref * gate[:, :, None, None, None])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", [14, 6])
def test_fused_roi_loop_pool_nondefault_resolution(p):
    feat, rois, gate = _mk(29, w=60, n=16, wide_frac=0.6)
    out = rpf.roi_pool_fused_batched(
        feat, rois, gate, output_size=p, spatial_scale=0.25, loop_pool=True,
        interpret=True,
    )
    got = np.transpose(np.asarray(out), (0, 1, 4, 2, 3, 5))
    ref = jnp.stack(
        [roi_loop_pool(feat[b], rois[b], p, 0.25) for b in range(feat.shape[0])],
        axis=1,
    )
    want = np.asarray(ref * gate[None, :, :, None, None, None])
    np.testing.assert_array_equal(got, want)


def test_fused_pool_channel_chunking():
    feat, rois, gate = _mk(3, c=256)
    full = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=0.25, interpret=True
    )
    lo = rpf.roi_pool_fused_batched(
        feat, rois, gate, 0, c_take=128, spatial_scale=0.25, interpret=True
    )
    hi = rpf.roi_pool_fused_batched(
        feat, rois, gate, 128, c_take=128, spatial_scale=0.25, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(full), np.asarray(jnp.concatenate([lo, hi], axis=-1))
    )


def test_fused_pool_narrow_image():
    # W smaller than the narrow window: wide-only static path
    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.randn(1, 12, 9, 128).astype(np.float32))
    rois = jnp.asarray([[[2.0, 3.0, 30.0, 40.0], [0.0, 0.0, 36.0, 48.0]]])
    gate = jnp.ones((1, 2), jnp.float32)
    out = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=0.25, interpret=True
    )
    got = np.transpose(np.asarray(out), (0, 3, 1, 2, 4))
    np.testing.assert_array_equal(got, _ref_plain(feat, rois, gate, 0.25))


@pytest.mark.parametrize("loop", [False, True])
def test_fused_pool_int8_emission(loop):
    feat, rois, gate = _mk(5, n=16)
    q, s = rpf.roi_pool_fused_batched(
        feat, rois, gate, quant="int8", loop_pool=loop, spatial_scale=0.25,
        interpret=True,
    )
    assert q.dtype == jnp.int8
    if loop:
        recon = np.asarray(q).astype(np.float32) * np.asarray(s)[:, :, 0, None, None, :, None]
        recon = np.transpose(recon, (0, 1, 4, 2, 3, 5))
        want = _ref_loop(feat, rois, gate, 0.25)
        denom = np.maximum(np.abs(want).max(axis=(3, 4, 5), keepdims=True), 1e-6)
    else:
        recon = np.asarray(q).astype(np.float32) * np.asarray(s)[:, 0, None, None, :, None]
        recon = np.transpose(recon, (0, 3, 1, 2, 4))
        want = _ref_plain(feat, rois, gate, 0.25)
        denom = np.maximum(np.abs(want).max(axis=(2, 3, 4), keepdims=True), 1e-6)
    assert (np.abs(recon - want) / denom).max() < 1.0 / 127.0
    # pad rows: zero scale -> zero reconstruction
    assert np.all(np.asarray(s)[..., -2:] == 0.0)


def test_fused_align_int8_emission():
    from wsovod_tpu.ops.pallas.roi_align_fused import roi_align_fused_batched
    from wsovod_tpu.ops.roi_pool import roi_align

    feat, rois, gate = _mk(6, n=16)
    q, s = roi_align_fused_batched(
        feat, rois, gate, spatial_scale=0.25, hwnc_out=True, quant="int8",
        interpret=True,
    )
    assert q.dtype == jnp.int8
    recon = np.asarray(q).astype(np.float32) * np.asarray(s)[:, 0, None, None, :, None]
    recon = np.transpose(recon, (0, 3, 1, 2, 4))
    ref = jnp.stack(
        [
            roi_align(feat[b], rois[b], 7, 0.25, sampling_ratio=2)
            for b in range(feat.shape[0])
        ]
    )
    want = np.asarray(ref * gate[:, :, None, None, None])
    denom = np.maximum(np.abs(want).max(axis=(2, 3, 4), keepdims=True), 1e-6)
    assert (np.abs(recon - want) / denom).max() < 1.5 / 127.0


@pytest.mark.parametrize("loop", [False, True])
def test_fused_pool_ad_grads(loop):
    rpf._INTERPRET = True
    try:
        rng = np.random.RandomState(7)
        feat, rois, gate_raw = _mk(7, n=8, h=14, w=18)
        valid = jnp.asarray(rng.rand(2, 8) > 0.25)
        gate = (gate_raw + 1.0) * valid
        rois = jnp.where(valid[..., None], rois, 0.0)

        def f_fused(f, g):
            o = rpf.roi_pool_fused_ad(f, rois, g, 0, None, 7, 0.25, loop, 1.8)
            return jnp.sum(o * jnp.arange(o.size).reshape(o.shape) * 1e-3)

        def f_ref(f, g):
            if loop:
                pooled = jnp.stack(
                    [roi_loop_pool(f[b], rois[b], 7, 0.25) for b in range(2)],
                    axis=1,
                )
                o = pooled * g[None, :, :, None, None, None]
                o = jnp.transpose(o, (0, 1, 3, 4, 2, 5))
            else:
                pooled = jnp.stack(
                    [roi_pool(f[b], rois[b], 7, 0.25) for b in range(2)]
                )
                o = pooled * g[:, :, None, None, None]
                o = jnp.transpose(o, (0, 2, 3, 1, 4))
            return jnp.sum(o * jnp.arange(o.size).reshape(o.shape) * 1e-3)

        assert np.allclose(f_fused(feat, gate), f_ref(feat, gate), rtol=1e-5)
        gf1, gg1 = jax.grad(f_fused, (0, 1))(feat, gate)
        gf2, gg2 = jax.grad(f_ref, (0, 1))(feat, gate)
        np.testing.assert_allclose(
            np.asarray(gf1), np.asarray(gf2), rtol=1e-4, atol=1e-4
        )
        v = np.asarray(valid)
        np.testing.assert_allclose(
            np.asarray(gg1)[v], np.asarray(gg2)[v], rtol=1e-4, atol=1e-3
        )
        assert np.all(np.asarray(gg1)[~v] == 0.0)
    finally:
        rpf._INTERPRET = False


def test_chunked_fc1_prequantized_tuples():
    """ChunkedDenseGeneral with (int8, scale) tuple chunks reproduces the
    full-precision result within int8 tolerance; triple (6-d) chunks match
    per-region application of the plain DenseGeneral."""
    import flax.linen as nn

    from wsovod_tpu.models.box_head import ChunkedDenseGeneral

    rng = np.random.RandomState(8)
    x = np.abs(rng.randn(2, 7, 7, 17, 256)).astype(np.float32)  # hwnc
    dg = nn.DenseGeneral(
        64, axis=(-3, -2, -1),
        kernel_init=nn.initializers.normal(0.005),
        bias_init=nn.initializers.constant(0.1),
    )
    x_nhwc = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2, 4))
    params = dg.init(jax.random.PRNGKey(0), x_nhwc)
    want = np.asarray(dg.apply(params, x_nhwc))

    def quantize(chunk):  # per-ROI maxabs over (h, w, c)
        maxabs = np.abs(chunk).max(axis=(1, 2, 4))
        scale = np.maximum(maxabs, 1e-20) / 127.0
        q = np.round(chunk / scale[:, None, None, :, None]).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(scale.astype(np.float32))

    ch = ChunkedDenseGeneral(64, in_shape=(7, 7, 256), chunk_layout="hwnc")
    got = np.asarray(
        ch.apply(params, [quantize(x[..., :128]), quantize(x[..., 128:])])
    )
    denom = np.abs(want).max()
    assert np.percentile(np.abs(got - want) / denom, 99) < 0.02

    # triple 6-d bf16 chunks == DenseGeneral applied per region
    x3 = rng.randn(3, 2, 7, 7, 17, 256).astype(np.float32)
    x3_nhwc = jnp.transpose(jnp.asarray(x3), (0, 1, 4, 2, 3, 5))
    want3 = np.asarray(dg.apply(params, x3_nhwc))
    got3 = np.asarray(
        ch.apply(params, [jnp.asarray(x3[..., :128]), jnp.asarray(x3[..., 128:])])
    )
    np.testing.assert_allclose(got3, want3, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pooler_type", ["ROIPool", "ROILoopPool", "ROIAlignV2"])
def test_model_level_fused_chunk_wiring(pooler_type, monkeypatch):
    """fused_chunk_pool -> ChunkedDenseGeneral reproduces the unfused
    pooler+gate+DenseGeneral DAN path at the module level (the wiring the
    flagship configs run on TPU)."""
    from wsovod_tpu.models.box_head import DiscriminativeAdaptationNeck
    from wsovod_tpu.models.poolers import ROIPooler

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    rpf._INTERPRET = True
    import wsovod_tpu.ops.pallas.roi_align_fused as raf

    raf._INTERPRET = True
    try:
        rng = np.random.RandomState(9)
        b, h, w, c, n = 2, 14, 18, 256, 12
        feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        xy = rng.uniform(0, 40, (b, n, 2))
        wh = rng.uniform(4, 30, (b, n, 2))
        rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
        valid = jnp.asarray(rng.rand(b, n) > 0.2)
        obj = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
        rois = jnp.where(valid[..., None], rois, 0.0)

        pooler = ROIPooler(
            7, scales=[0.25], pooler_type=pooler_type, roi_align_kernel="fused"
        )
        dan = DiscriminativeAdaptationNeck(fc_dims=(32,))
        chunks, unsort_idx = pooler.fused_chunk_pool(
            [feat], rois, obj, valid, train=False
        )
        assert chunks is not None and len(chunks) >= 1
        lay = dict(chunk_layout=pooler.chunk_layout_used, pooled_hw=(7, 7))
        params = dan.init(jax.random.PRNGKey(0), chunks, train=False, **lay)
        got = dan.apply(params, chunks, train=False, **lay)
        if unsort_idx is not None:
            # width-class-sorted rows (plain pools at inference) -> original
            idx = unsort_idx[..., None]
            if pooler.triple:
                idx = idx[None]
            got = jnp.take_along_axis(got, idx, axis=-2)
        got = np.asarray(got)

        # unfused reference: jnp pool + external gate + plain DAN
        from wsovod_tpu.ops.roi_pool import roi_align

        if pooler_type == "ROIPool":
            pooled = jnp.stack([roi_pool(feat[i], rois[i], 7, 0.25) for i in range(b)])
        elif pooler_type == "ROILoopPool":
            pooled = jnp.stack(
                [roi_loop_pool(feat[i], rois[i], 7, 0.25) for i in range(b)], axis=1
            )
        else:
            pooled = jnp.stack(
                [roi_align(feat[i], rois[i], 7, 0.25, sampling_ratio=2) for i in range(b)]
            )
        gate = ((obj + 1.0) * valid).astype(pooled.dtype)
        if pooler.triple:
            pooled = pooled * gate[None, :, :, None, None, None]
        else:
            pooled = pooled * gate[:, :, None, None, None]
        want = np.asarray(dan.apply(params, pooled, train=False))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    finally:
        rpf._INTERPRET = False
        raf._INTERPRET = False


def test_int8_vs_fp_inference_detections(monkeypatch):
    """The int8-vs-fp metric guard at module level: WSOVODROIHeads.inference
    with fused int8 emission vs the fp fused path — pre-NMS class probs must
    agree tightly (p99 rel err < 3%) and the top post-NMS detections must
    keep the same boxes. This is the CPU tier of the guard backing the int8
    default; the TPU tier (full bench model) is recorded in STATUS.md."""
    from wsovod_tpu.models.poolers import ROIPooler
    from wsovod_tpu.models.roi_heads import WSOVODROIHeads
    from wsovod_tpu.structures.instances import Instances
    import wsovod_tpu.ops.pallas.roi_align_fused as raf

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    rpf._INTERPRET = True
    raf._INTERPRET = True
    try:
        rng = np.random.RandomState(11)
        b, n, c = 1, 16, 256
        feats = {"res5": jnp.asarray(np.abs(rng.randn(b, 10, 14, c)).astype(np.float32))}
        xy = rng.uniform(0, 60, (b, n, 2))
        wh = rng.uniform(10, 40, (b, n, 2))
        proposals = Instances(
            jnp.ones((b, n), bool),
            proposal_boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
            objectness_logits=jnp.asarray(rng.rand(b, n).astype(np.float32)),
        )
        emb = jnp.asarray(rng.randn(4, 8).astype(np.float32))
        image_sizes = jnp.asarray([[80, 112]], jnp.int32)

        def build(quant):
            pooler = ROIPooler(
                7, scales=[1.0 / 8], pooler_type="ROIPool",
                roi_align_kernel="fused", fc1_quant=quant,
            )
            return WSOVODROIHeads(
                num_classes=4, pooler=pooler, dan_fc_dims=(32, 32),
                refine_k=1, refine_reg=(False,), ov_weight_dim=8,
                rpn_on=False, dan_fc1_quant=quant,
            )

        heads_fp = build("none")
        heads_q = build("int8")
        params = heads_fp.init(
            {"params": jax.random.PRNGKey(0)},
            feats, proposals, jnp.asarray([[0, 1]]), jnp.ones((1, 2), bool),
            embeddings=emb, rng=jax.random.PRNGKey(1),
        )
        det_fp, probs_fp, boxes_fp = heads_fp.apply(
            params, feats, proposals, image_sizes, embeddings=emb,
            method=heads_fp.inference,
        )
        det_q, probs_q, boxes_q = heads_q.apply(
            params, feats, proposals, image_sizes, embeddings=emb,
            method=heads_q.inference,
        )
        pf, pq = np.asarray(probs_fp), np.asarray(probs_q)
        denom = max(np.abs(pf).max(), 1e-8)
        assert np.percentile(np.abs(pf - pq) / denom, 99) < 0.03
        # decoded boxes identical (regression disabled -> proposals pass through)
        np.testing.assert_allclose(
            np.asarray(boxes_fp), np.asarray(boxes_q), rtol=1e-3, atol=0.5
        )
        # top surviving detection matches
        vf, vq = np.asarray(det_fp.valid[0]), np.asarray(det_q.valid[0])
        assert vf.sum() > 0 and vq.sum() > 0
        bf = np.asarray(det_fp.boxes[0])[vf]
        bq = np.asarray(det_q.boxes[0])[vq]
        np.testing.assert_allclose(bf[0], bq[0], atol=1.0)
    finally:
        rpf._INTERPRET = False
        raf._INTERPRET = False


def test_branch_partition_roundtrip():
    """branch_partition produces branch-pure 8-blocks, gate-0 pads, and an
    exact unsort permutation."""
    from wsovod_tpu.models.poolers import branch_partition

    rng = np.random.RandomState(3)
    b, n, n_br = 2, 21, 3
    boxes = jnp.asarray(rng.randn(b, n, 4).astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2, (b, n)).astype(np.float32))
    branch = jnp.asarray(rng.randint(0, n_br, (b, n)))
    boxes_s, gate_s, branch_s, unsort = branch_partition(boxes, gate, branch, n_br)
    n_p = boxes_s.shape[1]
    assert n_p % 8 == 0 and gate_s.shape == (b, n_p)
    # blocks are branch-pure
    bb = np.asarray(branch_s).reshape(b, -1, 8)
    assert (bb == bb[:, :, :1]).all()
    # unsort restores the original rows exactly
    back_b = np.take_along_axis(np.asarray(boxes_s), np.asarray(unsort)[..., None], 1)
    back_g = np.take_along_axis(np.asarray(gate_s), np.asarray(unsort), 1)
    np.testing.assert_array_equal(back_b, np.asarray(boxes))
    np.testing.assert_array_equal(back_g, np.asarray(gate))
    # sorted rows carry their own branch; pads have gate 0
    for bi in range(b):
        pos = np.asarray(unsort)[bi]
        assert (np.asarray(branch_s)[bi][pos] == np.asarray(branch)[bi]).all()
        pad_mask = np.ones(n_p, bool)
        pad_mask[pos] = False
        assert (np.asarray(gate_s)[bi][pad_mask] == 0).all()


@pytest.mark.parametrize("loop", [False, True])
def test_fused_branched_mrrp(loop):
    """Branched fused kernel == per-branch jnp pool + per-ROI branch select
    (the reference's MRRP pool-all-and-select semantics)."""
    from wsovod_tpu.models.poolers import branch_partition

    rng = np.random.RandomState(7)
    b, n_br, h, w, c, n = 2, 3, 16, 22, 128, 19
    scale = 0.25
    feat = jnp.asarray(rng.randn(n_br * b, h, w, c).astype(np.float32))
    xy = rng.uniform(0, 60, (b, n, 2))
    wh = rng.uniform(4, 30, (b, n, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2, (b, n)).astype(np.float32))
    branch = jnp.asarray(rng.randint(0, n_br, (b, n)))

    boxes_s, gate_s, branch_s, unsort = branch_partition(rois, gate, branch, n_br)
    rpf._INTERPRET = True
    try:
        out = rpf.roi_pool_fused_branched_ad(
            feat, boxes_s, gate_s, branch_s.astype(jnp.float32), 0, None, 7,
            scale, loop, 1.8,
        )
    finally:
        rpf._INTERPRET = False
    # -> [(3,) B, N, 7, 7, C] in proposal order
    if loop:
        got = np.transpose(np.asarray(out), (0, 1, 4, 2, 3, 5))
        got = np.take_along_axis(
            got, np.asarray(unsort)[None, :, :, None, None, None], axis=2
        )
    else:
        got = np.transpose(np.asarray(out), (0, 3, 1, 2, 4))
        got = np.take_along_axis(
            got, np.asarray(unsort)[:, :, None, None, None], axis=1
        )

    pool1 = roi_loop_pool if loop else roi_pool
    per_img = []
    for bi in range(b):
        pooled_all = jnp.stack(
            [pool1(feat[br * b + bi], rois[bi], 7, scale) for br in range(n_br)]
        )
        sel = branch[bi]
        sel = (
            sel[None, None, :, None, None, None]
            if loop
            else sel[None, :, None, None, None]
        )
        per_img.append(jnp.take_along_axis(pooled_all, sel, axis=0)[0])
    want = jnp.stack(per_img, axis=1 if loop else 0)
    gx = gate[:, :, None, None, None]
    want = np.asarray(want * (gx[None] if loop else gx))
    np.testing.assert_array_equal(got, want)


def test_model_level_fused_mrrp_wiring(monkeypatch):
    """MRRP fused_chunk_pool + DAN + unsort == unfused MRRP pooler path."""
    from wsovod_tpu.models.box_head import DiscriminativeAdaptationNeck
    from wsovod_tpu.models.poolers import ROIPooler

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    rpf._INTERPRET = True
    try:
        rng = np.random.RandomState(11)
        b, n_br, h, w, c, n = 2, 2, 12, 15, 128, 10
        feat = jnp.asarray(rng.randn(n_br * b, h, w, c).astype(np.float32))
        xy = rng.uniform(0, 30, (b, n, 2))
        wh = rng.uniform(4, 20, (b, n, 2))
        rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
        valid = jnp.asarray(rng.rand(b, n) > 0.2)
        obj = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
        rois = jnp.where(valid[..., None], rois, 0.0)
        level_ids = jnp.asarray(rng.randint(0, 3, (b, n)) * 1000)

        pooler = ROIPooler(
            7, scales=[0.25], pooler_type="ROILoopPool",
            roi_align_kernel="fused", mrrp_on=True, mrrp_num_branch=n_br,
        )
        dan = DiscriminativeAdaptationNeck(fc_dims=(32,))
        chunks, unsort = pooler.fused_chunk_pool(
            [feat], rois, obj, valid, train=False, level_ids=level_ids
        )
        assert chunks is not None and unsort is not None
        lay = dict(chunk_layout=pooler.chunk_layout_used, pooled_hw=(7, 7))
        params = dan.init(jax.random.PRNGKey(0), chunks, train=False, **lay)
        got = np.asarray(dan.apply(params, chunks, train=False, **lay))
        got = np.take_along_axis(got, np.asarray(unsort)[None, :, :, None], 2)

        # unfused reference: pool every branch with the jnp loop pool,
        # select per ROI by branch id, gate, DAN
        branch = (level_ids // 1000) % n_br
        per_img = []
        for bi in range(b):
            pooled_all = jnp.stack(
                [roi_loop_pool(feat[br * b + bi], rois[bi], 7, 0.25) for br in range(n_br)]
            )
            sel = branch[bi][None, None, :, None, None, None]
            per_img.append(jnp.take_along_axis(pooled_all, sel, axis=0)[0])
        pooled = jnp.stack(per_img, axis=1)
        gate = ((obj + 1.0) * valid).astype(pooled.dtype)
        pooled = pooled * gate[None, :, :, None, None, None]
        want = np.asarray(dan.apply(params, pooled, train=False))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    finally:
        rpf._INTERPRET = False


def test_chunked_dan_thunk_remat_grads(monkeypatch):
    """Training path: fused_chunk_pool emits ChunkThunks and the rematted
    pool->fc1 units produce the same outputs AND parameter grads as the
    eager array path."""
    from wsovod_tpu.models.box_head import DiscriminativeAdaptationNeck
    from wsovod_tpu.models.poolers import ChunkThunk, ROIPooler

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    rpf._INTERPRET = True
    try:
        rng = np.random.RandomState(21)
        b, h, w, c, n = 2, 10, 12, 256, 9
        feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        xy = rng.uniform(0, 30, (b, n, 2))
        wh = rng.uniform(4, 15, (b, n, 2))
        rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
        valid = jnp.ones((b, n), bool)
        obj = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))

        pooler = ROIPooler(
            7, scales=[0.25], pooler_type="ROILoopPool",
            roi_align_kernel="fused",
        )
        thunks, _ = pooler.fused_chunk_pool([feat], rois, obj, valid, train=True)
        assert all(isinstance(t, ChunkThunk) for t in thunks)
        # train pools UNGATED; the (objectness+1) gate rides the fc1 output
        row_gate = pooler.train_row_gate
        assert row_gate is not None
        arrays, _ = pooler.fused_chunk_pool([feat], rois, obj, valid, train=False)
        assert pooler.train_row_gate is None  # inference: gate in-kernel
        plain, _ = pooler.__class__(
            7, scales=[0.25], pooler_type="ROIPool", roi_align_kernel="fused"
        ).fused_chunk_pool([feat], rois, obj, valid, train=True)
        assert not any(isinstance(t, ChunkThunk) for t in plain)

        dan = DiscriminativeAdaptationNeck(fc_dims=(16,), dropout_rate=0.0)
        params = dan.init(jax.random.PRNGKey(0), thunks, train=True, row_gate=row_gate)

        def loss(p, x, rg=None):
            return jnp.sum(dan.apply(p, x, train=True, row_gate=rg) ** 2)

        lt, gt = jax.value_and_grad(loss)(params, thunks, row_gate)
        la, ga = jax.value_and_grad(loss)(params, arrays)
        np.testing.assert_allclose(np.asarray(lt), np.asarray(la), rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a_, b_: np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-5
            ),
            gt, ga,
        )
    finally:
        rpf._INTERPRET = False


def test_fused_pool_meta_multi_ctile():
    """Multi-c-tile runs replay the prefetched packed region meta per tile:
    results must match the single-tile run exactly."""
    feat, rois, gate = _mk(13, c=256)
    one = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=0.25, interpret=True
    )
    two = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=0.25, c_tile=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(one), np.asarray(two))


@pytest.mark.parametrize("loop", [False, True])
def test_fused_pool_maxabs_emission(loop):
    """quant='maxabs': payload identical to the plain gated output; reduced
    partials bit-equal to an XLA maxabs over that payload."""
    feat, rois, gate = _mk(17, c=256)
    kw = dict(spatial_scale=0.25, loop_pool=loop, interpret=True)
    plain = rpf.roi_pool_fused_batched(feat, rois, gate, **kw)
    payload, pm = rpf.roi_pool_fused_batched(
        feat, rois, gate, quant="maxabs", **kw
    )
    np.testing.assert_array_equal(np.asarray(payload), np.asarray(plain))
    # reduce the per-lane partials over (n_ct, lanes) -> per-ROI maxabs
    got = np.asarray(jnp.max(pm, axis=(-3, -1)))
    red = (2, 3, 5) if loop else (1, 2, 4)
    want = np.asarray(
        jnp.max(jnp.abs(jnp.asarray(plain).astype(jnp.float32)), axis=red)
    )
    np.testing.assert_array_equal(got, want)


def test_chunked_dense_precomputed_maxabs_matches_int8():
    """ChunkedDenseGeneral with (payload, maxabs) tuples reproduces the
    self-quantizing int8 path bit-exactly."""
    from wsovod_tpu.models.box_head import ChunkedDenseGeneral

    rng = np.random.RandomState(3)
    b, n, p, c = 2, 6, 7, 256
    x = jnp.asarray(rng.randn(b, p, p, n, c).astype(np.float32))
    chunks = [x[..., :128], x[..., 128:]]
    mod = ChunkedDenseGeneral(
        32, in_shape=(p, p, c), chunk_layout="hwnc", quant="int8"
    )
    params = mod.init(jax.random.PRNGKey(0), chunks)
    y_self = mod.apply(params, chunks)
    tup = [
        (ch, jnp.max(jnp.abs(ch.astype(jnp.float32)), axis=(1, 2, 4)))
        for ch in chunks
    ]
    y_pre = mod.apply(params, tup)
    np.testing.assert_array_equal(np.asarray(y_self), np.asarray(y_pre))


@pytest.mark.parametrize("quant", ["none", "maxabs"])
def test_fused_pool_width_class_sorted(quant):
    """Class-sorted blocks (per-block static windows via cls_tbl) reproduce
    the reference pool exactly after unsorting."""
    from wsovod_tpu.models.poolers import branch_partition
    from wsovod_tpu.ops.pallas.roi_pool_fused import (
        POOL_WIN_CLASSES,
        pool_width_classes,
    )

    feat, rois, gate = _mk(19, h=18, w=104, c=128)
    # spread widths across every class: narrow (<=17), 48 (<=41), 96 (<=89),
    # full-row
    widths = np.array([30.0, 120.0, 280.0, 400.0]).repeat(6)[:24]
    r = np.array(rois, copy=True)
    r[:, :, 2] = np.minimum(r[:, :, 0] + widths[None], 4 * 104 - 1)
    rois = jnp.asarray(r)
    cls = pool_width_classes(rois, 0.25, 104)
    present = set(np.unique(np.asarray(cls)[np.asarray(gate) > 0]))
    # every class must be exercised for the test to mean anything
    assert present == set(range(len(POOL_WIN_CLASSES))), present
    boxes_s, gate_s, key_s, unsort = branch_partition(
        rois, gate, cls, len(POOL_WIN_CLASSES)
    )
    out = rpf.roi_pool_fused_batched(
        feat, boxes_s, gate_s, spatial_scale=0.25,
        cls_tbl=key_s[:, ::8], quant=quant, interpret=True,
    )
    payload = out[0] if quant == "maxabs" else out
    got = np.transpose(np.asarray(payload), (0, 3, 1, 2, 4))
    got = np.take_along_axis(
        got, np.asarray(unsort)[..., None, None, None], axis=1
    )
    want = _ref_plain(feat, rois, gate, 0.25)
    np.testing.assert_array_equal(got, want)
    if quant == "maxabs":
        pm = np.asarray(jnp.max(out[1], axis=(-3, -1)))
        want_pm = np.abs(np.asarray(payload, np.float32)).max(axis=(1, 2, 4))
        np.testing.assert_array_equal(pm, want_pm)


def test_fused_branched_smem_batch_split(monkeypatch):
    """Branch-routed pooling with an SMEM-oversized ROI table B-splits by
    regrouping the branch-major feature concat and remapping the source
    table — must be bit-identical to the unsplit call."""
    from wsovod_tpu.models.poolers import branch_partition
    from wsovod_tpu.ops.pallas.roi_pool_fused import _branch_src_tbl

    rng = np.random.RandomState(13)
    b, n_br, h, w, c, n = 4, 2, 14, 21, 128, 11
    scale = 0.25
    feat = jnp.asarray(rng.randn(n_br * b, h, w, c).astype(np.float32))
    xy = rng.uniform(0, 50, (b, n, 2))
    wh = rng.uniform(4, 30, (b, n, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2, (b, n)).astype(np.float32))
    branch = jnp.asarray(rng.randint(0, n_br, (b, n)))
    boxes_s, gate_s, branch_s, _ = branch_partition(rois, gate, branch, n_br)
    src = _branch_src_tbl(branch_s.astype(jnp.int32), b, 8)

    full = rpf.roi_pool_fused_batched(
        feat, boxes_s, gate_s, spatial_scale=scale, loop_pool=True,
        src_tbl=src, interpret=True,
    )
    # force the split path (fresh trace: the budget is read at trace time
    # and these shapes are unique to this test)
    monkeypatch.setattr(rpf, "SMEM_BUDGET", 4000)
    split = rpf.roi_pool_fused_batched(
        feat, boxes_s, gate_s, 0, c_take=c, spatial_scale=scale,
        loop_pool=True, src_tbl=src, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))


def test_model_level_fused_mrrp_plain_cls_wiring(monkeypatch):
    """MRRP + plain ROIPool at inference uses the composite branch*ncls+cls
    key (branch-routed DMA AND width-class windows): fused chunks + DAN +
    unsort must match the unfused pool-all-branches-and-select reference."""
    from wsovod_tpu.models.box_head import DiscriminativeAdaptationNeck
    from wsovod_tpu.models.poolers import ROIPooler

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    rpf._INTERPRET = True
    try:
        rng = np.random.RandomState(23)
        b, n_br, h, w, c, n = 2, 2, 14, 56, 256, 10
        feat = jnp.asarray(rng.randn(n_br * b, h, w, c).astype(np.float32))
        xy = rng.uniform(0, 60, (b, n, 2))
        wh = np.concatenate(
            [rng.uniform(4, 30, (b, n // 2, 2)), rng.uniform(80, 160, (b, n - n // 2, 2))],
            axis=1,
        )
        rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
        valid = jnp.ones((b, n), bool)
        obj = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
        level_ids = jnp.asarray(rng.randint(0, n_br, (b, n)) * 1000)

        pooler = ROIPooler(
            7, scales=[0.25], pooler_type="ROIPool", roi_align_kernel="fused",
            mrrp_on=True, mrrp_num_branch=n_br,
        )
        dan = DiscriminativeAdaptationNeck(fc_dims=(16,))
        chunks, unsort = pooler.fused_chunk_pool(
            [feat], rois, obj, valid, train=False, level_ids=level_ids
        )
        assert chunks is not None and unsort is not None
        lay = dict(chunk_layout=pooler.chunk_layout_used, pooled_hw=(7, 7))
        params = dan.init(jax.random.PRNGKey(0), chunks, train=False, **lay)
        got = np.asarray(dan.apply(params, chunks, train=False, **lay))
        got = np.take_along_axis(got, np.asarray(unsort)[:, :, None], 1)

        branch = (level_ids // 1000) % n_br
        per_img = []
        for bi in range(b):
            pooled_all = jnp.stack(
                [roi_pool(feat[br * b + bi], rois[bi], 7, 0.25) for br in range(n_br)]
            )
            sel = branch[bi][None, :, None, None, None]
            per_img.append(jnp.take_along_axis(pooled_all, sel, axis=0)[0])
        pooled = jnp.stack(per_img)
        gate = ((obj + 1.0) * valid).astype(pooled.dtype)
        pooled = pooled * gate[:, :, None, None, None]
        want = np.asarray(dan.apply(params, pooled, train=False))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    finally:
        rpf._INTERPRET = False


def test_fused_pool_win_override_exact():
    """Static narrow-window overrides (width-split calls) are exact vs the
    default window for any ROI mix — wider-than-window ROIs take the
    full-row fallback."""
    feat, rois, gate = _mk(21, w=40, n=32, wide_frac=0.4)
    ref = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=0.25, interpret=True
    )
    for win in (24, 32, 48):
        got = rpf.roi_pool_fused_batched(
            feat, rois, gate, spatial_scale=0.25, interpret=True, win=win
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fused_pool_meta_dma_matches_prefetch():
    """The HBM->SMEM per-image table DMA mode (auto-selected when the
    prefetched tables would overflow SMEM, replacing the round-3 B-split +
    multi-GB concatenate) is bit-identical to the prefetch mode."""
    for loop in (False, True):
        for quant in ("none", "int8", "maxabs"):
            feat, rois, gate = _mk(22, c=128, n=24)
            a = rpf.roi_pool_fused_batched(
                feat, rois, gate, spatial_scale=0.25, loop_pool=loop,
                quant=quant, interpret=True, meta_dma=False,
            )
            d = rpf.roi_pool_fused_batched(
                feat, rois, gate, spatial_scale=0.25, loop_pool=loop,
                quant=quant, interpret=True, meta_dma=True,
            )
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(d)):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_model_level_width_split_wiring(monkeypatch):
    """Width-split fused pooling (SegmentedChunks): per-segment DAN + concat
    + unsort reproduces the unsplit fused path bit-for-bit."""
    from wsovod_tpu.models.box_head import DiscriminativeAdaptationNeck
    from wsovod_tpu.models.poolers import ROIPooler, SegmentedChunks

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    monkeypatch.setenv("WSOVOD_POOL_WSPLIT", "1")
    rpf._INTERPRET = True
    try:
        rng = np.random.RandomState(31)
        b, h, w, c, n = 2, 14, 18, 128, 256
        feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        xy = rng.uniform(0, 40, (b, n, 2))
        wh = rng.uniform(4, 50, (b, n, 2))
        rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
        valid = jnp.asarray(rng.rand(b, n) > 0.2)
        obj = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
        rois = jnp.where(valid[..., None], rois, 0.0)

        pooler = ROIPooler(
            7, scales=[0.25], pooler_type="ROIPool", roi_align_kernel="fused"
        )
        dan = DiscriminativeAdaptationNeck(fc_dims=(16,))
        chunks, unsort = pooler.fused_chunk_pool([feat], rois, obj, valid, train=False)
        assert isinstance(chunks, SegmentedChunks) and unsort is not None
        lay = dict(chunk_layout=pooler.chunk_layout_used, pooled_hw=(7, 7))
        params = dan.init(
            jax.random.PRNGKey(0), chunks.segments[0], train=False, **lay
        )
        got = jnp.concatenate(
            [dan.apply(params, s, train=False, **lay) for s in chunks.segments],
            axis=-2,
        )
        got = np.asarray(jnp.take_along_axis(got, unsort[..., None], axis=-2))

        monkeypatch.setenv("WSOVOD_POOL_WSPLIT", "0")
        plain, unsort2 = pooler.fused_chunk_pool([feat], rois, obj, valid, train=False)
        assert not isinstance(plain, SegmentedChunks) and unsort2 is None
        want = np.asarray(dan.apply(params, plain, train=False, **lay))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    finally:
        rpf._INTERPRET = False


def test_fused_pool_tile8_exact_vs_quantized_reference():
    """tile8: the int8 payload must EQUAL the jnp reference ROIPool of the
    per-image-quantized features (max commutes with monotone quantization),
    and the emitted scale must be gate * per-image scale exactly."""
    feat, rois, gate = _mk(41, w=40, n=32, wide_frac=0.4)
    q, s = rpf.roi_pool_fused_batched(
        feat, rois, gate, 0, spatial_scale=0.25, quant="tile8",
        interpret=True,
    )
    assert q.dtype == jnp.int8
    f32 = np.asarray(feat, np.float32)
    s_img = np.maximum(np.abs(f32).max(axis=(1, 2, 3)) / 127.0, 1e-20)
    qfeat = np.clip(
        np.round(f32 / s_img[:, None, None, None]), -127, 127
    ).astype(np.float32)
    b, n = rois.shape[:2]
    want = np.stack(
        [
            np.asarray(roi_pool(jnp.asarray(qfeat[i]), rois[i], 7, 0.25))
            for i in range(b)
        ]
    )  # [B, N, 7, 7, C]
    got = np.transpose(np.asarray(q, np.int32), (0, 3, 1, 2, 4))  # hwnc->nhwc
    np.testing.assert_array_equal(got, want.astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(s)[:, 0],
        np.asarray(gate) * s_img[:, None],
        rtol=1e-6,
        atol=0,
    )
    # all c-tile scale rows are identical
    for ct in range(np.asarray(s).shape[1]):
        np.testing.assert_array_equal(np.asarray(s)[:, ct], np.asarray(s)[:, 0])


def test_model_level_tile8_wiring(monkeypatch):
    """WSOVOD_POOL_TILE8=1: fused_chunk_pool emits (int8 payload, scale)
    tuples; the DAN int8 GEMM on them approximates the fp fused path."""
    from wsovod_tpu.models.box_head import DiscriminativeAdaptationNeck
    from wsovod_tpu.models.poolers import ROIPooler

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    monkeypatch.setenv("WSOVOD_POOL_TILE8", "1")
    monkeypatch.setenv("WSOVOD_POOL_WSPLIT", "0")
    rpf._INTERPRET = True
    try:
        rng = np.random.RandomState(33)
        b, h, w, c, n = 2, 14, 18, 128, 32
        feat = jnp.asarray(np.abs(rng.randn(b, h, w, c)).astype(np.float32))
        xy = rng.uniform(0, 40, (b, n, 2))
        wh = rng.uniform(4, 50, (b, n, 2))
        rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
        valid = jnp.asarray(rng.rand(b, n) > 0.2)
        obj = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
        rois = jnp.where(valid[..., None], rois, 0.0)

        pooler = ROIPooler(
            7, scales=[0.25], pooler_type="ROIPool",
            roi_align_kernel="fused", fc1_quant="int8",
        )
        dan = DiscriminativeAdaptationNeck(fc_dims=(16,), fc1_quant="int8")
        chunks, unsort = pooler.fused_chunk_pool(
            [feat], rois, obj, valid, train=False
        )
        assert unsort is None
        assert isinstance(chunks[0], tuple) and chunks[0][0].dtype == jnp.int8
        lay = dict(chunk_layout=pooler.chunk_layout_used, pooled_hw=(7, 7))
        params = dan.init(jax.random.PRNGKey(0), chunks, train=False, **lay)
        got = np.asarray(dan.apply(params, chunks, train=False, **lay))

        monkeypatch.setenv("WSOVOD_POOL_TILE8", "0")
        chunks_fp, _ = pooler.fused_chunk_pool(
            [feat], rois, obj, valid, train=False
        )
        # fp chunks through the same params with fp math
        dan_fp = DiscriminativeAdaptationNeck(fc_dims=(16,), fc1_quant="none")
        want = np.asarray(
            dan_fp.apply(
                params, chunks_fp, train=False,
                chunk_layout=pooler.chunk_layout_used, pooled_hw=(7, 7),
            )
        )
        err = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
        # per-(image, chunk) activation scales are coarser than the 'int8'
        # mode's per-ROI scales (measured p99 ~6.5% vs ~3% on random
        # features); the binding accuracy gate for enabling tile8 is the
        # end-to-end eval delta (tests/test_golden_eval_int8.py pattern)
        assert np.percentile(err, 99) < 0.10, np.percentile(err, 99)
    finally:
        rpf._INTERPRET = False


def test_fused_pool_force_narrow_row_unroll_exact():
    """force_narrow + row_unroll (value-thresholded split guarantees) are
    bit-exact vs the default dynamic narrow/wide path when the guarantees
    hold (rw <= win-7, rh <= (row_unroll-1)*p)."""
    rng = np.random.RandomState(7)
    b, h, w, c, n = 2, 20, 29, 128, 24
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    xy = rng.uniform(0, 60, (b, n, 2))
    # rw <= 41px/4 ... choose <= 40px so feature rw <= 11 <= 17 (win24-7);
    # rh <= 4px*6*... (row_unroll-1)*7 rows = 6*7=42 feature rows — any h fits
    wh = rng.uniform(2, 40, (b, n, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2, (b, n)).astype(np.float32))
    ref = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=0.25, interpret=True
    )
    for win, unroll in ((24, 7), (48, 2), (48, None)):
        got = rpf.roi_pool_fused_batched(
            feat, rois, gate, spatial_scale=0.25, interpret=True,
            win=win, force_narrow=True, row_unroll=unroll,
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fused_pool_pipe_exact():
    """Software-pipelined force_narrow blocks (A(i+1) before B(i)) are
    bit-exact vs the serial loop."""
    rng = np.random.RandomState(7)
    b, h, w, c, n = 2, 20, 29, 128, 24
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    xy = rng.uniform(0, 60, (b, n, 2))
    wh = rng.uniform(2, 40, (b, n, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2, (b, n)).astype(np.float32))
    for quant in ("none", "int8"):
        ref = rpf.roi_pool_fused_batched(
            feat, rois, gate, spatial_scale=0.25, interpret=True,
            win=24, force_narrow=True, quant=quant, pipe=False,
        )
        got = rpf.roi_pool_fused_batched(
            feat, rois, gate, spatial_scale=0.25, interpret=True,
            win=24, force_narrow=True, quant=quant, pipe=True,
        )
        for a, b_ in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_fused_pool_fold_variants_exact():
    """Interleaved stage-A folds (fold='il'/'il2') are bit-exact vs the
    sequential carry fold on both the narrow windowed path and the wide
    full-row (force_narrow win>=w_dma, pyramid stage B) path, including
    tall boxes, sub-pixel boxes (empty bins), and gate-0 rows."""
    rng = np.random.RandomState(11)
    b, h, w, c, n = 2, 20, 29, 128, 24
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    xy = rng.uniform(0, 40, (b, n, 2))
    # thirds: tiny (empty-bin stress), medium, tall/wide (full-row stress)
    wh = np.concatenate(
        [
            rng.uniform(0.5, 3, (b, 8, 2)),
            rng.uniform(4, 40, (b, 8, 2)),
            rng.uniform(60, 110, (b, 8, 2)),
        ],
        axis=1,
    )
    rois = np.concatenate([xy, xy + wh], -1)
    rois[..., [0, 2]] = rois[..., [0, 2]].clip(0, w / 0.25)
    rois[..., [1, 3]] = rois[..., [1, 3]].clip(0, h / 0.25)
    rois = jnp.asarray(rois.astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2, (b, n)).astype(np.float32))
    gate = gate.at[:, -2:].set(0.0)
    for kw in (
        dict(win=24, force_narrow=True),  # narrow windowed (clipped rois fit)
        dict(win=1024, force_narrow=True),  # wide full-row pyramid stage B
        dict(),  # default per-ROI narrow/wide program
    ):
        if kw.get("win") == 24:
            rois_k = jnp.asarray(
                np.concatenate([xy, xy + wh.clip(0.5, 20)], -1).astype(
                    np.float32
                )
            )
        else:
            rois_k = rois
        ref = rpf.roi_pool_fused_batched(
            feat, rois_k, gate, spatial_scale=0.25, interpret=True, **kw
        )
        for fold in ("il", "il2", "sl2"):
            got = rpf.roi_pool_fused_batched(
                feat, rois_k, gate, spatial_scale=0.25, interpret=True,
                fold=fold, **kw
            )
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_model_level_fullrow_wiring(monkeypatch):
    """WSOVOD_POOL_FULLROW=1 (single-body full-row force program; image-
    clipped boxes) reproduces the default per-ROI narrow/wide fused path
    bit-for-bit through the DAN, with and without the pipe interleave."""
    from wsovod_tpu.models.box_head import DiscriminativeAdaptationNeck
    from wsovod_tpu.models.poolers import ROIPooler

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    rpf._INTERPRET = True
    try:
        rng = np.random.RandomState(33)
        b, h, w, c, n = 2, 14, 18, 128, 32
        feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        xy = rng.uniform(0, 40, (b, n, 2))
        wh = np.concatenate(
            [rng.uniform(4, 40, (b, 24, 2)), rng.uniform(40, 90, (b, 8, 2))],
            axis=1,
        )
        rois = np.concatenate([xy, xy + wh], -1)
        rois[..., [0, 2]] = rois[..., [0, 2]].clip(0, w / 0.25)
        rois[..., [1, 3]] = rois[..., [1, 3]].clip(0, h / 0.25)
        rois = jnp.asarray(rois.astype(np.float32))
        valid = jnp.asarray(rng.rand(b, n) > 0.2)
        obj = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
        rois = jnp.where(valid[..., None], rois, 0.0)

        pooler = ROIPooler(
            7, scales=[0.25], pooler_type="ROIPool", roi_align_kernel="fused"
        )
        dan = DiscriminativeAdaptationNeck(fc_dims=(16,))
        plain, _ = pooler.fused_chunk_pool([feat], rois, obj, valid, train=False)
        lay = dict(chunk_layout=pooler.chunk_layout_used, pooled_hw=(7, 7))
        params = dan.init(jax.random.PRNGKey(0), plain, train=False, **lay)
        want = np.asarray(dan.apply(params, plain, train=False, **lay))

        monkeypatch.setenv("WSOVOD_POOL_FULLROW", "1")
        for pipe_env in ("0", "1"):
            monkeypatch.setenv("WSOVOD_POOL_PIPE", pipe_env)
            fr, unsort = pooler.fused_chunk_pool(
                [feat], rois, obj, valid, train=False
            )
            assert unsort is None
            got = np.asarray(dan.apply(params, fr, train=False, **lay))
            np.testing.assert_array_equal(got, want)
    finally:
        rpf._INTERPRET = False


def test_fused_pool_hpyr_exact():
    """The shared H-direction 4-row pyramid stage A (hpyr=True) is bit-exact
    vs the row walk on the windowed, full-row force, and default programs,
    including tall boxes, sub-4-row bins, empty bins, and gate-0 rows."""
    rng = np.random.RandomState(13)
    b, h, w, c, n = 2, 20, 29, 128, 24
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    xy = rng.uniform(0, 40, (b, n, 2))
    wh = np.concatenate(
        [
            rng.uniform(0.5, 3, (b, 8, 2)),
            rng.uniform(4, 40, (b, 8, 2)),
            rng.uniform(60, 110, (b, 8, 2)),
        ],
        axis=1,
    )
    rois = np.concatenate([xy, xy + wh], -1)
    rois[..., [0, 2]] = rois[..., [0, 2]].clip(0, w / 0.25)
    rois[..., [1, 3]] = rois[..., [1, 3]].clip(0, h / 0.25)
    rois = jnp.asarray(rois.astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2, (b, n)).astype(np.float32))
    gate = gate.at[:, -2:].set(0.0)
    for kw in (
        dict(win=1024, force_narrow=True),  # the production hpyr segment
        dict(),  # default per-ROI narrow/wide program
        dict(win=24, force_narrow=True),
    ):
        if kw.get("win") == 24:
            rois_k = jnp.asarray(
                np.concatenate([xy, xy + wh.clip(0.5, 20)], -1).astype(
                    np.float32
                )
            )
        else:
            rois_k = rois
        ref = rpf.roi_pool_fused_batched(
            feat, rois_k, gate, spatial_scale=0.25, interpret=True, **kw
        )
        got = rpf.roi_pool_fused_batched(
            feat, rois_k, gate, spatial_scale=0.25, interpret=True,
            hpyr=True, **kw
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_model_level_hpyr_wiring(monkeypatch):
    """WSOVOD_POOL_HPYR=1 (width-sorted split; wide tail segment through the
    full-row + H-pyramid program) reproduces the default fused path
    bit-for-bit through the DAN after unsorting."""
    from wsovod_tpu.models.box_head import DiscriminativeAdaptationNeck
    from wsovod_tpu.models.poolers import ROIPooler, SegmentedChunks

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    rpf._INTERPRET = True
    try:
        rng = np.random.RandomState(35)
        b, h, w, c, n = 2, 14, 18, 128, 256
        feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        xy = rng.uniform(0, 40, (b, n, 2))
        wh = np.concatenate(
            [rng.uniform(4, 40, (b, 192, 2)), rng.uniform(40, 90, (b, 64, 2))],
            axis=1,
        )
        rois = np.concatenate([xy, xy + wh], -1)
        rois[..., [0, 2]] = rois[..., [0, 2]].clip(0, w / 0.25)
        rois[..., [1, 3]] = rois[..., [1, 3]].clip(0, h / 0.25)
        rois = jnp.asarray(rois.astype(np.float32))
        valid = jnp.asarray(rng.rand(b, n) > 0.2)
        obj = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
        rois = jnp.where(valid[..., None], rois, 0.0)

        pooler = ROIPooler(
            7, scales=[0.25], pooler_type="ROIPool", roi_align_kernel="fused"
        )
        dan = DiscriminativeAdaptationNeck(fc_dims=(16,))
        # hpyr is DEFAULT ON (n >= 256): force it off for the unsplit
        # reference pass, back on for the split pass under test
        monkeypatch.setenv("WSOVOD_POOL_HPYR", "0")
        plain, _ = pooler.fused_chunk_pool([feat], rois, obj, valid, train=False)
        lay = dict(chunk_layout=pooler.chunk_layout_used, pooled_hw=(7, 7))
        params = dan.init(jax.random.PRNGKey(0), plain, train=False, **lay)
        want = np.asarray(dan.apply(params, plain, train=False, **lay))

        monkeypatch.setenv("WSOVOD_POOL_HPYR", "1")
        chunks, unsort = pooler.fused_chunk_pool(
            [feat], rois, obj, valid, train=False
        )
        assert isinstance(chunks, SegmentedChunks) and unsort is not None
        got = jnp.concatenate(
            [dan.apply(params, s, train=False, **lay) for s in chunks.segments],
            axis=-2,
        )
        got = np.asarray(jnp.take_along_axis(got, unsort[..., None], axis=-2))
        np.testing.assert_array_equal(got, want)
    finally:
        rpf._INTERPRET = False


def test_fused_loop_pool_merged_vs_split_bands():
    """The merged a|b band form (ONE [wd, 2CT] dot rhs per walk; 14 dots +
    3 j-group passes) is bit-exact vs the split two-band form."""
    feat, rois, gate = _mk(17, n=16, wide_frac=0.4)
    ref = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=0.25, loop_pool=True,
        interpret=True, loop_merged=False,
    )
    got = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=0.25, loop_pool=True,
        interpret=True, loop_merged=True,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_model_level_loop_split_hybrid(monkeypatch):
    """The ROILoopPool width-split hybrid (force-narrow head + wide-only
    tail, default ON) reproduces the unsplit fused loop path bit-for-bit
    through the DAN after unsorting — plain and MRRP-branched."""
    from wsovod_tpu.models.box_head import DiscriminativeAdaptationNeck
    from wsovod_tpu.models.poolers import ROIPooler, SegmentedChunks

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    rpf._INTERPRET = True
    try:
        rng = np.random.RandomState(37)
        b, h, w, c, n = 1, 10, 12, 128, 256
        n_br = 2
        feat = jnp.asarray(rng.randn(n_br * b, h, w, c).astype(np.float32))
        xy = rng.uniform(0, 30, (b, n, 2))
        wh = np.concatenate(
            [rng.uniform(2, 20, (b, n - 32, 2)), rng.uniform(25, 45, (b, 32, 2))],
            axis=1,
        )
        rois = np.concatenate([xy, xy + wh], -1)
        rois[..., [0, 2]] = rois[..., [0, 2]].clip(0, w / 0.25)
        rois[..., [1, 3]] = rois[..., [1, 3]].clip(0, h / 0.25)
        rois = jnp.asarray(rois.astype(np.float32))
        valid = jnp.asarray(rng.rand(b, n) > 0.1)
        obj = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
        rois = jnp.where(valid[..., None], rois, 0.0)
        lvl = jnp.asarray(rng.randint(0, n_br, (b, n)) * 1000, jnp.int32)

        dan = DiscriminativeAdaptationNeck(fc_dims=(8,))
        for use_mrrp in (False, True):
            pooler = ROIPooler(
                7, scales=[0.25], pooler_type="ROILoopPool",
                roi_align_kernel="fused", mrrp_on=use_mrrp,
                mrrp_num_branch=n_br if use_mrrp else 1,
            )
            f_in = [feat] if use_mrrp else [feat[:b]]
            kw = dict(level_ids=lvl) if use_mrrp else {}

            monkeypatch.setenv("WSOVOD_LOOP_SPLIT", "0")
            plain, un0 = pooler.fused_chunk_pool(
                f_in, rois, obj, valid, train=False, **kw
            )
            lay = dict(chunk_layout=pooler.chunk_layout_used, pooled_hw=(7, 7))
            params = dan.init(jax.random.PRNGKey(0), plain, train=False, **lay)
            want = np.asarray(dan.apply(params, plain, train=False, **lay))
            if un0 is not None:
                want = np.take_along_axis(
                    want, np.asarray(un0)[None, ..., None], axis=-2
                )

            monkeypatch.setenv("WSOVOD_LOOP_SPLIT", "1")
            chunks, unsort = pooler.fused_chunk_pool(
                f_in, rois, obj, valid, train=False, **kw
            )
            assert isinstance(chunks, SegmentedChunks) and unsort is not None
            got = jnp.concatenate(
                [
                    dan.apply(params, s, train=False, **lay)
                    for s in chunks.segments
                ],
                axis=-2,
            )
            got = np.asarray(
                jnp.take_along_axis(got, unsort[None, ..., None], axis=-2)
            )
            np.testing.assert_array_equal(got, want)
    finally:
        rpf._INTERPRET = False


def test_model_level_loop_split_train(monkeypatch):
    """Train-mode ROILoopPool loop-split: the segment-order fc1 row gate
    must be SLICED to each segment's rows (regression: the full-size
    [B, N'] gate broadcast against a segment-sized fc1 output crashed the
    MRRP train step at trace time). With dropout stubbed to identity the
    split losses match the unsplit path and param grads stay finite —
    plain and MRRP-branched."""
    import flax.linen as nn

    from wsovod_tpu.models.poolers import ROIPooler
    from wsovod_tpu.models.roi_heads import WSOVODROIHeads
    from wsovod_tpu.structures.instances import Instances

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    monkeypatch.setattr(nn.Dropout, "__call__", lambda self, x, **kw: x)
    monkeypatch.setenv("WSOVOD_LOOP_SPLIT_MIN", "16")
    rpf._INTERPRET = True
    try:
        rng = np.random.RandomState(7)
        b, h, w, c, n, n_br = 1, 10, 12, 128, 32, 2
        feat_b = jnp.asarray(rng.randn(n_br * b, h, w, c).astype(np.float32))
        xy = rng.uniform(0, 30, (b, n, 2))
        wh = np.concatenate(
            [rng.uniform(2, 18, (b, n - 8, 2)), rng.uniform(28, 44, (b, 8, 2))],
            axis=1,
        )
        rois = np.concatenate([xy, xy + wh], -1)
        rois[..., [0, 2]] = rois[..., [0, 2]].clip(0, w / 0.25)
        rois[..., [1, 3]] = rois[..., [1, 3]].clip(0, h / 0.25)
        lvl = jnp.asarray(rng.randint(0, n_br, (b, n)) * 1000, jnp.int32)
        obj = jnp.asarray(rng.rand(b, n).astype(np.float32))
        gt_classes = jnp.asarray([[0, 2]])
        gt_valid = jnp.ones((1, 2), bool)
        emb = jnp.asarray(rng.randn(4, 8).astype(np.float32))

        for mrrp in (False, True):
            proposals = Instances(
                jnp.ones((b, n), bool),
                proposal_boxes=jnp.asarray(rois.astype(np.float32)),
                objectness_logits=obj,
                **(dict(level_ids=lvl) if mrrp else {}),
            )
            feats = {"res5": feat_b if mrrp else feat_b[:b]}
            pooler = ROIPooler(
                7, scales=[0.25], pooler_type="ROILoopPool",
                roi_align_kernel="fused", mrrp_on=mrrp,
                mrrp_num_branch=n_br if mrrp else 1,
            )
            heads = WSOVODROIHeads(
                num_classes=4, pooler=pooler, dan_fc_dims=(16, 16),
                refine_k=1, refine_reg=(True,), ov_weight_dim=8,
                rpn_on=False, mrrp_on=mrrp, mrrp_num_branch=n_br,
            )
            init_rngs = {
                "params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
            }
            params = heads.init(
                init_rngs, feats, proposals, gt_classes, gt_valid,
                embeddings=emb, rng=jax.random.PRNGKey(2),
            )

            def loss_fn(p, heads=heads, feats=feats, proposals=proposals):
                out = heads.apply(
                    p, feats, proposals, gt_classes, gt_valid,
                    embeddings=emb, rng=jax.random.PRNGKey(2),
                    rngs={"dropout": jax.random.PRNGKey(1)},
                )
                return sum(jax.tree_util.tree_leaves(out.losses))

            l_split, g_split = jax.value_and_grad(loss_fn)(params)
            assert np.isfinite(float(l_split))
            assert all(
                np.all(np.isfinite(np.asarray(g)))
                for g in jax.tree_util.tree_leaves(g_split)
            )

            monkeypatch.setenv("WSOVOD_LOOP_SPLIT", "0")
            l_base = loss_fn(params)
            monkeypatch.setenv("WSOVOD_LOOP_SPLIT", "1")
            np.testing.assert_allclose(
                float(l_split), float(l_base), rtol=1e-5,
                err_msg=f"mrrp={mrrp}",
            )
    finally:
        rpf._INTERPRET = False


def test_fused_loop_pool_force_win48_exact():
    """The win=48 loop force program (jc=8 candidate budget) is exact for
    caller-guaranteed boxes (rw_o <= 41, rw_r <= 49) on an image wide
    enough that 48 is a real window (w_dma=64), vs the jnp reference."""
    rng = np.random.RandomState(41)
    b, h, w, c, n = 2, 12, 61, 128, 16
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    # scale 1.0: cells == px. outer = 1.8x centered: width*1.8 <= 40 cells
    xy = np.stack(
        [rng.uniform(0, w - 24, (b, n)), rng.uniform(0, h - 3, (b, n))], -1
    )
    wh = np.stack(
        [rng.uniform(1, 21, (b, n)), rng.uniform(1, 9, (b, n))], -1
    )
    rois = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    rois = jnp.asarray(rois)
    gate = jnp.asarray((rng.rand(b, n) > 0.2).astype(np.float32))
    out = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=1.0, loop_pool=True,
        win=48, force_narrow=True, interpret=True,
    )
    got = np.transpose(np.asarray(out), (0, 1, 4, 2, 3, 5))
    want = _ref_loop(feat, rois, gate, 1.0)
    np.testing.assert_array_equal(got, want)


def test_model_level_loop_3seg_hybrid(monkeypatch):
    """The 3-segment ROILoopPool split (win48 head + win96 mid + wide
    tail, default ON) reproduces the unsplit fused loop path bit-for-bit
    through the DAN after unsorting, on an image wide enough that the
    win48/win96 windows are real (w_dma=64) with a tier0/tier1/wide/gate-0
    mix."""
    from wsovod_tpu.models.box_head import DiscriminativeAdaptationNeck
    from wsovod_tpu.models.poolers import ROIPooler, SegmentedChunks

    monkeypatch.setattr(ROIPooler, "_on_tpu", staticmethod(lambda: True))
    monkeypatch.setenv("WSOVOD_LOOP_SPLIT_MIN", "16")
    rpf._INTERPRET = True
    try:
        rng = np.random.RandomState(43)
        b, h, w, c, n = 1, 12, 61, 128, 48
        feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        # scale 1.0; widths spanning tier0 (<=20), tier1 (~30-45), wide (>89
        # via rw_r: x-extent beyond the image)
        xy = np.stack(
            [rng.uniform(0, 40, (b, n)), rng.uniform(0, 9, (b, n))], -1
        )
        wd = np.where(
            rng.rand(b, n) < 0.5,
            rng.uniform(1, 20, (b, n)),
            np.where(
                rng.rand(b, n) < 0.7,
                rng.uniform(28, 44, (b, n)),
                rng.uniform(95, 150, (b, n)),
            ),
        )
        ht = rng.uniform(1, 9, (b, n))
        rois = np.concatenate(
            [xy, xy + np.stack([wd, ht], -1)], -1
        ).astype(np.float32)
        rois = jnp.asarray(rois)
        valid = jnp.asarray(rng.rand(b, n) > 0.15)
        obj = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
        rois = jnp.where(valid[..., None], rois, 0.0)

        pooler = ROIPooler(
            7, scales=[1.0], pooler_type="ROILoopPool",
            roi_align_kernel="fused",
        )
        dan = DiscriminativeAdaptationNeck(fc_dims=(8,))

        monkeypatch.setenv("WSOVOD_LOOP_SPLIT", "0")
        plain, un0 = pooler.fused_chunk_pool(
            [feat], rois, obj, valid, train=False
        )
        assert un0 is None
        lay = dict(chunk_layout=pooler.chunk_layout_used, pooled_hw=(7, 7))
        params = dan.init(jax.random.PRNGKey(0), plain, train=False, **lay)
        want = np.asarray(dan.apply(params, plain, train=False, **lay))

        monkeypatch.setenv("WSOVOD_LOOP_SPLIT", "1")
        chunks, unsort = pooler.fused_chunk_pool(
            [feat], rois, obj, valid, train=False
        )
        assert isinstance(chunks, SegmentedChunks) and unsort is not None
        assert len(chunks.segments) == 3
        got = jnp.concatenate(
            [dan.apply(params, s, train=False, **lay) for s in chunks.segments],
            axis=-2,
        )
        got = np.asarray(
            jnp.take_along_axis(got, unsort[None, ..., None], axis=-2)
        )
        np.testing.assert_array_equal(got, want)
    finally:
        rpf._INTERPRET = False


def test_fused_pool_feat_i8_exact_vs_quantized_reference(monkeypatch):
    """WSOVOD_POOL_FEAT_I8=1 (int8 feature tiles on the bf16-payload paths,
    incl. loop pool): the bf16 payload must EQUAL gate * s_img * the jnp
    reference pool of the per-image-quantized features — the dequant scale
    folds into the gate and max commutes with the positive scale."""
    monkeypatch.setenv("WSOVOD_POOL_FEAT_I8", "1")
    feat, rois, gate = _mk(43, w=40, n=32, wide_frac=0.4)
    f32 = np.asarray(feat, np.float32)
    s_img = np.maximum(np.abs(f32).max(axis=(1, 2, 3)) / 127.0, 1e-20)
    qfeat = np.clip(
        np.round(f32 / s_img[:, None, None, None]), -127, 127
    ).astype(np.float32)
    qj = jnp.asarray(qfeat)
    g_eff = jnp.asarray(np.asarray(gate) * s_img[:, None])

    out = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=0.25, interpret=True
    )
    got = np.transpose(np.asarray(out, np.float32), (0, 3, 1, 2, 4))
    np.testing.assert_allclose(
        got, _ref_plain(qj, rois, g_eff, 0.25), rtol=1e-2, atol=1e-4
    )

    out = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=0.25, loop_pool=True, interpret=True
    )
    got = np.transpose(np.asarray(out, np.float32), (0, 1, 4, 2, 3, 5))
    np.testing.assert_allclose(
        got, _ref_loop(qj, rois, g_eff, 0.25), rtol=1e-2, atol=1e-4
    )


def test_fused_pool_feat_i8_branched_exact(monkeypatch):
    """FEAT_I8 + MRRP branch routing: per-(branch, image) scales fold into
    the gate via the src table."""
    monkeypatch.setenv("WSOVOD_POOL_FEAT_I8", "1")
    rng = np.random.RandomState(44)
    b, n_br, h, w, c, n = 2, 2, 12, 16, 128, 16
    feat = jnp.asarray(rng.randn(n_br * b, h, w, c).astype(np.float32))
    xy = rng.uniform(0, 30, (b, n, 2))
    wh = rng.uniform(2, 30, (b, n, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    gate = jnp.asarray(rng.uniform(0.5, 2.0, (b, n)).astype(np.float32))
    # branch-pure 8-ROI blocks: first block branch 0, second branch 1
    branch = np.zeros((b, n), np.int32)
    branch[:, 8:] = 1
    src = rpf._branch_src_tbl(jnp.asarray(branch), b, 8)

    f32 = np.asarray(feat, np.float32)
    s_src = np.maximum(np.abs(f32).max(axis=(1, 2, 3)) / 127.0, 1e-20)
    qfeat = np.clip(
        np.round(f32 / s_src[:, None, None, None]), -127, 127
    ).astype(np.float32)

    out = rpf.roi_pool_fused_batched(
        feat, rois, gate, spatial_scale=0.25, src_tbl=src, interpret=True
    )
    got = np.transpose(np.asarray(out, np.float32), (0, 3, 1, 2, 4))
    want = np.zeros_like(got)
    for bi in range(b):
        for ri in range(n):
            si = branch[bi, ri] * b + bi
            ref = np.asarray(
                roi_pool(jnp.asarray(qfeat[si]), rois[bi, ri : ri + 1], 7, 0.25)
            )[0]
            want[bi, ri] = ref * float(gate[bi, ri]) * s_src[si]
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-4)
