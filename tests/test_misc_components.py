import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def test_csc_scores_focused_box_higher():
    from wsovod_tpu.ops.csc import csc

    # CPG heatmap with a hot square at [10:20, 10:20]
    cpg = np.zeros((1, 32, 32), np.float32)
    cpg[0, 10:20, 10:20] = 1.0
    labels = jnp.asarray([1.0])
    preds = jnp.asarray([0.9])
    rois = jnp.asarray(
        np.array(
            [
                [10, 10, 20, 20],  # tight box -> high contrast
                [0, 0, 31, 31],  # whole image -> low contrast
                [22, 22, 30, 30],  # off-object
            ],
            np.float32,
        )
    )
    w = np.asarray(csc(jnp.asarray(cpg), labels, preds, rois))
    assert w.shape == (3, 1)
    assert w[0, 0] > w[1, 0]
    assert w[0, 0] > w[2, 0]


def test_csc_unlabeled_class_is_one():
    from wsovod_tpu.ops.csc import csc

    cpg = np.random.RandomState(0).rand(2, 16, 16).astype(np.float32)
    labels = jnp.asarray([1.0, 0.0])
    preds = jnp.asarray([0.5, 0.5])
    rois = jnp.asarray(np.array([[2, 2, 10, 10]], np.float32))
    w = np.asarray(csc(jnp.asarray(cpg), labels, preds, rois))
    np.testing.assert_allclose(w[:, 1], 1.0)


def test_csc_constraint_grad():
    from wsovod_tpu.ops.csc import csc_constraint

    x = jnp.asarray(np.random.RandomState(0).rand(4).astype(np.float32))
    w = jnp.asarray(np.array([0.5, -0.5, 1.0, 0.0], np.float32))
    y = csc_constraint(x, w, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * np.array([0.5, 0, 1, 0]))
    g = jax.grad(lambda x_: csc_constraint(x_, w, True).sum())(x)
    np.testing.assert_allclose(np.asarray(g), [0.5, 0, 1, 0])


def test_integral_image():
    from wsovod_tpu.ops.csc import integral_image

    x = jnp.ones((4, 4))
    ii = np.asarray(integral_image(x))
    assert ii[-1, -1] == 16
    assert ii[0, 0] == 1


def test_swin_shapes():
    from wsovod_tpu.models.backbones.swin import SwinTransformer

    m = SwinTransformer(embed_dim=32, depths=(1, 1), num_heads=(2, 4),
                        window_size=4, out_features=("stage2", "stage3"))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out["stage2"].shape == (1, 16, 16, 32)
    assert out["stage3"].shape == (1, 8, 8, 64)
    assert m.output_strides() == {"stage2": 4, "stage3": 8}


def test_tta_inverse_transform():
    from wsovod_tpu.models.tta import inverse_transform_boxes

    boxes = np.array([[10, 20, 30, 40]], np.float32)
    inv = {"flip": True, "flip_width": 100, "scale_x": 2.0, "scale_y": 0.5,
           "orig_size": (100, 300)}
    out = inverse_transform_boxes(boxes, inv)
    # flip: x1 = 100-30=70, x2 = 100-10=90; then scale
    np.testing.assert_allclose(out, [[140, 10, 180, 20]])


def test_tta_avg_merge():
    from wsovod_tpu.models.tta import tta_avg_merge

    scores = [np.array([[0.9, 0.1], [0.2, 0.8]], np.float32)] * 2
    boxes = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)] * 2
    invs = [{"flip": False, "flip_width": 0, "scale_x": 1.0, "scale_y": 1.0,
             "orig_size": (100, 100)}] * 2
    det = tta_avg_merge(scores, boxes, invs, np.ones(2, bool), 0.05, 0.5, 10)
    v = np.asarray(det.valid[0])
    assert v.sum() == 2  # one class column (C=1), both boxes above threshold
    kept = sorted(float(s) for s in np.asarray(det.scores[0])[v])
    np.testing.assert_allclose(kept, [0.2, 0.9], atol=1e-5)


def test_mixed_roi_heads_families():
    from wsovod_tpu.models.roi_heads_mixed import dataset_family

    assert dataset_family("voc_2007_trainval") == "voc"
    assert dataset_family("coco_2017_train") == "coco"
    assert dataset_family("lvis_v1_train") == "lvis"


def test_multi_dataset_sampler():
    from wsovod_tpu.data.loader_multi_dataset import MultiDatasetTrainingSampler

    s = MultiDatasetTrainingSampler(
        sizes=[4, 8], ratios=[1.0, 1.0],
        per_image_factors=[np.ones(4), np.ones(8)], seed=0,
    )
    it = iter(s)
    pairs = [next(it) for _ in range(100)]
    d0 = sum(1 for d, _ in pairs if d == 0)
    d1 = sum(1 for d, _ in pairs if d == 1)
    # dataset 0 (smaller) is upweighted 2x -> roughly balanced counts
    assert abs(d0 - d1) < 30


def test_wsovod_rpn_anchor_free():
    from wsovod_tpu.models.rpn import WSOVODRPN

    rpn = WSOVODRPN(
        in_features=("res5",), strides=(8,),
        pre_nms_topk_train=32, post_nms_topk_train=16,
        batch_size_per_image=8,
    )
    feats = {"res5": jax.random.normal(KEY, (2, 8, 8, 32))}
    sizes = jnp.asarray(np.array([[64, 64], [64, 64]], np.int32))
    params = rpn.init(KEY, feats, sizes, train=True)
    proposals, aux = rpn.apply(params, feats, sizes, train=True)
    assert proposals.proposal_boxes.shape == (2, 16, 4)
    assert aux.logits.shape == (2, 2, 64)  # stacked (cls, obj)

    rng = np.random.RandomState(0)
    gt = rng.uniform(5, 30, (2, 3, 2))
    gt_boxes = jnp.asarray(np.concatenate([gt, gt + 20], -1).astype(np.float32))
    gt_valid = jnp.ones((2, 3), bool)
    losses = rpn.apply(
        params, aux, gt_boxes, gt_valid, jax.random.PRNGKey(1), method=rpn.losses
    )
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_bbox", "loss_rpn_obj"}
    for v in losses.values():
        assert np.isfinite(float(v))


def test_deform_conv_zero_offsets_match_plain_conv():
    """With zero-init offsets (and no modulation), DeformConv must equal a
    plain 3x3 convolution with the same kernel."""
    import jax.lax as lax
    from wsovod_tpu.models.backbones.deform import DeformConv

    m = DeformConv(features=6, modulated=False)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 10, 4).astype(np.float32))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    k = np.asarray(params["params"]["kernel"]).reshape(3, 3, 4, 6)
    ref = lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_deform_bottleneck_shapes():
    from wsovod_tpu.models.backbones.deform import DeformBottleneckBlock

    m = DeformBottleneckBlock(out_channels=16, bottleneck_channels=8, deform_modulated=True)
    x = jnp.zeros((1, 8, 8, 8))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (1, 8, 8, 16)


def test_engine_defaults_aliases():
    from wsovod_tpu.engine import defaults as D

    assert D.DefaultTrainer is D.WSOVODTrainer
    assert callable(D.default_writers)


def test_precise_bn_update():
    """precise_bn_update recomputes FrozenBatchNorm mean/var from data
    (d2 PreciseBN semantics: plain average of per-batch stats)."""
    import flax.linen as nn

    from wsovod_tpu.engine.hooks import precise_bn_update
    from wsovod_tpu.models.layers import ConvNorm

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ConvNorm(8, 1, norm="BN", name="c")(x)

    m = M()
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32) * 3 + 1)
               for _ in range(4)]
    params = m.init(jax.random.PRNGKey(0), batches[0])
    new_params = precise_bn_update(m, params, batches)

    # oracle: conv output stats averaged per batch
    kernel = params["params"]["c"]["kernel"]
    outs = [np.asarray(jax.lax.conv_general_dilated(
        b, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))) for b in batches]
    means = np.mean([o.reshape(-1, 8).mean(0) for o in outs], axis=0)
    vars_ = np.mean([o.reshape(-1, 8).var(0) for o in outs], axis=0)
    got = new_params["params"]["c"]["FrozenBatchNorm_0"]
    np.testing.assert_allclose(np.asarray(got["mean"]), means, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["var"]), vars_, rtol=1e-4, atol=1e-5)
    # scale/bias untouched
    np.testing.assert_allclose(np.asarray(got["scale"]), 1.0)


def test_swin_fpn_backbone():
    """build_swin_fpn_backbone produces real multi-level FPN outputs (p2-p6)
    with OUT_CHANNELS channels (was: silent alias of the plain Swin)."""
    from wsovod_tpu.config import get_cfg
    from wsovod_tpu.models.backbones import build_backbone

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_swin_fpn_backbone"
    cfg.MODEL.SWIN.EMBED_DIM = 24
    cfg.MODEL.SWIN.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.SWIN.NUM_HEADS = [2, 2, 2, 2]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    bb = build_backbone(cfg)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    params = bb.init(jax.random.PRNGKey(0), x)
    out = bb.apply(params, x)
    assert set(out) == {"p2", "p3", "p4", "p5", "p6"}
    assert out["p2"].shape == (1, 16, 24, 32)
    assert out["p5"].shape == (1, 2, 3, 32)
    assert out["p6"].shape == (1, 1, 2, 32)
    strides = bb.output_strides()
    assert strides == {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}


def test_int8_shifted_conv_matches_fp_conv():
    """conv3x3_shifted_int8 vs the fp conv: small relative error and (the
    property the RPN actually depends on) near-identical top-k ordering of
    a linear objectness readout."""
    from wsovod_tpu.models.layers import QuantizableConv3x3

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 16, 64).astype(np.float32))
    conv_fp = QuantizableConv3x3(64, quant="none")
    conv_q = QuantizableConv3x3(64, quant="int8")
    params = conv_fp.init(jax.random.PRNGKey(0), x)
    y_fp = np.asarray(jax.nn.relu(conv_fp.apply(params, x)))
    y_q = np.asarray(jax.nn.relu(conv_q.apply(params, x)))

    # pointwise relative error is meaningless near relu zeros; gauge the
    # quant noise against the activation scale instead
    err = np.abs(y_q - y_fp)
    scale = y_fp.std()
    assert np.percentile(err, 99) < 0.05 * scale, (
        np.percentile(err, 99), scale,
    )

    # objectness-style readout ordering: project to 1 channel, compare top-64
    w = rng.randn(64).astype(np.float32)
    obj_fp = (y_fp @ w).reshape(2, -1)
    obj_q = (y_q @ w).reshape(2, -1)
    for b in range(2):
        top_fp = set(np.argsort(-obj_fp[b])[:64].tolist())
        top_q = set(np.argsort(-obj_q[b])[:64].tolist())
        assert len(top_fp & top_q) >= 58, len(top_fp & top_q)


def test_quantizable_conv_param_tree_matches_nn_conv():
    """QuantizableConv3x3's param tree is checkpoint-compatible with the
    nn.Conv it replaces in StandardRPNHead."""
    import flax.linen as nn

    from wsovod_tpu.models.layers import QuantizableConv3x3

    x = jnp.zeros((1, 8, 8, 16), jnp.float32)
    ref = nn.Conv(16, (3, 3), padding="SAME").init(jax.random.PRNGKey(0), x)
    got = QuantizableConv3x3(16).init(jax.random.PRNGKey(0), x)
    ref_shapes = jax.tree.map(jnp.shape, ref)
    got_shapes = jax.tree.map(jnp.shape, got)
    assert ref_shapes == got_shapes
    # fp path computes the same conv
    y_ref = nn.Conv(16, (3, 3), padding="SAME").apply(ref, x)
    y_got = QuantizableConv3x3(16).apply(ref, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_got), atol=1e-6)


def test_rpn_int8_conv_proposal_agreement():
    """RPN-level guard for TPU.RPN_CONV_QUANT='int8': with shared params,
    the int8 shifted-GEMM conv must keep the RPN's post-NMS proposal set
    close to the fp path (>=75% of top boxes shared), and train mode must
    bypass quantization entirely (bit-identical to fp train)."""
    from wsovod_tpu.config import get_cfg
    from wsovod_tpu.models.rpn import build_proposal_generator

    rng = np.random.RandomState(0)
    cfg = get_cfg()
    cfg.MODEL.RPN.IN_FEATURES = ["res5"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    rpn_fp = build_proposal_generator(cfg, strides=[8])
    cfg.TPU.RPN_CONV_QUANT = "int8"
    rpn_q = build_proposal_generator(cfg, strides=[8])

    feats = {
        "res5": jnp.asarray(rng.randn(2, 10, 14, 64).astype(np.float32))
    }
    sizes = jnp.asarray([[80, 112]] * 2, jnp.int32)
    params = rpn_fp.init(jax.random.PRNGKey(0), feats, sizes, train=False)
    p_fp, _ = rpn_fp.apply(params, feats, sizes, train=False)
    p_q, _ = rpn_q.apply(params, feats, sizes, train=False)
    from wsovod_tpu.structures.boxes import pairwise_iou

    for b in range(2):
        vf = np.asarray(p_fp.valid[b])
        bf = jnp.asarray(np.asarray(p_fp.proposal_boxes[b])[vf])
        bq = jnp.asarray(
            np.asarray(p_q.proposal_boxes[b])[np.asarray(p_q.valid[b])]
        )
        # quant noise perturbs every decoded box a little; demand that most
        # fp proposals have a near-identical int8 counterpart
        iou = np.asarray(pairwise_iou(bf, bq))
        matched = (iou.max(axis=1) > 0.8).mean()
        assert matched >= 0.75, (matched, iou.shape)

    # train path bypasses quant: identical aux logits
    _, aux_fp = rpn_fp.apply(params, feats, sizes, train=True, rngs={})
    _, aux_q = rpn_q.apply(params, feats, sizes, train=True, rngs={})
    np.testing.assert_array_equal(
        np.asarray(aux_fp.logits), np.asarray(aux_q.logits)
    )
