import jax
import jax.numpy as jnp
import numpy as np

from wsovod_tpu.models.box_head import DiscriminativeAdaptationNeck
from wsovod_tpu.models.class_heads import DataAwareFeaturesHead, OpenVocabularyClassifier
from wsovod_tpu.models.fast_rcnn_inference import fast_rcnn_inference_batched
from wsovod_tpu.models.mil_heads import (
    InstanceRefinementOutputLayers,
    ObjectMiningOutputLayers,
    predict_boxes_K,
    predict_probs_K,
)

KEY = jax.random.PRNGKey(0)


def test_object_mining_scores_semantics():
    m = ObjectMiningOutputLayers(num_classes=5)
    x = jax.random.normal(KEY, (2, 8, 16))
    valid = jnp.ones((2, 8), bool)
    params = m.init(KEY, x, valid)
    scores = m.apply(params, x, valid)
    assert scores.shape == (2, 8, 5)
    # columns: softmax over classes; rows: softmax over proposals ->
    # sum over (P, C) == sum over C of softmax_det == ... each class's
    # proposal-softmax sums to 1 before class-softmax weighting; the total
    # image score sum equals sum_c sum_p cls_sm*det_sm <= C
    s = np.asarray(scores)
    assert (s >= 0).all()
    img = np.asarray(m.predict_probs_img(scores))
    assert img.shape == (2, 5)
    assert (img > 0).all() and (img < 1).all()


def test_object_mining_padding_invariance():
    m = ObjectMiningOutputLayers(num_classes=4)
    x = jax.random.normal(KEY, (1, 6, 16))
    valid_all = jnp.ones((1, 6), bool)
    params = m.init(KEY, x, valid_all)
    # pad with 4 junk rows
    x_pad = jnp.concatenate([x, 100.0 * jnp.ones((1, 4, 16))], axis=1)
    valid_pad = jnp.concatenate([valid_all, jnp.zeros((1, 4), bool)], axis=1)
    s_ref = np.asarray(m.apply(params, x, valid_all))
    s_pad = np.asarray(m.apply(params, x_pad, valid_pad))
    np.testing.assert_allclose(s_pad[:, :6], s_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s_pad[:, 6:], 0.0, atol=1e-7)


def test_object_mining_bce_loss_manual():
    m = ObjectMiningOutputLayers(num_classes=3, mean_loss=True)
    scores = jnp.asarray(
        np.array([[[0.2, 0.1, 0.0], [0.3, 0.05, 0.0]]], dtype=np.float32)
    )  # [1, 2, 3]
    oh = jnp.asarray(np.array([[1, 0, 0]], dtype=np.float32))
    losses = m.losses(scores, oh)
    p = np.clip(np.array([0.5, 0.15, 0.0]), 1e-6, 1 - 1e-6)
    t = np.array([1.0, 0, 0])
    expect = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean()
    np.testing.assert_allclose(float(losses["loss_cls_object_mining"]), expect, rtol=1e-3)


def test_ov_classifier_cosine():
    m = OpenVocabularyClassifier(num_classes=4, weight_dim=8, norm_temperature=50.0)
    x = jax.random.normal(KEY, (3, 32))
    emb = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    params = m.init(KEY, x, embeddings=emb)
    out = m.apply(params, x, embeddings=emb)
    assert out.shape == (3, 4)
    # logits bounded by the norm temperature (cosine in [-1, 1])
    assert np.abs(np.asarray(out)).max() <= 50.0 + 1e-3
    # background column is exactly 0
    out_bg = m.apply(params, x, embeddings=emb, append_background=True)
    assert out_bg.shape == (3, 5)
    np.testing.assert_allclose(np.asarray(out_bg[:, -1]), 0.0, atol=1e-6)
    # runtime classifier override changes the number of classes
    out_swap = m.apply(params, x, classifier=jax.random.normal(KEY, (7, 8)))
    assert out_swap.shape == (3, 7)


def test_data_aware_head():
    m = DataAwareFeaturesHead(prototype_num=5, features_dim=64)
    feat = jax.random.normal(KEY, (2, 8, 8, 32))
    params = m.init(KEY, feat)
    out = m.apply(params, feat)
    assert out.shape == (2, 64)
    # masked GAP differs from full GAP when padding present
    pv = jnp.zeros((2, 8, 8), bool).at[:, :4, :4].set(True)
    out_masked = m.apply(params, feat, pixel_valid=pv)
    assert not np.allclose(np.asarray(out), np.asarray(out_masked))


def test_data_aware_head_mrrp_branch_mean():
    m = DataAwareFeaturesHead(prototype_num=5, features_dim=16, mrrp_on=True, mrrp_num_branch=2)
    feat = jax.random.normal(KEY, (4, 4, 4, 8))  # 2 images x 2 branches
    params = m.init(KEY, feat)
    out = m.apply(params, feat)
    assert out.shape == (2, 16)


def test_dan_box_head():
    m = DiscriminativeAdaptationNeck(fc_dims=(64, 32))
    x = jax.random.normal(KEY, (2, 5, 7, 7, 16))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (2, 5, 32)
    # dropout active in train mode
    out_t = m.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(out), np.asarray(out_t))


def test_instance_refinement_forward_and_loss():
    m = InstanceRefinementOutputLayers(
        num_classes=6, refine_k=0, refine_reg=True, weight_dim=8
    )
    x = jax.random.normal(KEY, (2, 10, 32))
    emb = jax.random.normal(KEY, (6, 8))
    params = m.init(KEY, x, embeddings=emb)
    scores, deltas = m.apply(params, x, embeddings=emb)
    assert scores.shape == (2, 10, 7)
    assert deltas.shape == (2, 10, 4)

    rng = np.random.RandomState(0)
    pb = rng.uniform(0, 50, (2, 10, 4)).astype(np.float32)
    pb[..., 2:] += 20
    gt_classes = jnp.asarray(rng.randint(-1, 7, (2, 10)))
    gt_boxes = jnp.asarray(pb + 1.0)
    gt_weights = jnp.asarray(rng.uniform(0.1, 1, (2, 10)).astype(np.float32))
    valid = jnp.ones((2, 10), bool)
    losses = m.losses(
        scores, deltas, jnp.asarray(pb), gt_classes, gt_boxes, gt_weights, valid
    )
    assert "loss_cls_r0" in losses and "loss_box_reg_r0" in losses
    for v in losses.values():
        assert np.isfinite(float(v))


def test_weighted_ce_ignores_and_weights():
    m = InstanceRefinementOutputLayers(num_classes=2, refine_k=1, refine_reg=False, weight_dim=4)
    scores = jnp.asarray(np.array([[[5.0, 0, 0], [0, 5.0, 0], [0, 0, 5.0]]], np.float32))
    pb = jnp.zeros((1, 3, 4))
    # row 1 is ignore (-1); row 2 background (class 2)
    gt_classes = jnp.asarray(np.array([[0, -1, 2]]))
    gt_weights = jnp.asarray(np.array([[2.0, 1.0, 1.0]], np.float32))
    valid = jnp.ones((1, 3), bool)
    losses = m.losses(scores, jnp.zeros((1, 3, 4)), pb, gt_classes, pb, gt_weights, valid)
    # manual: CE for rows 0 and 2 (correct logits=5 -> small loss), weighted
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce0 = -float(logp[0, 0, 0]) * 2.0
    ce2 = -float(logp[0, 2, 2]) * 1.0
    expect = (ce0 + ce2) / 2.0  # two valid weights
    np.testing.assert_allclose(float(losses["loss_cls_r1"]), expect, rtol=1e-5)


def test_predict_K_averaging():
    s1 = jnp.asarray(np.random.RandomState(0).randn(1, 4, 3).astype(np.float32))
    s2 = jnp.asarray(np.random.RandomState(1).randn(1, 4, 3).astype(np.float32))
    probs = predict_probs_K([s1, s2])
    ref = (jax.nn.softmax(s1, -1) + jax.nn.softmax(s2, -1)) / 2
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref), rtol=1e-6)

    boxes = jnp.asarray(np.array([[[0, 0, 10, 10]]], np.float32))
    d = jnp.zeros((1, 1, 4))
    out = predict_boxes_K([d, d], boxes, (10.0, 10.0, 5.0, 5.0))
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0, 0, 10, 10], atol=1e-4)


def test_fast_rcnn_inference_batched():
    # two proposals, two classes; box 1 duplicates box 0 with lower score
    boxes = jnp.asarray(
        np.array([[[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 40, 40]]], np.float32)
    )
    scores = jnp.asarray(
        np.array([[[0.9, 0.0, 0.1], [0.8, 0.0, 0.2], [0.0, 0.7, 0.3]]], np.float32)
    )
    valid = jnp.ones((1, 3), bool)
    sizes = jnp.asarray(np.array([[100, 100]], np.int32))
    det = fast_rcnn_inference_batched(
        boxes, scores, valid, sizes, score_thresh=0.05, nms_thresh=0.5, topk_per_image=5
    )
    v = np.asarray(det.valid[0])
    assert v.sum() == 2  # duplicate suppressed
    kept_scores = sorted(float(s) for s in np.asarray(det.scores[0])[v])
    np.testing.assert_allclose(kept_scores, [0.7, 0.9], atol=1e-5)
    kept_classes = np.asarray(det.classes[0])[v]
    assert set(kept_classes.tolist()) == {0, 1}


def test_fast_rcnn_inference_respects_topk_and_thresh():
    rng = np.random.RandomState(0)
    boxes = rng.uniform(0, 80, (1, 50, 2))
    boxes = np.concatenate([boxes, boxes + 10], axis=-1).astype(np.float32)
    scores = rng.uniform(0, 1, (1, 50, 4)).astype(np.float32)
    det = fast_rcnn_inference_batched(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones((1, 50), bool),
        jnp.asarray([[100, 100]], dtype=jnp.int32),
        score_thresh=0.99, nms_thresh=0.5, topk_per_image=10,
    )
    assert det.boxes.shape == (1, 10, 4)
    # every kept score must exceed the threshold
    v = np.asarray(det.valid[0])
    assert (np.asarray(det.scores[0])[v] > 0.99).all()
