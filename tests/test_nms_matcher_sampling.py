import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsovod_tpu.ops.matcher import Matcher
from wsovod_tpu.ops.nms import batched_nms_mask, nms_mask, nms_topk
from wsovod_tpu.ops.sampling import subsample_labels
from wsovod_tpu.structures import pairwise_iou


def _rand_boxes(rng, n, lim=100.0):
    xy = rng.uniform(0, lim * 0.8, (n, 2))
    wh = rng.uniform(1, lim * 0.4, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def _naive_nms(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = np.zeros(len(boxes), dtype=bool)
    iou = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep[i] = True
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return keep


def test_nms_matches_naive():
    rng = np.random.RandomState(0)
    boxes = _rand_boxes(rng, 64)
    scores = rng.uniform(size=64).astype(np.float32)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    ref = _naive_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(keep, ref)


def test_nms_matches_torchvision():
    torch = pytest.importorskip("torch")
    tv = pytest.importorskip("torchvision.ops")
    rng = np.random.RandomState(7)
    boxes = _rand_boxes(rng, 200)
    scores = rng.uniform(size=200).astype(np.float32)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.4))
    ref_idx = tv.nms(torch.from_numpy(boxes), torch.from_numpy(scores), 0.4).numpy()
    assert set(np.where(keep)[0]) == set(ref_idx)


def test_nms_respects_valid_mask():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.array([0.9, 0.95, 0.1])
    valid = jnp.array([True, False, True])
    keep = np.asarray(nms_mask(boxes, scores, 0.5, valid=valid))
    # the invalid higher-scoring duplicate must not suppress box 0
    np.testing.assert_array_equal(keep, [True, False, True])


def test_batched_nms_classes_dont_interact():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    cls = jnp.array([0, 1])
    keep = np.asarray(batched_nms_mask(boxes, scores, cls, 0.5))
    np.testing.assert_array_equal(keep, [True, True])
    same = jnp.array([0, 0])
    keep2 = np.asarray(batched_nms_mask(boxes, scores, same, 0.5))
    np.testing.assert_array_equal(keep2, [True, False])


def test_nms_topk_shapes():
    rng = np.random.RandomState(1)
    boxes = jnp.asarray(_rand_boxes(rng, 32))
    scores = jnp.asarray(rng.uniform(size=32).astype(np.float32))
    idx, ok = nms_topk(boxes, scores, 0.5, k=10)
    assert idx.shape == (10,)
    assert ok.shape == (10,)


# ---------------------------------------------------------------- matcher
def test_matcher_basic_bands():
    m = Matcher([0.3, 0.7], [0, -1, 1])
    q = jnp.array([[0.1, 0.5, 0.9]])
    matches, labels = m(q)
    np.testing.assert_array_equal(np.asarray(labels), [0, -1, 1])
    np.testing.assert_array_equal(np.asarray(matches), [0, 0, 0])


def test_matcher_low_quality():
    m = Matcher([0.5], [0, 1], allow_low_quality_matches=True)
    # gt 0's best pred has IoU 0.3 < 0.5: still labeled 1 via low-quality path
    q = jnp.array([[0.3, 0.1], [0.05, 0.9]])
    _, labels = m(q)
    np.testing.assert_array_equal(np.asarray(labels), [1, 1])


def test_matcher_gt_valid_mask():
    m = Matcher([0.5], [0, 1], allow_low_quality_matches=True)
    q = jnp.array([[0.9, 0.9], [0.95, 0.0]])
    gt_valid = jnp.array([True, False])
    matches, labels = m(q, gt_valid=gt_valid)
    # invalid gt 1 may not claim pred 0
    np.testing.assert_array_equal(np.asarray(matches), [0, 0])
    np.testing.assert_array_equal(np.asarray(labels), [1, 1])


def test_matcher_detectron2_parity():
    """Randomized parity with a straightforward numpy re-implementation of
    d2.modeling.matcher.Matcher (thresholds+low-quality semantics)."""
    rng = np.random.RandomState(5)
    q = rng.uniform(size=(6, 40)).astype(np.float32)
    m = Matcher([0.2, 0.6], [0, -1, 1], allow_low_quality_matches=True)
    matches, labels = m(jnp.asarray(q))
    # numpy reference
    mv = q.max(axis=0)
    mi = q.argmax(axis=0)
    ref_labels = np.full(40, 1, dtype=np.int8)
    ref_labels[mv < 0.2] = 0
    ref_labels[(mv >= 0.2) & (mv < 0.6)] = -1
    highest = q.max(axis=1, keepdims=True)
    pred_best = (q == highest).any(axis=0)
    ref_labels[pred_best] = 1
    np.testing.assert_array_equal(np.asarray(matches), mi)
    np.testing.assert_array_equal(np.asarray(labels), ref_labels)


# ---------------------------------------------------------------- sampling
def test_subsample_counts():
    labels = jnp.asarray(np.array([1] * 30 + [0] * 300 + [-1] * 10))
    pos, neg = subsample_labels(labels, 64, 0.5, jax.random.PRNGKey(0))
    assert int(pos.sum()) == 30  # fewer positives than target 32 -> all kept
    assert int(neg.sum()) == 34
    assert not bool(jnp.any(pos & neg))
    # ignore labels never sampled
    assert not bool(jnp.any((labels == -1) & (pos | neg)))


def test_subsample_caps_positives():
    labels = jnp.asarray(np.array([1] * 100 + [0] * 100))
    pos, neg = subsample_labels(labels, 64, 0.25, jax.random.PRNGKey(1))
    assert int(pos.sum()) == 16
    assert int(neg.sum()) == 48


def test_subsample_randomness():
    labels = jnp.asarray(np.array([1] * 100 + [0] * 100))
    p1, _ = subsample_labels(labels, 64, 0.25, jax.random.PRNGKey(1))
    p2, _ = subsample_labels(labels, 64, 0.25, jax.random.PRNGKey(2))
    assert not np.array_equal(np.asarray(p1), np.asarray(p2))


def test_nms_early_stop_matches_full_topk():
    """nms_topk's early-stopped scan returns the same top-k set as a full
    scan (the k best survivors are the first k in score order)."""
    from wsovod_tpu.ops.nms import nms_mask, nms_topk

    rng = np.random.RandomState(7)
    n, k = 256, 32
    ctr = rng.uniform(20, 200, (n, 2))
    wh = rng.uniform(5, 80, (n, 2))
    boxes = jnp.asarray(
        np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1).astype(np.float32)
    )
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    valid = jnp.asarray(rng.rand(n) > 0.1)

    full_keep = nms_mask(boxes, scores, 0.5, valid=valid)
    s = np.where(np.asarray(full_keep), np.asarray(scores), -np.inf)
    want = set(np.argsort(-s)[:k][s[np.argsort(-s)[:k]] > -np.inf])

    idx, ok = nms_topk(boxes, scores, 0.5, k, valid=valid)
    got = set(np.asarray(idx)[np.asarray(ok)])
    assert got == want


def test_nms_mask_tiled_matches_dense():
    """Tiled carry-forward NMS == single-window greedy NMS exactly (several
    densities, validity patterns, and tile sizes that force multiple
    windows)."""
    import numpy as np

    import jax.numpy as jnp

    from wsovod_tpu.ops.nms import nms_mask, nms_mask_tiled

    rng = np.random.RandomState(0)
    for seed, n, tile in [(1, 300, 64), (2, 513, 128), (3, 100, 32)]:
        rng = np.random.RandomState(seed)
        xy = rng.uniform(0, 200, (n, 2))
        wh = rng.uniform(5, 60, (n, 2))
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
        scores = jnp.asarray(rng.rand(n).astype(np.float32))
        valid = jnp.asarray(rng.rand(n) > 0.2)
        want = np.asarray(nms_mask(boxes, scores, 0.3, valid=valid))
        got = np.asarray(
            nms_mask_tiled(boxes, scores, 0.3, valid=valid, tile=tile, carry_cap=4 * tile)
        )
        np.testing.assert_array_equal(got, want)
