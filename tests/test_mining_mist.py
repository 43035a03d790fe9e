"""pgt_mist vs a direct dynamic-shape oracle at the real proposal budget.

The oracle transcribes the reference's ``get_pgt_mist`` dataflow
(``/root/reference/wsovod/modeling/roi_heads/roi_heads.py:909-1040``):
``get_pgt_top_k(top_k=0.15, thres=0.05)`` per present class, then ONE global
``batched_nms(..., idxs=zeros, 0.2)`` over the union, with
``gt_weights = pgt_scores`` in the non-SAM branch (:1320-1328).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wsovod_tpu.models.mining import pgt_mist


def _iou_matrix(b1, b2):
    area1 = np.maximum(b1[:, 2] - b1[:, 0], 0) * np.maximum(b1[:, 3] - b1[:, 1], 0)
    area2 = np.maximum(b2[:, 2] - b2[:, 0], 0) * np.maximum(b2[:, 3] - b2[:, 1], 0)
    x1 = np.maximum(b1[:, None, 0], b2[None, :, 0])
    y1 = np.maximum(b1[:, None, 1], b2[None, :, 1])
    x2 = np.minimum(b1[:, None, 2], b2[None, :, 2])
    y2 = np.minimum(b1[:, None, 3], b2[None, :, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    union = area1[:, None] + area2[None, :] - inter
    return np.where(union > 0, inter / np.where(union > 0, union, 1), 0.0)


def _oracle_mist(boxes, scores, present, logits, top_percent=0.15, thres=0.05,
                 nms_thresh=0.2, min_area=20.0):
    """Dynamic-shape reference transcription. Returns set of kept rows."""
    p, c = scores.shape
    k = max(int(p * top_percent), 1)
    cand = []  # (box, score, cls, weight)
    area = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    for ci in range(c):
        if not present[ci]:
            continue
        s = scores[:, ci].copy()
        s[area <= min_area] = -np.inf
        order = np.argsort(-s)[:k]
        for rank, pi in enumerate(order):
            if not np.isfinite(s[pi]):
                continue
            if rank > 0 and s[pi] < thres:
                continue
            cand.append((boxes[pi], s[pi], ci))
    if not cand:
        return set()
    cboxes = np.stack([x[0] for x in cand])
    cscores = np.array([x[1] for x in cand])
    cclasses = np.array([x[2] for x in cand])
    # global greedy NMS in score order (idxs are all zero in the reference)
    order = np.argsort(-cscores)
    iou = _iou_matrix(cboxes, cboxes)
    keep = []
    suppressed = np.zeros(len(cand), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > nms_thresh
        suppressed[i] = True
    out = set()
    for i in keep:
        out.add((cclasses[i], round(float(cscores[i]), 5), tuple(np.round(cboxes[i], 3))))
    return out


@pytest.mark.parametrize("p,c,seed", [(4096, 20, 0), (4096, 20, 1), (512, 6, 2)])
def test_pgt_mist_matches_dynamic_oracle(p, c, seed):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, 400, (p, 2))
    wh = rng.uniform(2, 200, (p, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    # distinct scores (ties would make greedy order ambiguous)
    scores = rng.permutation(p * c).reshape(p, c).astype(np.float32) / (p * c)
    present = np.zeros(c, bool)
    present[rng.choice(c, 3, replace=False)] = True
    logits = rng.uniform(0.1, 1.0, c).astype(np.float32)

    got = pgt_mist(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.ones((p,), bool),
        jnp.asarray(present),
        jnp.asarray(logits),
    )
    got_set = set()
    valid = np.asarray(got.valid)
    for i in np.nonzero(valid)[0]:
        got_set.add(
            (
                int(np.asarray(got.classes)[i]),
                round(float(np.asarray(got.scores)[i]), 5),
                tuple(np.round(np.asarray(got.boxes)[i], 3)),
            )
        )
    want = _oracle_mist(boxes, scores, present, logits)
    assert got_set == want

    # non-SAM branch: weights are the scores (reference zip :1320-1328)
    w = np.asarray(got.weights)[valid]
    s = np.asarray(got.scores)[valid]
    np.testing.assert_allclose(w, s)


def test_pgt_mist_many_classes_exact_past_cap():
    """Many-class oracle for the global-NMS window (round-2 verdict weak #5):
    with 12 present classes the candidate set exceeds a small nms_cap; the
    tiled NMS must reproduce the uncapped result exactly (no silent
    truncation of candidates past the window)."""
    import numpy as np

    import jax.numpy as jnp

    from wsovod_tpu.models.mining import pgt_mist

    rng = np.random.RandomState(7)
    p, c = 256, 16
    xy = rng.uniform(0, 300, (p, 2))
    wh = rng.uniform(30, 120, (p, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    scores = jnp.asarray(rng.rand(p, c).astype(np.float32) * 0.5 + 0.1)
    valid = jnp.ones((p,), bool)
    present = jnp.asarray([True] * 12 + [False] * 4)
    logits = jnp.asarray(rng.rand(c).astype(np.float32))

    # candidate set: 12 classes x k; force it past a small cap
    uncapped = pgt_mist(boxes, scores, valid, present, logits, nms_cap=10**9)
    capped = pgt_mist(boxes, scores, valid, present, logits, nms_cap=128)
    np.testing.assert_array_equal(
        np.asarray(uncapped.valid), np.asarray(capped.valid)
    )
    np.testing.assert_allclose(
        np.asarray(uncapped.boxes), np.asarray(capped.boxes)
    )
    assert int(np.asarray(capped.valid).sum()) > 0
